"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks
as a primitive (pandas-on-Spark has merge_asof; plain SQL engines like
DuckDB ship ASOF JOIN natively, which is what the oracle uses).

Implemented as the classic union-tag + window composition rather than a
range self-join:

- tag left rows 1 and right rows 0, unionByName (right-only columns are
  NULL on left rows and vice versa);
- one window per join key ordered by (ts, tag): ``last(right_col,
  ignorenulls=True)`` over UNBOUNDED PRECEDING..CURRENT ROW carries the
  most recent right-side values forward onto each left row.  Ordering
  right rows (tag 0) before left rows (tag 1) at equal timestamps gives
  the ASOF ``right.ts <= left.ts`` inclusive semantics;
- filter back to left rows.

Scale shape: ONE shuffle (the window partitionBy on the join key) over
|L| + |R| narrow rows — no range-join explosion, no per-key collect.
Skewed keys behave like any window (AQE cannot split a single window
partition; salt the key upstream if one key holds a large fraction of
the corpus).  This is the same shape sessionize uses and it holds at
100 TB: both inputs shuffle once, co-partitioned by key.

Right-side rows that share (key, ts) are non-deterministic under ASOF
semantics in any engine; callers should pre-aggregate the right side to
one row per (key, ts) — the entry query and oracle both do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    time_bucket: float | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``ts_col`` <= the left row's ``ts_col`` within the same ``on`` key
    (backward as-of; left rows with no prior right row keep NULLs).

    ``right_cols``: right columns to carry (default: all but the key);
    they are renamed with ``suffix`` if the name collides with a left
    column.  The right side's ``ts_col`` is always carried as
    ``ts_col + suffix``.

    ``time_bucket`` is the SKEW escape hatch: with it set (seconds for
    timestamp keys, ``ts_col`` units for numerics), the window
    partitions by (key, time slice) instead of key alone, so a hot key
    that holds a large fraction of the corpus is bounded by ONE SLICE
    of one key per partition — the thing AQE cannot do for a window.
    Cross-slice matches are restored exactly by a carry-in pass over
    per-slice summaries (one newest-right-row struct per occupied
    (key, slice) — model-sized relative to the corpus) that
    prefix-scans slices per key and equi-joins back.  Results are
    IDENTICAL to the unbucketed path (differential-tested) at the cost
    of one extra small shuffle; choose a width that keeps a hot key's
    rows-per-slice executor-sized.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts_col)]
    out_names = {}
    for c in [ts_col] + right_cols:
        out = c + suffix if (c in left.columns or c == ts_col) else c
        out_names[c] = out

    # the right row is carried as ONE struct so the match is row-atomic:
    # last(col, ignorenulls) per column would fall back to an OLDER right
    # row for any column that is NULL in the newest one
    rstruct = F.struct(
        F.col(ts_col).alias(out_names[ts_col]),
        *[F.col(c).alias(out_names[c]) for c in right_cols],
    )
    r = right.select(
        F.col(on),
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        rstruct.alias("__r"),
    )
    l = left.select(
        "*",
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    if time_bucket is None:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__ts"), F.col("__side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("__r", ignorenulls=True).over(w)
        filled = u.select(
            *[c for c in left.columns],
            F.col("__side"),
            *[
                matched[out_names[c]].alias(out_names[c])
                for c in [ts_col] + right_cols
            ],
        )
        return filled.filter(F.col("__side") == 1).drop("__side")

    # --- time-sliced skew-bounded path -------------------------------
    if not time_bucket > 0:
        raise ValueError("asof_join: time_bucket must be > 0")
    from zeek_duckdb_spark.operators.timeutil import ts_seconds

    slice_of = ts_seconds(u, "__ts") / F.lit(float(time_bucket))
    ub = u.withColumn("__b", F.floor(slice_of).cast("long"))

    # within-slice match: same union-tag window, partition bounded by
    # one slice of one key
    w_in = (
        Window.partitionBy(on, "__b")
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_slice = ub.withColumn("__m", F.last("__r", ignorenulls=True).over(w_in))

    # carry-in: newest right struct from any EARLIER slice of the key.
    # Summaries exist only for OCCUPIED (key, slice) cells from either
    # side, so the prefix window runs over a table that is tiny
    # relative to the corpus (and the left join keeps right-less slices)
    cells = ub.select(on, "__b").distinct()
    right_summ = (
        ub.filter(F.col("__side") == 0)
        .groupBy(on, "__b")
        .agg(F.max_by("__r", F.col("__ts")).alias("__rs"))
    )
    w_carry = (
        Window.partitionBy(on)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rsm = right_summ.select(
        F.col(on).alias("__s_on"), F.col("__b").alias("__s_b"), "__rs"
    )
    carry = (
        cells.join(
            rsm,
            cells[on].eqNullSafe(rsm["__s_on"])
            & (cells["__b"] == rsm["__s_b"]),
            "left",
        )
        .withColumn("__carry", F.last("__rs", ignorenulls=True).over(w_carry))
        .select(on, "__b", "__carry")
    )

    # null-SAFE key equality: the unbucketed window groups NULL keys
    # into one partition, so the sliced path must carry across them too
    lhs = in_slice.filter(F.col("__side") == 1)
    rhs = carry.select(
        F.col(on).alias("__c_on"), F.col("__b").alias("__c_b"), "__carry"
    )
    joined = lhs.join(
        rhs,
        lhs[on].eqNullSafe(rhs["__c_on"]) & (lhs["__b"] == rhs["__c_b"]),
        "left",
    )
    matched = F.coalesce(F.col("__m"), F.col("__carry"))
    return joined.select(
        *[c for c in left.columns],
        *[
            matched[out_names[c]].alias(out_names[c])
            for c in [ts_col] + right_cols
        ],
    )
