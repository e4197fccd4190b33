"""Frequency sketches: exact heavy hitters over unbounded key
cardinality (Misra–Gries two-pass), plus the one-pass approximate form.

The 100 TB shape this solves: "top URLs / domains / tokens by count"
over a corpus whose DISTINCT key count is itself huge (billions of
URLs).  A plain ``groupBy(key).count()`` shuffles one row per distinct
key — at that cardinality the shuffle IS the job.  Misra–Gries
(Misra & Gries 1982; the summary-merge form of Agarwal et al. 2013,
"Mergeable Summaries") bounds the state instead:

- **Pass 1** generates a bounded candidate set.  For ``exact=True``
  (the default) it runs ENTIRELY in the JVM via
  ``df.stat.freqItems([key], 1/(capacity+1))`` — Spark's built-in
  single-pass frequent-items aggregate (Karp/Shenker/Papadimitriou
  2003, the same counter-decrement family as Misra–Gries), whose
  guarantee is exactly what pass 2 needs: the result is a SUPERSET of
  every key with frequency > N * support = N/(capacity+1), with at
  most ``capacity+1`` candidates.  The corpus never crosses the
  JVM→Arrow→Python boundary on the full scan — at 100 TB that
  boundary's ~10-20x constant would otherwise BE the job.  (Spark
  caps ``support`` at >= 1e-4, so for ``capacity+1 > 10_000`` this
  path falls back to the Python summary below; at such capacities a
  plain ``groupBy`` is usually competitive anyway.)  ``freqItems``
  executes eagerly (a JVM ``treeAggregate`` materialized as a
  LocalRelation), so the exact mode launches pass 1 at call time.
- For ``exact=False`` — and the large-capacity exact fallback — pass 1
  is a capacity-bounded Misra–Gries summary inside each partition
  (``mapInPandas``, pandas ``value_counts`` fold, at most
  ``capacity`` keys of state).  Output is at most
  ``partitions x capacity`` candidate rows — independent of both
  corpus size and distinct-key count.  Python MG is kept for the
  one-pass mode because ``freqItems`` does not expose the per-key
  counter values needed for the [n_lo, n_hi] bounds.
- **Candidate set**: the union of the per-partition summaries.  By the
  MG guarantee any key with partition-local frequency
  > n_p/(capacity+1) survives its partition, and a key with GLOBAL
  frequency > N/(capacity+1) must exceed the local threshold in at
  least one partition (pigeonhole), so the union is a SUPERSET of
  every key with global count > N/(capacity+1).
- **Pass 2** (``exact=True``, default) re-scans once restricted to the
  tiny candidate set and takes EXACT counts — a hash aggregate over
  only candidate rows (at most ``capacity+1`` keys, so map-side
  combine leaves a candidate-sized shuffle), then TakeOrdered(k).  On
  the JVM path the restriction is an InSet filter (candidates are
  already driver-local); on the fallback path it's a broadcast
  left-semi join.  Result: exact top-k whenever the k-th item's count
  exceeds N/(capacity+1) (size ``capacity`` at a few multiples of k —
  cheap, it's driver/broadcast-sized state).
- **One-pass mode** (``exact=False``) skips the re-scan and returns
  merged summary bounds per candidate: ``n_lo`` (sum of per-partition
  MG counters — never overcounts) and ``n_hi`` (``n_lo`` plus the
  summed per-partition decrement budget ``floor(n_p/(capacity+1))``).
  True count is always within [n_lo, n_hi].  Use when a second scan is
  too expensive and ranked-with-error is acceptable.

NULL keys are dropped (documented; count them upstream via
``coalesce`` if needed).  Determinism: ties break on key ascending.
The exact mode is plain relational algebra end-to-end and is restated
1:1 in DuckDB by tests/test_sketches.py.
"""

from __future__ import annotations

from typing import Iterator

# module-global so pandas_udf/mapInPandas can resolve stringized type
# hints (future-annotations keeps them strings; pyspark resolves them
# against the defining module's globals)
import pandas as pd  # noqa: F401

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "heavy_hitters",
    "cm_build",
    "cm_counts_df",
    "cm_estimate",
    "cm_merge",
    "hll_build",
    "hll_merge",
    "hll_merge_df",
    "hll_estimate",
]

# sentinel key for the one-row-per-partition rows-scanned record in the
# pass-1 output (real keys are emitted as-is; NULL keys are dropped, so
# NULL is free to carry the partition row count)
_ROWS_SENTINEL = None


def _mg_partition_factory(key_col: str, capacity: int):
    """Build the mapInPandas function: one Misra–Gries summary per
    partition, state bounded at ``capacity`` keys regardless of input
    size.  Emits (key, mg_count) rows plus one (NULL, n_p) sentinel
    carrying the partition's scanned-row count for the n_hi bound."""

    def mg_part(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        acc = None  # pandas Series: key index -> surviving counter
        n_rows = 0
        for pdf in batches:
            vals = pdf[key_col].dropna()
            n_rows += len(vals)
            # fully vectorized fold: exact within-batch counts, index-
            # aligned add into the summary — cost tracks DISTINCT batch
            # keys, never rows, and never drops to per-key Python
            vc = vals.value_counts()
            # align-add drifts to float64 (NaN fill before the 0);
            # exact below 2^53 but pin int64 so counters never carry
            # float representation at all
            acc = (
                vc if acc is None
                else acc.add(vc, fill_value=0).astype("int64")
            )
            if len(acc) > capacity:
                # generalized MG decrement: subtract the smallest
                # constant that brings the summary back under capacity
                # (the (capacity+1)-th largest counter), drop <= 0.
                # Each unit of decrement applies to >= capacity+1 keys
                # at once, so the total subtracted from any one key is
                # <= n_p/(capacity+1) — the classic bound.  Memory
                # peaks at capacity + one Arrow batch's distinct keys.
                sub = acc.nlargest(capacity + 1).iloc[-1]
                acc = acc[acc > sub] - sub
        keys = [] if acc is None else list(acc.index)
        counts = [] if acc is None else [int(v) for v in acc.values]
        yield pd.DataFrame(
            {key_col: keys + [_ROWS_SENTINEL], "__mg_n": counts + [n_rows]}
        )

    return mg_part


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 100,
    capacity: int | None = None,
    exact: bool = True,
) -> DataFrame:
    """Top-``k`` most frequent values of ``key_col`` without shuffling
    the full distinct-key set (module docstring has the contract).

    ``exact=True`` -> (key, n) with EXACT counts, count desc / key asc,
    guaranteed complete when the k-th count > N/(capacity+1).
    ``exact=False`` -> (key, n_lo, n_hi) summary bounds, one pass,
    ranked by n_lo desc / key asc.

    ``capacity`` defaults to ``8*k`` (plus headroom 64): the summary is
    driver-broadcast-sized state, so oversizing it is cheap insurance
    on flat distributions."""
    if k < 1:
        raise ValueError("heavy_hitters: k must be >= 1")
    if capacity is None:
        capacity = max(8 * k, 64)
    if capacity < k:
        raise ValueError("heavy_hitters: capacity must be >= k")
    field = df.schema[key_col]
    if exact:
        support = 1.0 / (capacity + 1)
        if support >= 1e-4:
            # JVM pass 1: single-pass frequent-items aggregate, never
            # leaves the JVM.  Superset of keys with freq > N*support;
            # nulls filtered first so the threshold is over non-null N
            # (matching the Python path's contract).  The result is
            # already driver-local (freqItems materializes a
            # LocalRelation), so pass 2 restricts via an InSet filter —
            # cheaper than a broadcast semi-join (no build side, no
            # join node; the partial aggregate then holds at most
            # capacity+1 keys, so the shuffle is candidate-sized).
            freq = (
                df.select(key_col)
                .filter(F.col(key_col).isNotNull())
                .stat.freqItems([key_col], support)
            )
            cand_vals = [
                v for v in (freq.collect()[0][0] or []) if v is not None
            ]
            if not cand_vals:
                restricted = df.filter(F.lit(False))
            else:
                restricted = df.filter(F.col(key_col).isin(cand_vals))
        else:
            # support below Spark's 1e-4 floor: Python MG summary,
            # candidates stay distributed -> broadcast semi-join
            sketch = df.select(key_col).mapInPandas(
                _mg_partition_factory(key_col, capacity),
                schema=(
                    f"`{key_col}` {field.dataType.simpleString()},"
                    " __mg_n long"
                ),
            )
            candidates = (
                sketch.filter(F.col(key_col).isNotNull()).select(key_col)
            )
            restricted = df.filter(F.col(key_col).isNotNull()).join(
                F.broadcast(candidates.distinct()), key_col, "left_semi"
            )
        return (
            restricted.groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc(key_col))
            .limit(k)
        )
    # one-pass: merge the per-partition summaries (sum of counters is a
    # lower bound; the sentinel rows supply sum(floor(n_p/(cap+1))),
    # the total decrement budget, for the upper bound).  The sketch is
    # partitions x capacity rows — this aggregate is metadata-sized.
    # localCheckpoint materializes it ONCE: the budget and merged
    # branches below have different subplans (no exchange reuse), so
    # an unmaterialized sketch would re-run the full corpus scan per
    # branch — two scans in the mode whose whole point is one pass.
    sketch = df.select(key_col).mapInPandas(
        _mg_partition_factory(key_col, capacity),
        schema=f"`{key_col}` {field.dataType.simpleString()}, __mg_n long",
    ).localCheckpoint(eager=True)
    budget = (
        sketch.filter(F.col(key_col).isNull())
        .agg(
            F.coalesce(
                F.sum(F.floor(F.col("__mg_n") / (capacity + 1))), F.lit(0)
            ).alias("__budget")
        )
    )
    merged = (
        sketch.filter(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.sum("__mg_n").alias("n_lo"))
    )
    return (
        merged.crossJoin(F.broadcast(budget))
        .select(
            key_col,
            "n_lo",
            (F.col("n_lo") + F.col("__budget")).alias("n_hi"),
        )
        .orderBy(F.desc("n_lo"), F.asc(key_col))
        .limit(k)
    )


# ----------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): point-frequency
# estimates over unbounded key cardinality.  Complements heavy_hitters
# (top-k) and bloom (membership): "how often does THIS key appear?"
# without a distinct-key-wide shuffle.
# ----------------------------------------------------------------------


def _cm_positions(col, width: int, depth: int, seed: int):
    from zeek_duckdb_spark.operators.hashutil import md5_long

    return [
        md5_long(
            F.concat_ws(":", F.lit(str(seed)), F.lit(f"cm{i}"),
                        col.cast("string"))
        )
        % F.lit(width)
        for i in range(depth)
    ]


def _cm_validate(width: int, depth: int) -> None:
    if width < 2:
        raise ValueError("count_min: width must be >= 2")
    if depth < 1:
        raise ValueError("count_min: depth must be >= 1")


def cm_counts_df(
    df: DataFrame,
    key_col: str,
    width: int = 1 << 14,
    depth: int = 4,
    seed: int = 7,
    weight_col: str | None = None,
) -> DataFrame:
    """Sparse ``(row, pos, cnt)`` DataFrame of the NONZERO sketch
    counters — the oracle shape (integer sums over md5 positions:
    order-independent, so the match is full-value).  The aggregate is
    map-side combined; the shuffle carries at most ``depth * width``
    counter rows per partition regardless of corpus size."""
    _cm_validate(width, depth)
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    src = df.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("__k"), w.alias("__w")
    )
    pos = F.explode(
        F.array(
            *[
                F.struct(F.lit(i).alias("row"), p.alias("pos"))
                for i, p in enumerate(
                    _cm_positions(F.col("__k"), width, depth, seed)
                )
            ]
        )
    ).alias("e")
    return (
        src.select(pos, "__w")
        .select(
            F.col("e.row").cast("int").alias("row"),
            F.col("e.pos").cast("long").alias("pos"),
            F.col("__w"),
        )
        .groupBy("row", "pos")
        .agg(F.sum("__w").alias("cnt"))
    )


def cm_build(
    df: DataFrame,
    key_col: str,
    width: int = 1 << 14,
    depth: int = 4,
    seed: int = 7,
    weight_col: str | None = None,
    allow_signed: bool = False,
) -> dict:
    """Build the sketch.  Returns ``{width, depth, seed, n, counts,
    signed}`` with ``counts`` a depth x width dense int list-of-lists —
    broadcast-sized driver state (4 x 16384 longs = 512 KB), identical
    under any partitioning.  Estimates overshoot by at most
    ``e/width * n`` with probability ``1 - e^-depth`` (Cormode &
    Muthukrishnan 2005) and NEVER undershoot — which is why negative
    weights are REJECTED here by default: they keep counters
    non-negative-looking while silently making the min estimator
    undershoot (the same contract cm_merge enforces on already-built
    sketches).

    ``allow_signed=True`` opts into the SIGNED-update regime
    (deletions, e.g. a windowed stream's expiry batch built with
    negative weights): the sketch is marked ``signed`` and only the
    two-sided ``cm_estimate(estimator='median')`` may read it — the
    min path refuses, its one-sided bound no longer holds.  The flag
    is a DECLARATION of the update regime, not a measurement: it takes
    effect only when a ``weight_col`` is present (unit weights cannot
    be negative, so ``allow_signed`` on an unweighted build is a no-op
    and the sketch stays unsigned — it keeps the stronger min
    estimator).  Pass it only on genuine deletion batches; a value
    scan deciding the flag would race a second evaluation of a
    non-deterministic ``df`` against the counts job, and could mark a
    sketch unsigned whose counters actually absorbed deletions."""
    if weight_col is not None and not allow_signed:
        neg = (
            df.filter(F.col(key_col).isNotNull())
            .agg(
                F.sum(
                    F.when(F.col(weight_col).cast("long") < 0, 1).otherwise(0)
                ).alias("neg")
            )
            .first()["neg"]
        )
        if int(neg or 0) > 0:
            raise ValueError(
                "cm_build: negative weights would void the min "
                "estimator's no-undershoot guarantee — build deletion "
                "batches with allow_signed=True and read via "
                "cm_estimate(estimator='median')"
            )
    rows = cm_counts_df(df, key_col, width, depth, seed, weight_col)
    counts = [[0] * width for _ in range(depth)]
    # Arrow transfer, not row-by-row py4j: at width 2^20 x depth 4 the
    # nonzero-counter set is ~10^6 rows and per-row deserialization
    # dominates the build (the bloom words-table lesson)
    pdf = rows.toPandas()
    for row_i, pos_i, c in zip(
        pdf["row"].to_numpy(), pdf["pos"].to_numpy(), pdf["cnt"].to_numpy()
    ):
        counts[int(row_i)][int(pos_i)] = int(c)
    n = sum(counts[0])
    return {
        "width": width,
        "depth": depth,
        "seed": seed,
        "n": n,
        "counts": counts,
        "signed": bool(allow_signed and weight_col is not None),
    }


def cm_estimate(
    df: DataFrame,
    key_col: str,
    model: dict,
    out_col: str = "est",
    estimator: str = "min",
) -> DataFrame:
    """``df`` + an ``out_col`` long column: the count-min estimate over
    the depth counter probes.  The counters ride as a broadcast 1-row
    join (out of codegen — per-model recompiles would otherwise
    dominate small jobs); the probe is depth element_at lookups folded
    by the estimator — a zero-shuffle map.  NULL keys estimate NULL.

    ``estimator='min'`` (default) is the classic CM bound: never
    undershoots, overshoot <= ``e/width * n`` w.p. ``1 - e^-depth`` —
    valid ONLY for non-negative updates, so it REFUSES sketches built
    or merged with ``allow_signed=True``.

    ``estimator='median'`` is the Cormode-Muthukrishnan CM-median
    variant for the SIGNED regime (deletions via negative-weight
    batches): the depth probes are sorted and the lower median taken
    (exact middle at odd depth — prefer odd depth here; the
    lower-median choice keeps the estimate an integer and
    SQL-restatable).  The bound is TWO-SIDED and weaker:
    ``|est - true| <= 3e/width * ||f||_1`` w.p. ``1 - e^-depth/4``
    (Cormode & Muthukrishnan 2005, Thm 5.2 regime) — estimates can
    undershoot.  Works on unsigned sketches too (strictly weaker than
    min there; use it only when deletions are in play)."""
    if estimator not in ("min", "median"):
        raise ValueError("cm_estimate: estimator must be 'min' or 'median'")
    if estimator == "min" and model.get("signed", False):
        raise ValueError(
            "cm_estimate: sketch carries signed updates (deletions) — "
            "the min estimator's no-undershoot bound no longer holds; "
            "use estimator='median'"
        )
    spark = df.sparkSession
    flat = [int(v) for row in model["counts"] for v in row]
    cdf = spark.createDataFrame([(flat,)], "__cm_counts array<long>")
    width = model["width"]
    probes = [
        F.element_at(
            F.col("__cm_counts"),
            (F.lit(i * width) + p).cast("int") + 1,
        )
        for i, p in enumerate(
            _cm_positions(
                F.col(key_col), width, model["depth"], model["seed"]
            )
        )
    ]
    if estimator == "median":
        # lower median of the sorted depth probes: 1-indexed element
        # (depth+1)//2 — the exact middle at odd depth, deterministic
        # and integer-valued at even depth
        est = F.element_at(
            F.array_sort(F.array(*probes)), (model["depth"] + 1) // 2
        )
    else:
        est = probes[0] if len(probes) == 1 else F.least(*probes)
    return (
        df.crossJoin(F.broadcast(cdf))
        .withColumn(
            out_col,
            F.when(F.col(key_col).isNotNull(), est).otherwise(F.lit(None)),
        )
        .drop("__cm_counts")
    )


def cm_merge(a: dict, b: dict) -> dict:
    """Counter-wise add of two count-min sketches built with
    identical (width, depth, seed) — CM is a linear sketch, so
    per-batch sketches fold into the standing one without touching
    history.

    UNSIGNED sketches (the default regime) stay non-negative-update
    only: ``cm_estimate``'s min estimator (and its NEVER-undershoot
    guarantee) is only valid while every merged update is >= 0, so a
    negative counter in either unsigned side is rejected as
    corruption.  Merging in a sketch built with ``allow_signed=True``
    (a deletion batch) is the supported windowed-stream expiry path:
    the RESULT is marked signed and only
    ``cm_estimate(estimator='median')`` — the two-sided CM-median
    bound — may read it from then on."""
    for f in ("width", "depth", "seed"):
        if a[f] != b[f]:
            raise ValueError(f"cm_merge: {f} differs ({a[f]} vs {b[f]})")
    signed = a.get("signed", False) or b.get("signed", False)
    if not signed:
        for side, s in (("a", a), ("b", b)):
            if any(c < 0 for row in s["counts"] for c in row):
                raise ValueError(
                    f"cm_merge: sketch {side} has negative counters; "
                    "deletions are unsupported in the unsigned regime "
                    "(the min estimator's no-undershoot guarantee "
                    "requires non-negative updates) — build deletion "
                    "batches with allow_signed=True"
                )
    return {
        **a,
        "n": a["n"] + b["n"],
        "counts": [
            [x + y for x, y in zip(ra, rb)]
            for ra, rb in zip(a["counts"], b["counts"])
        ],
        "signed": signed,
    }


def _norm_group_cols(group_cols, fn: str) -> tuple[str, ...]:
    """A bare string splatted into groupBy would group by its
    CHARACTERS (groupBy('c','o','l')) and fail with a confusing
    unresolved-column error — normalize it to a 1-tuple instead,
    mirroring how key_col params read elsewhere."""
    if isinstance(group_cols, str):
        return (group_cols,)
    try:
        return tuple(group_cols)
    except TypeError:
        raise TypeError(
            f"{fn}: group_cols must be a column name or an iterable of "
            f"column names, got {type(group_cols).__name__}"
        ) from None


# ----------------------------------------------------------------------
# HLL distinct-count sketches (Spark's JVM-native Apache DataSketches
# HllSketch aggregates): persistable, MERGEABLE distinct counts.
# approx_count_distinct gives a number; these give an artifact — land
# per-day / per-source sketches once, then answer "distinct keys over
# any union of slices" by merging kilobyte sketches instead of
# re-scanning corpora.
# ----------------------------------------------------------------------


def hll_build(
    df: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    lgk: int = 12,
) -> DataFrame:
    """Per-group HLL sketches: ``(*group_cols, hll binary)``.  One
    map-side-combined aggregate (the sketch IS the partial state, a
    few KB per group at lgk=12, ~1.6% relative error); land the
    result next to the data it summarizes."""
    group_cols = _norm_group_cols(group_cols, "hll_build")
    agg = F.hll_sketch_agg(key_col, F.lit(lgk)).alias("hll")
    return (
        df.groupBy(*group_cols).agg(agg) if group_cols else df.agg(agg)
    )


def hll_merge(
    a: DataFrame,
    b: DataFrame,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Union two sketch tables and merge per group — distinct counts
    over combined slices without touching the source data."""
    return hll_merge_df(a.unionByName(b), group_cols)


def hll_merge_df(
    sketches: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Merge an already-unioned table of sketch rows per group — the
    N-slice form behind :func:`hll_merge` and the CLI's
    ``distinct --merge`` (read every landed slice with one
    ``spark.read.parquet(*paths)``, merge once; kilobyte sketch rows
    move, never the source corpora)."""
    group_cols = _norm_group_cols(group_cols, "hll_merge_df")
    agg = F.hll_union_agg("hll").alias("hll")
    return (
        sketches.groupBy(*group_cols).agg(agg)
        if group_cols
        else sketches.agg(agg)
    )


def hll_estimate(df: DataFrame, out_col: str = "distinct_est") -> DataFrame:
    """Replace the binary ``hll`` column with its estimate (rounded,
    not truncated — a bare long cast would bias every estimate down
    by ~0.5)."""
    return df.withColumn(
        out_col, F.round(F.hll_sketch_estimate("hll")).cast("long")
    ).drop("hll")
