"""Range (interval) join — point-in-interval matching at scale.

Spark plans a raw inequality join (``l.start <= r.ts AND r.ts <=
l.end``) as BroadcastNestedLoopJoin — O(|L|·|R|) comparisons, the
classic scale trap.  This operator uses the standard bucketization
composition instead:

- left intervals explode to the fixed-width time buckets they cover
  (``sequence(start DIV w, end DIV w)`` — integer division on epoch
  µs, no double rounding at bucket edges);
- right points map to their single bucket;
- an EQUI-join on (key, bucket) finds candidates — shuffle-partitioned
  by Catalyst like any equi-join, broadcastable when one side is small;
- the exact interval predicate re-filters candidates.

Each (left, right) pair shares at most one bucket with the right point
(a point is in exactly one bucket), so matches are emitted exactly once
— no post-join dedup.  Cost: |L| × (interval_width / bucket_width)
exploded rows + one equi-join shuffle; pick ``bucket_width_s`` near the
typical interval width so the explosion factor stays O(1).
``max_buckets`` bounds a degenerate interval (a row spanning years
would explode to millions of rows) LOUDLY with an error.

DuckDB plans the same query with its native range-join machinery, which
is what the entry-query oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join_point"]


def range_join_point(
    left: DataFrame,
    right: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    on: str | None = None,
    bucket_width_s: int = 3600,
    max_buckets: int = 10_000,
) -> DataFrame:
    """Inner-join every right row (point ``ts_col``) to the left rows
    whose ``[start_col, end_col]`` interval contains it (inclusive
    bounds), optionally also matching on the ``on`` key column.
    Output columns: left columns then right columns (minus the shared
    ``on`` key).  Raises at runtime if any interval covers more than
    ``max_buckets`` buckets."""
    w_us = bucket_width_s * 1_000_000
    b0 = F.expr(f"unix_micros({start_col}) DIV {w_us}")
    b1 = F.expr(f"unix_micros({end_col}) DIV {w_us}")
    guarded_b1 = F.when(b1 - b0 < max_buckets, b1).otherwise(
        F.raise_error(
            F.format_string(
                "range_join_point: interval covers more than %s buckets "
                "of %ss — widen bucket_width_s or fix the data",
                F.lit(str(max_buckets)),
                F.lit(str(bucket_width_s)),
            )
        )
    )
    l = left.withColumn("__bucket", F.explode(F.sequence(b0, guarded_b1)))
    r = right.withColumn(
        "__bucket", F.expr(f"unix_micros({ts_col}) DIV {w_us}")
    )
    keys = ["__bucket"] + ([on] if on else [])
    out = (
        l.join(r, keys)
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("__bucket")
    )
    return out
