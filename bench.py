#!/usr/bin/env python
"""Benchmark headline queries; prints ONE JSON line.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Each query is forced through a noop sink so the full plan materializes
(a bare count() would let Catalyst prune aggregate columns).
"""

from __future__ import annotations

import json
import os
import sys
import time

import __spark_entry__ as entry_mod
from zeek_duckdb_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary",
    "q03_top_orders",
    "q05_nation_revenue",
    "q09_group_big",
    "q12_window_running",
    "dd_exact_groups",
    "dd_minhash_lsh",
    "sim_topk",
    "tx_quality",
    "q29_sessionize",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("zeek-spark-bench")
    queries = entry_mod.queries()

    # Steady-state measurement: one untimed warm-up run per query (JVM
    # JIT, whole-stage codegen compile, parquet footer + OS page cache),
    # then the timed run.  The baseline engine gets the same warm-cache
    # treatment implicitly (its second run is what users experience).
    timings: dict[str, float] = {}
    for name in HEADLINE:
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in HEADLINE:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
