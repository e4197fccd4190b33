#!/usr/bin/env python
"""Benchmark headline queries; prints ONE JSON line.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_BENCH_ITERS (default 5).

Each query is forced through a noop sink so the full plan materializes
(a bare count() would let Catalyst prune aggregate columns).

Noise control: one untimed warm-up pass over all queries (JIT, codegen
compile, parquet footers, page cache), then ITERS timed runs per query;
the reported per-query number is the MEDIAN, with the min..max spread
in a side channel.  A single timed run was observed to swing +-2.5x on
an unchanged query (q05: 0.77 / 2.19 / 0.87 s across three round-2
runs), which made every bench delta unfalsifiable; medians of 5 agree
within ~10% run-to-run.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import __spark_entry__ as entry_mod
from zeek_duckdb_spark.session import get_spark

# Historical IDLE-machine probe medians (recorded 2026-08-14, SCALING.md
# machine-drift note: the observed idle end of the cpu 0.28-0.48 s /
# scan 0.22-0.45 s ranges).  value_normalized = value / geomean(probe /
# idle) — an estimate of what THIS run's total would read on the idle
# machine, so cross-round deltas stop needing manual A/B re-benches.
# These constants change only if the probe definitions change.
CALIBRATION_IDLE_SEC = 0.28
CALIBRATION_SCAN_IDLE_SEC = 0.25

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


def drift_ratio(calib_med: float, calib_scan_med: float, sf: float) -> float:
    """Machine-drift estimate from the calibration probes: the
    geometric mean of the two probes' ratios vs their recorded idle
    medians — the headline mix is both scan-shaped and compute-shaped,
    and geomean keeps the normalization symmetric (a 2x-slow and a
    2x-fast VM state cancel).  The SCAN probe reads sf_dir's own
    lineitem, so its idle constant is only valid at the tier it was
    recorded on (sf0.1) — at any other tier its "drift" would mostly
    measure data size, so the estimate falls back to the
    data-independent CPU probe alone."""
    if abs(sf - 0.1) < 1e-9:
        return (
            (calib_med / CALIBRATION_IDLE_SEC)
            * (calib_scan_med / CALIBRATION_SCAN_IDLE_SEC)
        ) ** 0.5
    return calib_med / CALIBRATION_IDLE_SEC


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("zeek-spark-bench")
    queries = entry_mod.queries()

    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "5"))

    def run(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def calibrate() -> float:
        # CODE-INDEPENDENT machine-speed probe: a fixed pure-codegen
        # arithmetic job whose wall time tracks the VM's current CPU
        # state, not this repo's plans.  The bench VM drifts ~1.5x
        # within a day (SCALING.md machine-drift note); dividing the
        # headline total by (calibration_sec / its historical idle
        # value, recorded in SCALING.md) normalizes cross-round comparisons.
        t0 = time.perf_counter()
        spark.range(0, 1_000_000_000, 1, 32).selectExpr(
            "sum(pmod(id * 2654435761L, 1000000007L)) AS s"
        ).collect()
        return time.perf_counter() - t0

    def calibrate_scan() -> float:
        # second probe for the IO/scheduling axis: a generic parquet
        # scan + hash aggregate over the benchmark's own lineitem dir
        # (plain spark.read, no repo code) — slow VM states hit
        # scan-shaped work harder than pure-CPU codegen
        t0 = time.perf_counter()
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
            "l_returnflag"
        ).count().collect()
        return time.perf_counter() - t0

    for name in HEADLINE:  # untimed warm-up pass
        run(name)
    calibrate()  # warm the calibration codegen too
    calib = [calibrate() for _ in range(3)]
    calibrate_scan()
    calib_scan = [calibrate_scan() for _ in range(3)]
    samples: dict[str, list[float]] = {n: [] for n in HEADLINE}
    for _ in range(iters):  # interleave iterations so drift hits all queries
        for name in HEADLINE:
            samples[name].append(run(name))

    timings = {n: round(statistics.median(s), 4) for n, s in samples.items()}
    spread = {n: [round(min(s), 4), round(max(s), 4)] for n, s in samples.items()}
    total = round(sum(timings.values()), 4)
    calib_med = statistics.median(calib)
    calib_scan_med = statistics.median(calib_scan)
    drift = drift_ratio(calib_med, calib_scan_med, sf)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "value_normalized": round(total / drift, 4),
                "machine_drift_ratio": round(drift, 4),
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "iters": iters,
                "calibration_sec": round(calib_med, 4),
                "calibration_scan_sec": round(calib_scan_med, 4),
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
