#!/usr/bin/env python
"""Paired-arm bench child: owns ONE SparkSession over ONE repo
checkout (the arm) and executes timing commands from stdin — the
worker half of bench.py's interleaved A/B protocol.

The arm's code is taken from $SPARK_GRAFT_ARM_DIR (sys.path-prepended;
the parent also sets cwd there), so the SAME runner file drives both
the HEAD checkout and the pinned baseline worktree — the baseline
snapshot does not need to contain this script.

Protocol (line-oriented, stdout):
  parent -> child: ``RUN <query>`` | ``CALIB`` | ``CALIBSCAN`` |
                   ``CALIBSTAGE`` | ``QUIT``
  child -> parent: ``READY`` once after Spark starts, then one
                   ``TIME <sec>`` (or ``ERR <msg>``) per command.

Spark's own logging goes to stderr, so stdout stays protocol-clean;
the parent still skips unknown lines defensively.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    arm_dir = os.environ.get("SPARK_GRAFT_ARM_DIR") or os.getcwd()
    sys.path.insert(0, arm_dir)

    import __spark_entry__ as entry_mod
    from zeek_duckdb_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("zeek-spark-bench-arm")
    queries = entry_mod.queries()
    print("READY", flush=True)

    def timed(fn) -> None:
        t0 = time.perf_counter()
        fn()
        print(f"TIME {time.perf_counter() - t0:.6f}", flush=True)

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        if line == "QUIT":
            break
        try:
            if line.startswith("RUN "):
                name = line[4:].strip()
                timed(
                    lambda: queries[name](spark, sf_dir)
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )
            elif line == "CALIB":
                # pure-codegen ALU probe (32 long tasks): tracks raw
                # CPU speed, blind to scheduler/SMT contention
                timed(
                    lambda: spark.range(0, 1_000_000_000, 1, 32)
                    .selectExpr(
                        "sum(pmod(id * 2654435761L, 1000000007L)) AS s"
                    )
                    .collect()
                )
            elif line == "CALIBSCAN":
                timed(
                    lambda: spark.read.parquet(
                        f"{sf_dir}/lineitem.parquet"
                    )
                    .groupBy("l_returnflag")
                    .count()
                    .collect()
                )
            elif line == "CALIBSTAGE":
                # stage-SHAPED probe: 64 short (~10 ms) map tasks + a
                # shuffled aggregate — the task-launch/scheduler/SMT
                # profile the headline queries actually pay, which the
                # long-task ALU probe cannot sense (BENCH_r10: drift
                # read 0.80 "fast" while 32-task stages ran 23% slow)
                timed(
                    lambda: spark.range(0, 64_000_000, 1, 64)
                    .selectExpr("pmod(id * 2654435761L, 1024) AS k")
                    .groupBy("k")
                    .count()
                    .collect()
                )
            else:
                print(f"ERR unknown command {line!r}", flush=True)
        except Exception as e:  # report, keep serving
            print(f"ERR {type(e).__name__}: {e}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
