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
                   ``CALIBSTAGE`` | ``INFO`` | ``QUIT``
  child -> parent: ``READY`` once after Spark starts, then one
                   ``TIME <sec>`` (or ``ERR <msg>``) per command.
                   RUN additionally emits ``STATS <json>`` AFTER the
                   TIME line (job/stage/task counts, gathered from the
                   status tracker AFTER the clock stops — the timed
                   region is unchanged); ``INFO`` replies
                   ``INFO <json>`` with the session's effective
                   parallelism (r17: the scaling-legibility contract —
                   the driver can see that SPARK_GRAFT_CPUS is honored
                   and how many tasks each query actually runs).

Spark's own logging goes to stderr, so stdout stays protocol-clean;
the parent still skips unknown lines defensively.
"""

from __future__ import annotations

import json
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

    run_seq = 0

    def timed(fn, stats_group: str | None = None) -> None:
        sc = spark.sparkContext
        if stats_group is not None:
            # group assignment is pre-clock and costs microseconds; all
            # stats READING happens after the TIME line is emitted, so
            # the timed region is byte-identical to the r16 protocol
            sc.setJobGroup(stats_group, stats_group)
        t0 = time.perf_counter()
        fn()
        print(f"TIME {time.perf_counter() - t0:.6f}", flush=True)
        if stats_group is not None:
            sc.setLocalProperty("spark.jobGroup.id", None)
            try:
                st = sc.statusTracker()
                jids = st.getJobIdsForGroup(stats_group) or []
                stage_ids: set[int] = set()
                for j in jids:
                    ji = st.getJobInfo(j)
                    if ji is not None:
                        stage_ids.update(ji.stageIds)
                tasks = 0
                max_stage_tasks = 0
                for sid in stage_ids:
                    si = st.getStageInfo(sid)
                    if si is not None:
                        tasks += si.numTasks
                        max_stage_tasks = max(max_stage_tasks, si.numTasks)
                stats = {
                    "jobs": len(jids),
                    "stages": len(stage_ids),
                    "tasks": tasks,
                    "max_stage_tasks": max_stage_tasks,
                }
            except Exception:
                stats = {}
            print("STATS " + json.dumps(stats), flush=True)

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        if line == "QUIT":
            break
        try:
            if line.startswith("RUN "):
                name = line[4:].strip()
                run_seq += 1
                timed(
                    lambda: queries[name](spark, sf_dir)
                    .write.format("noop")
                    .mode("overwrite")
                    .save(),
                    stats_group=f"bench:{name}:{run_seq}",
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
            elif line == "INFO":
                # effective-parallelism report (r17 scaling contract):
                # proof in the bench JSON that SPARK_GRAFT_CPUS reaches
                # the session, plus the shuffle width queries will get
                print(
                    "INFO "
                    + json.dumps(
                        {
                            "default_parallelism":
                                spark.sparkContext.defaultParallelism,
                            "shuffle_partitions": int(
                                spark.conf.get("spark.sql.shuffle.partitions")
                            ),
                            "master": spark.sparkContext.master,
                        }
                    ),
                    flush=True,
                )
            else:
                print(f"ERR unknown command {line!r}", flush=True)
        except Exception as e:  # report, keep serving
            print(f"ERR {type(e).__name__}: {e}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
