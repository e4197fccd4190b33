"""SparkSession factory with scale-appropriate defaults.

Tests and bench run on local[N]; the same config block is what we'd set
on a 1000-executor cluster (AQE on, skew-join handling, broadcast
threshold) — partition counts come from env so local runs and cluster
runs share code.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "zeek-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        # A/B-measured on the headline set: AQE-on + few initial shuffle
        # partitions is fastest at local scale (AQE coalesces anyway, and
        # fewer initial partitions = less scheduling overhead).  On a real
        # cluster raise via SPARK_GRAFT_SHUFFLE_PARTITIONS (or rely on
        # AQE's initialPartitionNum) — the data sizes there want hundreds+.
        env = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        shuffle_partitions = int(env) if env else max(8, int(cpus) // 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # respect the advisory partition size when coalescing instead
        # of preserving parallelism: at local scale this cuts post-
        # shuffle stages to the few tasks the data justifies (measured
        # -1..-5% on the sf0.1 headline set, the bigger wins on the
        # multi-stage queries), and on a busy cluster honoring the
        # target size is Spark's own documented recommendation
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            "false",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # model per-split scheduling overhead honestly: 4 MB under-
        # prices task launch for tiny inputs (sf0.1 single-file tables
        # split into several sub-second tasks); at 100 TB every file
        # dwarfs maxPartitionBytes so this only affects the tiny tail
        .config("spark.sql.files.openCostInBytes", str(16 * 1024 * 1024))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
