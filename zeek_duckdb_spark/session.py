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
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
