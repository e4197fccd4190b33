"""Parquet sink roundtrip: ingest reference logs, verify partition
layout, values, and partition pruning."""

import os

from pyspark.sql import functions as F

from zeek_duckdb_spark.sources.sink import ingest_zeek_to_parquet

REF = "/root/reference/data"


def test_ingest_roundtrip(spark, tmp_path):
    out = str(tmp_path / "kh_parquet")
    df = ingest_zeek_to_parquet(
        spark, f"{REF}/known_hosts*.gz", out, granularity="hour", inet=False
    )
    assert df.count() == 27
    # partition directories exist
    dates = [d for d in os.listdir(out) if d.startswith("p_date=")]
    assert dates, "expected p_date= partition dirs"
    hours = os.listdir(os.path.join(out, dates[0]))
    assert any(h.startswith("p_hour=") for h in hours)
    # values survive the roundtrip (interval cols etc.)
    row = df.filter(F.col("host_ip") == "10.21.7.136").orderBy("ts").first()
    assert row.conns_opened >= 0
    assert row.annotations is None or isinstance(row.annotations, list)


def test_partition_pruning(spark, tmp_path):
    out = str(tmp_path / "kh2")
    df = ingest_zeek_to_parquet(spark, f"{REF}/known_hosts*.gz", out, inet=False)
    # fixtures span two UTC dates (the -0500 hourly files cross midnight)
    days = {r.p_date for r in df.select("p_date").distinct().collect()}
    assert len(days) == 2
    pruned = df.filter(F.col("p_date") == "2026-01-16")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(p_date" in plan
    assert 0 < pruned.count() < df.count()
    assert pruned.count() + df.filter(F.col("p_date") != "2026-01-16").count() == 27
