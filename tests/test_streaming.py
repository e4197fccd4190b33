"""Structured Streaming ingestion of rotating Zeek logs: copy the
reference's hourly-rotated fixtures into a watched directory, run an
availableNow micro-batch into a memory sink, assert typed rows and a
windowed rollup."""

import glob
import shutil

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from zeek_duckdb_spark.streaming.zeek_stream import (
    read_zeek_stream,
    validate_stream_schemas,
    windowed_rollup,
)

REF = "/root/reference/data"


@pytest.fixture()
def log_dir(tmp_path):
    d = tmp_path / "zeek_logs"
    d.mkdir()
    for f in sorted(glob.glob(f"{REF}/known_hosts_*.log.gz"))[:6]:
        shutil.copy(f, d)
    return str(d)


def _run_available_now(stream, name):
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_reads_typed_rows(spark, log_dir):
    stream = read_zeek_stream(spark, log_dir, inet=False)
    assert stream.isStreaming
    assert stream.schema["ts"].dataType == T.TimestampType()
    assert stream.schema["conns_opened"].dataType == T.LongType()
    _run_available_now(stream, "zeek_mem")
    out = spark.sql("SELECT * FROM zeek_mem")
    n = out.count()
    # 6 hourly files; each has >= 1 row
    assert n >= 6
    assert out.filter(F.col("host_ip").isNull()).count() == 0
    assert out.select("ts").first()[0] is not None


def test_stream_picks_up_new_file(spark, log_dir):
    stream = read_zeek_stream(spark, log_dir, inet=False)
    _run_available_now(stream, "zeek_mem2")
    n1 = spark.sql("SELECT count(*) FROM zeek_mem2").first()[0]
    # rotate in a new file, run another availableNow batch
    extra = sorted(glob.glob(f"{REF}/known_hosts_*.log.gz"))[6]
    shutil.copy(extra, log_dir)
    stream2 = read_zeek_stream(spark, log_dir, inet=False)
    _run_available_now(stream2, "zeek_mem3")
    n2 = spark.sql("SELECT count(*) FROM zeek_mem3").first()[0]
    assert n2 > n1


def test_windowed_rollup(spark, log_dir):
    stream = read_zeek_stream(spark, log_dir, inet=False)
    rolled = windowed_rollup(
        stream,
        "ts",
        window="1 hour",
        watermark="4 hours",
        group_cols=["host_ip"],
        aggs=[
            F.count("*").alias("n"),
            F.sum("conns_opened").alias("conns_opened"),
        ],
    )
    q = (
        rolled.writeStream.format("memory")
        .queryName("zeek_rollup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM zeek_rollup")
    # append mode only emits windows the watermark has closed; with
    # 6 hourly files the earliest windows are closed
    assert "window" in out.columns
    rows = out.collect()
    assert all(r.n >= 1 for r in rows)


def test_exact_dedup_stream(spark, tmp_path):
    """Streaming exact dedup: duplicates within the watermark horizon
    collapse to one emitted row per fingerprint (stream vs batch
    fingerprint sets agree; which duplicate survives is
    arrival-order-dependent by design)."""
    import json

    from pyspark.sql import types as ST

    from zeek_duckdb_spark.operators.dedup import exact_dedup_stream
    from zeek_duckdb_spark.operators.textops import fingerprint

    d = tmp_path / "dedup_stream"
    d.mkdir()
    rows = [
        {"doc_id": 1, "ts": "2024-01-01T00:00:00", "text": "alpha beta"},
        {"doc_id": 2, "ts": "2024-01-01T00:00:10", "text": "alpha  BETA"},  # dup (normalized)
        {"doc_id": 3, "ts": "2024-01-01T00:00:20", "text": "gamma"},
        {"doc_id": 4, "ts": "2024-01-01T00:00:30", "text": "alpha beta"},  # dup
        {"doc_id": 5, "ts": "2024-01-01T00:00:40", "text": "delta"},
    ]
    (d / "a.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = ST.StructType(
        [
            ST.StructField("doc_id", ST.LongType()),
            ST.StructField("ts", ST.TimestampType()),
            ST.StructField("text", ST.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).json(str(d))
    deduped = exact_dedup_stream(stream, "ts", watermark_delay="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dedup_stream_out").collect()
    assert len(out) == 3  # alpha-beta group, gamma, delta
    got_fps = sorted(
        r.fp for r in spark.createDataFrame(out)
        .select(fingerprint(F.col("text")).alias("fp")).collect()
    )
    batch_fps = sorted(
        r.fp
        for r in spark.read.schema(schema).json(str(d))
        .select(fingerprint(F.col("text")).alias("fp")).distinct().collect()
    )
    assert got_fps == batch_fps


def test_near_dedup_stream_collapses_reorderings(spark, tmp_path):
    """Streaming SimHash dedup: token reorderings (identical sketch,
    different fingerprint) collapse; distinct content survives."""
    import json

    from zeek_duckdb_spark.operators.dedup import near_dedup_stream

    d = tmp_path / "near_dedup_stream"
    d.mkdir()
    rows = [
        {"doc_id": 1, "ts": "2024-01-01T00:00:00", "text": "alpha beta gamma"},
        {"doc_id": 2, "ts": "2024-01-01T00:00:10", "text": "gamma beta alpha"},  # reorder
        {"doc_id": 3, "ts": "2024-01-01T00:00:20", "text": "  ALPHA beta gamma "},  # case+ws
        {"doc_id": 4, "ts": "2024-01-01T00:00:30", "text": "totally different words"},
    ]
    (d / "a.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).json(str(d))
    q = (
        near_dedup_stream(stream, "ts", watermark_delay="1 hour")
        .writeStream.format("memory")
        .queryName("near_dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM near_dedup_out").collect()
    # docs 1-3 share a sketch (order-independent token multiset); doc 4 survives
    assert len(out) == 2
    assert {r.doc_id for r in out} & {1, 2, 3}
    assert any(r.doc_id == 4 for r in out)


# --- offline schema-divergence detection (the batch A22 guarantee,
# recovered for streams via a periodic validator) ---------------------


def test_validate_stream_schemas_clean_directory():
    # 24 rotated files, identical headers -> no divergence
    assert validate_stream_schemas(REF, pattern="known_hosts_*.log.gz") == []


@pytest.mark.parametrize(
    ("fixture", "substr"),
    [
        ("schema_extra", "different field count"),
        ("schema_reorder", "field 0 differs"),
        ("schema_type", "type for field"),
    ],
)
def test_validate_stream_schemas_detects_divergence(fixture, substr):
    from zeek_duckdb_spark.header import ZeekHeaderError

    with pytest.raises(ZeekHeaderError, match=substr):
        validate_stream_schemas(f"{REF}/{fixture}", pattern="*.log")
    # report mode returns the divergent file instead of raising
    bad = validate_stream_schemas(
        f"{REF}/{fixture}", pattern="*.log", raise_on_divergence=False
    )
    assert len(bad) == 1 and bad[0][0].endswith("b.log") and substr in bad[0][1]


def test_stream_open_validates_existing_files(spark):
    from zeek_duckdb_spark.header import ZeekHeaderError

    # a directory already containing a divergent header fails at open
    # (the batch A22 guarantee, applied eagerly to pre-existing files)
    with pytest.raises(ZeekHeaderError, match="type for field"):
        read_zeek_stream(spark, f"{REF}/schema_type", pattern="*.log", inet=False)
    # opt-out restores the old open-blind behavior
    s = read_zeek_stream(
        spark, f"{REF}/schema_type", pattern="*.log", inet=False,
        validate_existing=False,
    )
    assert s.isStreaming


def test_json_stream_reads_typed_rows(spark, tmp_path):
    import json as _json

    from zeek_duckdb_spark.streaming.zeek_stream import read_zeek_json_stream

    d = tmp_path / "json_logs"
    d.mkdir()
    types = {"ts": "time", "uid": "string", "id.orig_p": "port", "orig_bytes": "count"}
    with open(d / "conn_1.json", "w") as f:
        f.write(_json.dumps({"ts": 1591367999.305988, "uid": "C1",
                             "id.orig_p": 443, "orig_bytes": 10}) + "\n")
        f.write(_json.dumps({"ts": 1591368000.5, "uid": "C2",
                             "id.orig_p": 99999, "orig_bytes": -1}) + "\n")
    stream = read_zeek_json_stream(spark, str(d), types)
    assert stream.isStreaming
    assert dict(stream.dtypes) == {
        "ts": "timestamp", "uid": "string", "id_orig_p": "int", "orig_bytes": "bigint",
    }
    _run_available_now(stream, "jsonstream")
    rows = {r.uid: r for r in spark.table("jsonstream").collect()}
    assert rows["C1"].ts.microsecond == 305988 and rows["C1"].id_orig_p == 443
    assert rows["C2"].id_orig_p is None and rows["C2"].orig_bytes is None
    with pytest.raises(ValueError, match="timestamps"):
        read_zeek_json_stream(spark, str(d), types, timestamps="nope")
