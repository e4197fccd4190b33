"""End-to-end streaming composition: the reference's 24 hourly-rotated
known_hosts fixtures flow through read_zeek_stream -> near_dedup_stream
-> sessionize_stream in ONE streaming query (three chained stateful
operators), with a replayed rotation file proving the dedup stage drops
re-delivered rows before they can inflate session event counts.

A second test proves checkpointed exactly-once delivery to a file sink
across a query restart: rows drained before the restart are not
re-emitted, new files are picked up, and a replayed old file adds
nothing.

Each streaming operator is covered alone in test_streaming.py /
test_sessionize.py; these tests exist to prove they COMPOSE (Spark only
allows some chains of stateful operators, and watermark propagation
across them is easy to get wrong silently).
"""

import glob
import gzip
import os
import shutil
import time

import pytest

from pyspark.sql import functions as F

from zeek_duckdb_spark.operators.dedup import near_dedup_stream
from zeek_duckdb_spark.operators.sessionize import sessionize_batch, sessionize_stream
from zeek_duckdb_spark.sources.zeek import read_zeek
from zeek_duckdb_spark.streaming.zeek_stream import read_zeek_stream

REF = "/root/reference/data"
GAP = 1800


def _stage(dst, n_files):
    os.makedirs(dst, exist_ok=True)
    files = sorted(glob.glob(f"{REF}/known_hosts_*.log.gz"))[:n_files]
    for f in files:
        shutil.copy(f, dst)
    return files


def _replay(src_gz, dst_log):
    """Re-deliver a rotated hour verbatim as a plain .log (a crashed
    shipper re-sending an already-landed rotation)."""
    with gzip.open(src_gz, "rt") as fh:
        body = fh.read()
    with open(dst_log, "w") as out:
        out.write(body)


def _text_col(df):
    # unique per fixture row (kuid is a per-connection uid), identical
    # for a replayed copy of the same row
    return df.withColumn(
        "text",
        F.concat_ws(" ", "kuid", "host_ip", F.col("host_vlan").cast("string")),
    )


def _poll_memory(spark, table, want, deadline_s=120):
    deadline = time.time() + deadline_s
    while time.time() < deadline:
        if spark.sql(f"SELECT count(*) FROM {table}").first()[0] >= want:
            return
        time.sleep(1)


@pytest.mark.slow
def test_stream_compose_dedup_then_sessionize(spark, tmp_path):
    d = str(tmp_path / "logs")
    files = _stage(d, 24)
    # replay three already-delivered hours -> exact duplicate rows the
    # dedup stage must drop (same kuid/host/ts => same simhash)
    for i, f in enumerate(files[:3]):
        _replay(f, f"{d}/known_hosts_replay_{i}.log")

    # batch expectation over the SAME directory: dedup is dropDuplicates
    # on the text key, sessions keyed by host, gap 30 min
    batch = _text_col(read_zeek(spark, f"{d}/*.log*", inet=False))
    distinct = batch.dropDuplicates(["text"])
    n_raw, n_distinct = batch.count(), distinct.count()
    assert n_raw > n_distinct  # the replay really planted duplicates
    ev = distinct.select(
        F.crc32("host_ip").alias("user_id"), F.col("ts").cast("double").alias("ts")
    )
    bsess = sessionize_batch(ev, gap_seconds=GAP)
    stats = (
        bsess.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n"), F.min("ts").alias("t0"))
        .collect()
    )
    last = {}  # the last session per user stays open in stream state
    for r in stats:
        if r.user_id not in last or r.session_id > last[r.user_id]:
            last[r.user_id] = r.session_id
    want_closed = [
        (r.user_id, r.n) for r in stats if r.session_id != last[r.user_id]
    ]
    assert want_closed  # fixture spans 24 h, gap 30 min => sessions close

    s = _text_col(read_zeek_stream(spark, d, inet=False))
    dd = near_dedup_stream(s, ts_col="ts", text_col="text")
    prepped = dd.select(
        F.crc32("host_ip").alias("user_id"), F.col("ts").cast("double").alias("ts")
    )
    sess = sessionize_stream(prepped, gap_seconds=GAP, user_col="user_id", ts_col="ts")
    q = (
        sess.writeStream.format("memory")
        .queryName("e2e_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _poll_memory(spark, "e2e_sessions", len(want_closed))
    q.stop()

    got = spark.sql(
        "SELECT user_id, n_events FROM e2e_sessions ORDER BY session_start"
    ).collect()
    # every closed session matches the batch-over-distinct-rows session:
    # if dedup had leaked a replayed row into the pipeline, its session's
    # n_events would be inflated here
    assert sorted((r.user_id, r.n_events) for r in got) == sorted(want_closed)


@pytest.mark.slow
def test_stream_dedup_checkpoint_exactly_once(spark, tmp_path):
    d = str(tmp_path / "logs")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    files = sorted(glob.glob(f"{REF}/known_hosts_*.log.gz"))
    _stage(d, 6)

    def run_once():
        s = _text_col(read_zeek_stream(spark, d, inet=False))
        dd = near_dedup_stream(s, ts_col="ts", text_col="text")
        q = (
            dd.select("ts", "kuid", "host_ip")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 == read_zeek(spark, f"{d}/*.log*", inet=False).count()

    # rotate in two NEW hours plus a replay of hour 0 (already emitted
    # before the restart), then restart from the same checkpoint
    for f in files[6:8]:
        shutil.copy(f, d)
    _replay(files[0], f"{d}/known_hosts_replay.log")
    run_once()

    final = spark.read.parquet(out)
    expect = (
        read_zeek(spark, f"{d}/*.log*", inet=False)
        .dropDuplicates(["kuid", "host_ip", "ts"])
        .count()
    )
    # exactly-once: phase-1 rows appear once (not re-emitted on restart),
    # the two new hours appear, the replayed hour adds nothing (dropped
    # by dedup state / the advanced watermark)
    assert final.count() == expect
    assert final.dropDuplicates(["kuid", "host_ip", "ts"]).count() == final.count()


def test_streaming_incremental_dedup_ingest(spark, tmp_path):
    """The standing-crawl ingest loop in Structured Streaming: each
    microbatch runs exact_dedup_incremental against the persisted
    fingerprint index inside foreachBatch, appends survivors to the
    landing AND their fps to the index — so a duplicate arriving in a
    LATER microbatch is dropped by state that lives entirely in
    parquet (restart-safe by construction, no state store)."""
    import json
    import os

    from pyspark.sql import functions as F
    from zeek_duckdb_spark.operators.dedup import exact_dedup_incremental
    from zeek_duckdb_spark.operators.textops import fingerprint

    src = tmp_path / "in"
    src.mkdir()
    fps_path = str(tmp_path / "fps")
    landing = str(tmp_path / "landing")
    # seed an empty-but-readable index
    spark.createDataFrame([("__seed__",)], "fp string").write.parquet(fps_path)

    def ingest(batch_df, batch_id):
        surv = exact_dedup_incremental(
            batch_df, batch_df.sparkSession.read.parquet(fps_path)
        )
        surv.drop("fp").write.mode("append").parquet(landing)
        surv.select("fp").write.mode("append").parquet(fps_path)

    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        with open(src / "b0.json", "w") as f:
            f.write(json.dumps({"doc_id": 1, "text": "first unique doc"}) + "\n")
            f.write(json.dumps({"doc_id": 2, "text": "second unique doc"}) + "\n")
            f.write(json.dumps({"doc_id": 3, "text": "first unique doc"}) + "\n")
        q.processAllAvailable()
        with open(src / "b1.json", "w") as f:
            f.write(json.dumps({"doc_id": 4, "text": "second unique doc"}) + "\n")
            f.write(json.dumps({"doc_id": 5, "text": "a third distinct doc"}) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()

    landed = {r.doc_id for r in spark.read.parquet(landing).collect()}
    # batch dup (3) and cross-batch dup (4) both die; 1, 2, 5 land once
    assert landed == {1, 2, 5}
    n_fps = spark.read.parquet(fps_path).filter(F.col("fp") != "__seed__").count()
    assert n_fps == 3


@pytest.mark.slow
def test_stream_clean_ingest_two_batches_restart(spark, tmp_path, monkeypatch):
    """incremental_clean_ingest_stream: the FULL daily-crawl loop
    (exact + fuzzy dedup vs the persisted indexes, per-batch landing,
    index appends) as a foreachBatch streaming job — two rotated-in
    batches processed across a query RESTART must land exactly the
    batch loop's survivors, with no duplicate index rows, and a
    re-delivered day-1 file after the second restart must add
    nothing.  Compaction runs BY DEFAULT (round 13): the caller does
    NOT pass compact_after — the module default cadence, forced low
    here by lowering STREAM_COMPACT_AFTER_DEFAULT, fires mid-loop and
    must change the index LAYOUT only — every survivor/index
    assertion below is identical to the uncompacted contract, and the
    indexes end at the one-file floor instead of one-pile-per-batch."""
    import glob as _glob

    from zeek_duckdb_spark.operators import pipeline as P
    from zeek_duckdb_spark.operators.pipeline import (
        incremental_clean_ingest,
        incremental_clean_ingest_stream,
    )

    assert P.STREAM_COMPACT_AFTER_DEFAULT == 64  # the shipped default
    monkeypatch.setattr(P, "STREAM_COMPACT_AFTER_DEFAULT", 1)

    src = tmp_path / "in"
    src.mkdir()
    fps, sigs = str(tmp_path / "fps"), str(tmp_path / "sigs")
    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")

    day1 = spark.createDataFrame(
        [(1, "first unique document body right here"),
         (2, "second unique document body over there"),
         (3, "first unique document body right here")],   # in-batch dup
        "doc_id long, text string",
    )
    day2 = spark.createDataFrame(
        [(10, "first unique document body right here"),   # dup of day 1
         (11, "a genuinely new day two document body")],
        "doc_id long, text string",
    )

    def land_file(df, name):
        stage = str(tmp_path / f"_stage_{name}")
        df.coalesce(1).write.parquet(stage)
        part = _glob.glob(f"{stage}/part-*.parquet")[0]
        shutil.copy(part, f"{src}/{name}.parquet")

    def run_stream():
        s = spark.readStream.schema("doc_id long, text string").parquet(str(src))
        q = incremental_clean_ingest_stream(
            s, fps, sigs, land, ckpt, threshold=0.5
        )
        q.awaitTermination(120)
        q.stop()

    land_file(day1, "day1")
    run_stream()                      # batch 0 = day 1, then the query exits
    land_file(day2, "day2")
    run_stream()                      # restart from checkpoint; batch 1 = day 2

    # survivors per batch == the batch loop on the same days
    bfps, bsigs = str(tmp_path / "bfps"), str(tmp_path / "bsigs")
    want1 = {r.doc_id for r in incremental_clean_ingest(
        day1, bfps, bsigs, threshold=0.5).collect()}
    want2 = {r.doc_id for r in incremental_clean_ingest(
        day2, bfps, bsigs, threshold=0.5).collect()}
    got1 = {r.doc_id for r in spark.read.parquet(f"{land}/batch=0").collect()}
    got2 = {r.doc_id for r in spark.read.parquet(f"{land}/batch=1").collect()}
    assert (got1, got2) == (want1, want2) == ({1, 2}, {11})

    # no duplicate index rows: one sig row and one distinct fp per
    # unique surviving doc
    sig_ids = [r.doc_id for r in spark.read.parquet(sigs).select("doc_id").collect()]
    assert sorted(sig_ids) == [1, 2, 11]
    fp_rows = [r.fp for r in spark.read.parquet(fps).collect()]
    assert len(fp_rows) == len(set(fp_rows)) == 3  # one fp per survivor

    # a re-delivered day-1 file (same rows, new filename) after another
    # restart self-deduplicates against the index: no new landing dir,
    # no index growth
    n_sigs_before = spark.read.parquet(sigs).count()
    land_file(day1, "day1_redelivered")
    run_stream()
    assert not _glob.glob(f"{land}/batch=2")
    assert spark.read.parquet(sigs).count() == n_sigs_before
    assert {r.doc_id for r in spark.read.parquet(land).collect()} == {1, 2, 11}

    # the DEFAULT cadence (forced to 1) held the indexes at the
    # compaction floor with no caller opt-in
    import os as _os
    for idx in (fps, sigs):
        n = sum(
            1 for r, _d, ns in _os.walk(idx) for f in ns
            if f.endswith(".parquet") and not f.startswith(".")
        )
        assert n == 1, f"{idx}: expected the one-file floor, got {n}"


@pytest.mark.slow
def test_stream_clean_ingest_classifier_gate_matches_batch(spark, tmp_path):
    """Streaming classifier gate (clean_corpus's learned-quality dict
    threaded through incremental_clean_ingest_stream): a planted
    low-quality batch loses its junk docs in the STREAM exactly as in
    the batch loop — the gate is a zero-shuffle expression fold, so
    the two paths are the same plan.  Rejected docs also never enter
    the fp/sig indexes."""
    import glob as _glob
    import json as _json

    from zeek_duckdb_spark.operators.classifier import token_logreg_fit
    from zeek_duckdb_spark.operators.pipeline import (
        incremental_clean_ingest,
        incremental_clean_ingest_stream,
    )

    labeled = spark.createDataFrame(
        [(i, "research analysis data method result study", 1)
         for i in range(30)]
        + [(100 + i, "buy cheap pills casino bonus click offer", 0)
           for i in range(30)],
        "doc_id long, text string, label int",
    )
    m = token_logreg_fit(labeled, "label", dim=128, iters=10, lr=2.0)
    gate = {"weights": m["weights"], "bias": m["bias"], "threshold": 0.5}

    batch = spark.createDataFrame(
        [(1, "the research method shows a clear result in the data"),
         (2, "buy cheap pills now casino bonus winner click offer deal"),
         (3, "this analysis of the study evidence supports the theory"),
         (4, "the research method shows a clear result in the data")],
        "doc_id long, text string",
    )  # 2 = planted junk, 4 = dup of 1

    src = tmp_path / "in"
    src.mkdir()
    fps, sigs = str(tmp_path / "fps"), str(tmp_path / "sigs")
    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    stage = str(tmp_path / "_stage")
    batch.coalesce(1).write.parquet(stage)
    shutil.copy(_glob.glob(f"{stage}/part-*.parquet")[0],
                f"{src}/day1.parquet")

    s = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    q = incremental_clean_ingest_stream(
        s, fps, sigs, land, ckpt, threshold=0.5, classifier=gate
    )
    q.awaitTermination(120)
    q.stop()

    got = {r.doc_id for r in spark.read.parquet(f"{land}/batch=0").collect()}
    bfps, bsigs = str(tmp_path / "bfps"), str(tmp_path / "bsigs")
    want = {r.doc_id for r in incremental_clean_ingest(
        batch, bfps, bsigs, threshold=0.5, classifier=gate
    ).collect()}
    assert got == want == {1, 3}  # junk gated, dup deduped, good lands
    # rejected docs never reached the indexes
    sig_ids = sorted(
        r.doc_id for r in spark.read.parquet(sigs).select("doc_id").collect()
    )
    assert sig_ids == [1, 3]
