"""Sessionization: batch/stream agreement.  The streaming
applyInPandasWithState operator must emit exactly the sessions the
batch window formulation closes (the last session per user stays open
in state until its timeout)."""

import glob

import pytest

from pyspark.sql import functions as F

from zeek_duckdb_spark.operators.sessionize import (
    session_stats_batch,
    sessionize_batch,
    sessionize_stream,
)

SF = "/root/testdata/sf0.001"
GAP = 3600


@pytest.fixture(scope="module")
def events(spark):
    # ts has shipped as both TIMESTAMP(NANOS) (reads as bigint under the
    # legacy conf) and timestamp[us] — branch on the read dtype like
    # __spark_entry__._events does.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    e = spark.read.parquet(f"{SF}/events.parquet")
    if dict(e.dtypes)["ts"] == "bigint":
        ts = F.timestamp_micros(F.expr("ts DIV 1000"))
    else:
        ts = F.col("ts").cast("timestamp")
    return (
        e.filter(F.col("user_id") < 10)
        .select("user_id", ts.alias("ts"), "value", "event_id")
    )


def test_batch_sessionize_structure(events):
    s = sessionize_batch(events, gap_seconds=GAP, order_cols=["event_id"])
    per_user = s.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"), F.count("*").alias("n_events")
    )
    rows = per_user.collect()
    assert all(1 <= r.n_sessions <= r.n_events for r in rows)
    # session ids are dense 1..n per user
    dense = s.groupBy("user_id").agg(
        F.count_distinct("session_id").alias("d"), F.max("session_id").alias("m")
    )
    assert all(r.d == r.m for r in dense.collect())


def test_session_stats(events):
    st = session_stats_batch(events, gap_seconds=GAP, value_col="value")
    r = st.agg(F.sum("n_events").alias("total")).first()
    assert r.total == events.count()
    assert st.filter(F.col("duration_s") < 0).count() == 0


def test_stream_matches_batch_closed_sessions(spark, events, tmp_path):
    # stage events as json for a file stream
    src = str(tmp_path / "events_json")
    events.select(
        "user_id", F.col("ts").cast("double").alias("ts")
    ).coalesce(1).write.json(src)

    stream_in = (
        spark.readStream.schema("user_id long, ts double")
        .json(src)
    )
    batch = sessionize_batch(events, gap_seconds=GAP)
    expect = {
        r.user_id: r.m - 1  # last session per user remains open in state
        for r in batch.groupBy("user_id").agg(F.max("session_id").alias("m")).collect()
    }
    expect = {u: n for u, n in expect.items() if n > 0}
    n_expected = sum(expect.values())

    closed = sessionize_stream(stream_in, gap_seconds=GAP)
    q = (
        closed.writeStream.format("memory")
        .queryName("sessions_closed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # availableNow + pending processing-time timeouts: the query keeps
    # scheduling timeout batches, so poll for the expected rows and stop
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("SELECT count(*) FROM sessions_closed").first()[0] >= n_expected:
            break
        time.sleep(1)
    q.stop()
    got = spark.sql(
        "SELECT user_id, count(*) AS n FROM sessions_closed GROUP BY user_id"
    ).collect()
    got_map = {r.user_id: r.n for r in got}
    assert got_map == expect

    # per-session event counts agree too (for the closed ones)
    sizes = spark.sql(
        "SELECT user_id, n_events FROM sessions_closed ORDER BY user_id, session_start"
    ).collect()
    batch_sizes = (
        session_stats_batch(events, gap_seconds=GAP)
        .orderBy("user_id", "session_id")
        .collect()
    )
    batch_map: dict = {}
    for r in batch_sizes:
        batch_map.setdefault(r.user_id, []).append(r.n_events)
    stream_map: dict = {}
    for r in sizes:
        stream_map.setdefault(r.user_id, []).append(r.n_events)
    for u, ns in stream_map.items():
        assert ns == batch_map[u][: len(ns)]
