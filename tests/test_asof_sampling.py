"""As-of join (operators/asof.py) and deterministic sampling
(operators/pipeline.py)."""

import datetime

import pytest

from pyspark.sql import functions as F

from zeek_duckdb_spark.operators.asof import asof_join
from zeek_duckdb_spark.operators.pipeline import (
    deterministic_sample,
    stratified_sample,
)

TS = datetime.datetime


def _ts(m):
    return TS(2024, 1, 1, 0, m)


@pytest.mark.slow
def test_asof_basic_backward(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(9)), (3, 10, _ts(1)), (4, 20, _ts(7))],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts(2), 1.0), (10, _ts(5), 2.0), (10, _ts(8), 3.0), (30, _ts(0), 9.0)],
        "k long, ts timestamp, v double",
    )
    out = {r.id: r for r in asof_join(left, right, on="k", ts_col="ts").collect()}
    assert out[1].v == 2.0 and out[1].ts_r == _ts(5)   # equal ts matches (<=)
    assert out[2].v == 3.0 and out[2].ts_r == _ts(8)   # most recent prior
    assert out[3].v is None and out[3].ts_r is None    # nothing at-or-before
    assert out[4].v is None                            # key has no right rows
    assert len(out) == 4                               # left-join row count


def test_asof_row_atomic_carry(spark):
    # the newest right row has v=NULL; the match must NOT fall back to
    # the older row's non-null v (row-atomic struct carry)
    left = spark.createDataFrame([(1, 10, _ts(9))], "id long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts(2), 7.0), (10, _ts(5), None)],
        "k long, ts timestamp, v double",
    )
    r = asof_join(left, right, on="k", ts_col="ts").first()
    assert r.ts_r == _ts(5) and r.v is None


def test_asof_no_right_col_collision(spark):
    left = spark.createDataFrame([(1, 10, _ts(3))], "id long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts(1), 5.0)], "k long, ts timestamp, other double"
    )
    r = asof_join(left, right, on="k", ts_col="ts").first()
    assert r.other == 5.0 and r.ts_r == _ts(1)  # non-colliding name kept


def test_deterministic_sample_reproducible(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = sorted(r.doc_id for r in deterministic_sample(df, "doc_id", 0.3, seed=7).collect())
    b = sorted(r.doc_id for r in deterministic_sample(df, "doc_id", 0.3, seed=7).collect())
    assert a == b and 0.2 < len(a) / 2000 < 0.4
    c = sorted(r.doc_id for r in deterministic_sample(df, "doc_id", 0.3, seed=8).collect())
    assert a != c                       # different seed, different subset
    # nesting property: smaller fraction is a subset of larger
    small = set(r.doc_id for r in deterministic_sample(df, "doc_id", 0.1, seed=7).collect())
    assert small <= set(a)


def test_deterministic_sample_validates(spark):
    df = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        deterministic_sample(df, "doc_id", 1.5)


def test_stratified_sample_fractions(spark):
    rows = [(i, "keep_all" if i % 3 == 0 else ("half" if i % 3 == 1 else "rare"))
            for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = stratified_sample(
        df, "doc_id", "src", {"keep_all": 1.0, "half": 0.5}, default=0.0, seed=1
    ).groupBy("src").count().collect()
    counts = {r.src: r["count"] for r in out}
    assert counts["keep_all"] == 1000           # fraction 1.0 keeps everything
    assert 350 < counts.get("half", 0) < 650    # ~0.5
    assert "rare" not in counts                 # default 0.0 drops stratum


def test_range_join_point(spark):
    from zeek_duckdb_spark.operators.rangejoin import range_join_point

    ivals = spark.createDataFrame(
        [(1, 10, _ts(0), _ts(10)), (2, 10, _ts(20), _ts(30)), (3, 20, _ts(0), _ts(59))],
        "iid long, k long, t0 timestamp, t1 timestamp",
    )
    pts = spark.createDataFrame(
        [(100, 10, _ts(5)), (101, 10, _ts(10)), (102, 10, _ts(15)),
         (103, 20, _ts(30)), (104, 30, _ts(5))],
        "pid long, k long, ts timestamp",
    )
    out = sorted(
        (r.iid, r.pid)
        for r in range_join_point(
            ivals, pts, "t0", "t1", "ts", on="k", bucket_width_s=120
        ).collect()
    )
    # 100 in [0,10]; 101 at the inclusive end; 102 matches nothing;
    # 103 in key-20's wide interval; 104 has no interval for its key
    assert out == [(1, 100), (1, 101), (3, 103)]


def test_range_join_bucket_guard(spark):
    import datetime

    from zeek_duckdb_spark.operators.rangejoin import range_join_point

    ivals = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), datetime.datetime(2034, 1, 1))],
        "iid long, t0 timestamp, t1 timestamp",
    )
    pts = spark.createDataFrame(
        [(2, datetime.datetime(2024, 6, 1))], "pid long, ts timestamp"
    )
    with pytest.raises(Exception, match="more than"):
        range_join_point(
            ivals, pts, "t0", "t1", "ts", bucket_width_s=60, max_buckets=100
        ).collect()


# --- time-sliced (skew-bounded) as-of path ------------------------------

def _random_asof_frames(spark, seed, n_left=400, n_right=300, n_keys=7):
    import random

    rng = random.Random(seed)
    # negative timestamps included: slice assignment must FLOOR (a
    # truncating cast would glue slices -1 and 0 together)
    left = [
        (i, rng.randrange(n_keys), round(rng.uniform(-50, 100), 3))
        for i in range(n_left)
    ]
    # unique (k, ts) right rows: ASOF tie rule is engine-undefined
    seen, right = set(), []
    while len(right) < n_right:
        k, ts = rng.randrange(n_keys), round(rng.uniform(-50, 100), 3)
        if (k, ts) not in seen:
            seen.add((k, ts))
            right.append((k, ts, len(right)))
    l = spark.createDataFrame(left, "id long, k long, ts double")
    r = spark.createDataFrame(right, "k long, ts double, val long")
    return l, r


@pytest.mark.parametrize("width", [0.7, 5.0, 1000.0])
def test_asof_time_sliced_matches_plain_path(spark, width):
    l, r = _random_asof_frames(spark, seed=11)
    plain = asof_join(l, r, on="k", ts_col="ts")
    sliced = asof_join(l, r, on="k", ts_col="ts", time_bucket=width)
    assert sorted(map(tuple, sliced.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_asof_time_sliced_hot_key_and_empty_slices(spark):
    # one key holds 90% of rows (the skew case the option exists for),
    # and right rows cluster early so later slices have no right rows
    # (carry-in must cross many empty slices)
    left = [(i, 0 if i % 10 else 1, float(i)) for i in range(500)]
    right = [(0, float(t), t) for t in range(0, 20)] + [(1, 3.0, 99)]
    l = spark.createDataFrame(left, "id long, k long, ts double")
    r = spark.createDataFrame(right, "k long, ts double, val long")
    plain = asof_join(l, r, on="k", ts_col="ts")
    sliced = asof_join(l, r, on="k", ts_col="ts", time_bucket=2.5)
    assert sorted(map(tuple, sliced.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # a left row hundreds of slices past the last right row still matches
    row = {t[0]: t for t in sliced.collect()}
    assert row[491][-1] == 19  # k=0, newest right val
    assert row[490][-1] == 99  # k=1


def test_asof_time_sliced_timestamp_type(spark):
    l = spark.sql(
        "SELECT id, k, timestamp_micros(CAST(ts * 1e6 AS LONG)) AS ts "
        "FROM VALUES (1, 0, 10.5), (2, 0, 99.0), (3, 1, 4.0) AS t(id, k, ts)"
    )
    r = spark.sql(
        "SELECT k, timestamp_micros(CAST(ts * 1e6 AS LONG)) AS ts, val "
        "FROM VALUES (0, 10.0, 7), (0, 50.0, 8), (1, 9.0, 9) AS t(k, ts, val)"
    )
    plain = asof_join(l, r, on="k", ts_col="ts")
    sliced = asof_join(l, r, on="k", ts_col="ts", time_bucket=3.0)
    assert sorted(map(tuple, sliced.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_asof_time_sliced_validates_width(spark):
    l, r = _random_asof_frames(spark, seed=2, n_left=5, n_right=5)
    with pytest.raises(ValueError, match="time_bucket"):
        asof_join(l, r, on="k", ts_col="ts", time_bucket=0)


def test_asof_time_sliced_null_keys_match_plain_path(spark):
    # NULL join keys form one group in the window path; the sliced
    # path's carry join must be null-safe to agree
    l = spark.createDataFrame(
        [(1, None, 100.0), (2, None, 3.0), (3, 0, 100.0)],
        "id long, k long, ts double",
    )
    r = spark.createDataFrame(
        [(None, 5.0, 7), (0, 50.0, 8)], "k long, ts double, val long"
    )
    plain = asof_join(l, r, on="k", ts_col="ts")
    sliced = asof_join(l, r, on="k", ts_col="ts", time_bucket=10.0)
    assert sorted(map(tuple, sliced.collect())) == sorted(
        map(tuple, plain.collect())
    )
    row = {t[0]: t for t in sliced.collect()}
    assert row[1][-1] == 7  # NULL-key left row matched across slices
