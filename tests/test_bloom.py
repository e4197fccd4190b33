"""Bloom filter: zero false negatives, measured fp rate vs theory,
full-value DuckDB oracle on the words table, partitioning
determinism, gate composition, plan shape."""

import math

import duckdb
import pytest

from pyspark.sql import functions as F

from zeek_duckdb_spark.operators.bloom import (
    bloom_build,
    bloom_contains,
    bloom_gate,
    bloom_words_df,
)

SF = "/root/testdata/sf0.001"
M = 1 << 14
K = 5


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(0, 500).select(
        F.concat(F.lit("url-"), F.col("id").cast("string")).alias("k")
    )


@pytest.fixture(scope="module")
def model(keys):
    return bloom_build(keys, "k", num_bits=M, num_hashes=K)


def test_no_false_negatives(spark, keys, model):
    probed = bloom_contains(keys, "k", model)
    assert probed.filter(~F.col("maybe")).count() == 0


def test_fp_rate_near_theory(spark, model):
    n, m, k = 500, M, K
    theory = (1 - math.exp(-k * n / m)) ** k
    fresh = spark.range(10_000, 14_000).select(
        F.concat(F.lit("new-"), F.col("id").cast("string")).alias("k")
    )
    fp = bloom_contains(fresh, "k", model).filter(F.col("maybe")).count()
    rate = fp / 4000
    assert rate < max(4 * theory, 0.02), (rate, theory)


def test_words_match_duckdb_exactly(spark, keys):
    got = {
        (r.word_idx, r.word)
        for r in bloom_words_df(keys, "k", num_bits=M, num_hashes=K).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW t AS SELECT concat('url-', CAST(range AS VARCHAR)) AS k "
        "FROM range(0, 500)"
    )
    want = {
        (int(w), int(b))
        for w, b in con.sql(
            f"""
            WITH h AS (
              SELECT CAST(concat('0x', substring(md5(concat_ws(':', '7', k)),
                                                 1, 15)) AS BIGINT) AS h1,
                     CAST(concat('0x', substring(md5(concat_ws(':', '7', k)),
                                                 17, 15)) AS BIGINT) AS h2
              FROM t),
            p AS (SELECT (h1 + i.range * h2) % {M} AS pos
                  FROM h, range({K}) i)
            SELECT CAST(pos // 64 AS INT) AS word_idx,
                   bit_or(CASE WHEN pos % 64 = 63
                               THEN -9223372036854775808
                               ELSE (1::BIGINT << CAST(pos % 64 AS INT)) END)
                     AS word
            FROM p GROUP BY 1
            """
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_build_deterministic_across_partitionings(spark, keys, model):
    again = bloom_build(keys.repartition(13), "k", num_bits=M, num_hashes=K)
    assert again == model


def test_gate_composition_and_nulls(spark, keys, model):
    mixed = spark.createDataFrame(
        [("url-7",), ("definitely-fresh-xyz",), (None,)], "k string"
    )
    new = {r.k for r in bloom_gate(mixed, "k", model, keep="new").collect()}
    maybe = {r.k for r in bloom_gate(mixed, "k", model, keep="maybe").collect()}
    assert "url-7" in maybe          # a member always lands in maybe
    assert "url-7" not in new        # ...and never leaks through 'new'
    assert None not in maybe         # NULL keys probe False
    with pytest.raises(ValueError, match="keep"):
        bloom_gate(mixed, "k", model, keep="old")
    with pytest.raises(ValueError, match="num_bits"):
        bloom_build(keys, "k", num_bits=100)


def test_probe_plan_zero_shuffle(spark, keys, model):
    plan = (
        bloom_contains(keys, "k", model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Python" not in plan  # pure JVM probe


@pytest.mark.slow
def test_probe_df_matches_dict_probe(spark, keys, model, tmp_path):
    from zeek_duckdb_spark.operators.bloom import bloom_probe_df

    # the real usage shape: the words table is a LANDED artifact
    # (built once, probed by every later batch)
    wp = str(tmp_path / "bloom_words")
    bloom_words_df(keys, "k", num_bits=M, num_hashes=K).write.parquet(wp)
    words = spark.read.parquet(wp)
    mixed = spark.range(0, 1000).select(
        F.when(F.col("id") < 500,
               F.concat(F.lit("url-"), F.col("id").cast("string")))
        .otherwise(F.concat(F.lit("other-"), F.col("id").cast("string")))
        .alias("k")
    )
    a = {r.k: r.maybe for r in bloom_contains(mixed, "k", model).collect()}
    b = {
        r.k: r.maybe
        for r in bloom_probe_df(mixed, "k", words, M, K).collect()
    }
    assert a == b
    # corpus side never shuffles: only broadcast joins in the plan
    plan = (
        bloom_probe_df(mixed, "k", words, M, K)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Python" not in plan


def test_merge_equals_combined_build(spark):
    from zeek_duckdb_spark.operators.bloom import bloom_merge, bloom_merge_words

    a_keys = spark.range(0, 250).select(
        F.concat(F.lit("url-"), F.col("id").cast("string")).alias("k")
    )
    b_keys = spark.range(250, 500).select(
        F.concat(F.lit("url-"), F.col("id").cast("string")).alias("k")
    )
    both = a_keys.unionByName(b_keys)
    ma = bloom_build(a_keys, "k", num_bits=M, num_hashes=K)
    mb = bloom_build(b_keys, "k", num_bits=M, num_hashes=K)
    assert bloom_merge(ma, mb) == bloom_build(both, "k", num_bits=M, num_hashes=K)
    # distributed form: OR-merged words == words of the combined build
    wa = bloom_words_df(a_keys, "k", num_bits=M, num_hashes=K)
    wb = bloom_words_df(b_keys, "k", num_bits=M, num_hashes=K)
    merged = {
        (r.word_idx, r.word)
        for r in bloom_merge_words(wa, wb).collect()
    }
    want = {
        (r.word_idx, r.word)
        for r in bloom_words_df(both, "k", num_bits=M, num_hashes=K).collect()
    }
    assert merged == want
    with pytest.raises(ValueError, match="num_bits"):
        bloom_merge(ma, bloom_build(b_keys, "k", num_bits=M * 2, num_hashes=K))
