"""DSIR importance resampling (operators/dsir.py): DuckDB differential
for the hashed-n-gram log-weights (md5 bucketing and the sequential
fold are engine-portable), selection-quality sanity, determinism, and
plan purity."""

import duckdb
import pytest

from pyspark.sql import functions as F

from zeek_duckdb_spark.operators.dsir import (
    dsir_fit,
    dsir_logweight,
    dsir_resample,
)
from zeek_duckdb_spark.operators.hashutil import md5_long_sql

SF = "/root/testdata/sf0.001"
B = 64


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def _duckdb_logweights(sf_dir, llr, n_max=2):
    lit = "[" + ", ".join(repr(float(x)) for x in llr) + "]"
    bucket = md5_long_sql("g") + f" % {len(llr)}"
    return dict(
        duckdb.sql(
            f"""
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\\s+'),
                             t -> t <> '') AS toks
          FROM read_parquet('{sf_dir}/documents.parquet')),
        g AS (
          SELECT doc_id,
                 list_concat(
                   toks,
                   CASE WHEN len(toks) >= 2 THEN
                     list_transform(range(1, len(toks)),
                                    i -> toks[i] || ' ' || toks[i + 1])
                   ELSE [] END) AS grams
          FROM d)
        SELECT doc_id,
               ROUND(coalesce(list_sum(list_transform(grams,
                     g -> ({lit})[({bucket}) + 1])), 0.0), 6) AS w
        FROM g
        """
        ).fetchall()
    )


def test_logweight_matches_duckdb(spark, docs):
    target = docs.filter(F.col("doc_id") % 7 == 0)
    llr = dsir_fit(target, docs, buckets=B)
    assert len(llr) == B
    got = {
        r.doc_id: r.dsir_logw
        for r in dsir_logweight(docs, llr).collect()
    }
    want = _duckdb_logweights(SF, llr)
    assert set(got) == set(want)
    for k in got:
        assert got[k] == float(want[k]), k


def test_resample_prefers_target_like_docs(spark):
    common = [(i, "the quick brown fox jumps over the lazy dog") for i in range(40)]
    marked = [
        (100 + i, "quantum entanglement spectrum decoherence qubit lattice")
        for i in range(10)
    ]
    df = spark.createDataFrame(common + marked, "doc_id long, text string")
    target = spark.createDataFrame(
        [(0, "qubit decoherence in a quantum spectrum lattice")],
        "doc_id long, text string",
    )
    llr = dsir_fit(target, df, buckets=256)
    picked = dsir_resample(df, llr, n=10, seed=3).collect()
    assert len(picked) == 10
    # importance resampling concentrates on the physics-like docs
    assert sum(1 for r in picked if r.doc_id >= 100) >= 8


def test_resample_deterministic_and_without_replacement(spark, docs):
    llr = dsir_fit(docs.limit(20), docs, buckets=B)
    a = [r.doc_id for r in dsir_resample(docs, llr, n=15, seed=5).collect()]
    b = [r.doc_id for r in dsir_resample(docs, llr, n=15, seed=5).collect()]
    assert a == b and len(set(a)) == 15
    c = [r.doc_id for r in dsir_resample(docs, llr, n=15, seed=6).collect()]
    assert a != c  # a different seed reshuffles the Gumbel keys


def test_logweight_plan_pure_map(spark, docs):
    from zeek_duckdb_spark.plans import audit

    llr = [0.0] * B
    out = dsir_logweight(docs, llr)
    assert audit.num_shuffles(out) == 0
    assert "Python" not in audit.physical_plan(out)


def test_fit_rejects_unsupported_n_max_and_smoothing(spark, docs):
    # n_max >= 3 must raise, not silently featurize bigram-max;
    # smoothing <= 0 must raise up front, not log(0) on an empty bucket
    import pytest as _pytest
    from zeek_duckdb_spark.operators.dsir import dsir_fit, dsir_logweight

    with _pytest.raises(ValueError, match="n_max"):
        dsir_fit(docs, docs, n_max=3)
    with _pytest.raises(ValueError, match="smoothing"):
        dsir_fit(docs, docs, smoothing=0.0)
    with _pytest.raises(ValueError, match="n_max"):
        dsir_logweight(docs, [0.0] * 16, n_max=5)
