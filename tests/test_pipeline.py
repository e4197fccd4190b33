"""Pipeline composition + skew-guard equivalence tests."""

from pyspark.sql import functions as F

from zeek_duckdb_spark.operators.pipeline import clean_corpus, salted_group_count

SF = "/root/testdata/sf0.001"


def test_clean_corpus_invariants(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    cleaned = clean_corpus(d, min_tokens=5, max_punct_ratio=0.2)
    n_raw, n_clean = d.count(), cleaned.count()
    assert 0 < n_clean <= n_raw
    assert cleaned.filter(F.col("q_tokens") < 5).count() == 0
    assert "lang_guess" in cleaned.columns
    # no duplicate fingerprints survive
    from zeek_duckdb_spark.operators.textops import fingerprint

    fps = cleaned.select(fingerprint(F.col("text")).alias("fp"))
    assert fps.count() == fps.distinct().count()


def test_salted_group_count_equivalence(spark):
    d = spark.read.parquet(f"{SF}/orders.parquet")
    plain = {(r.o_orderpriority, r["count"]) for r in
             d.groupBy("o_orderpriority").count().collect()}
    salted = {(r.o_orderpriority, r["count"]) for r in
              salted_group_count(d, "o_orderpriority", salt=16).collect()}
    assert plain == salted
