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


def test_clean_corpus_optional_stages(spark):
    from zeek_duckdb_spark.operators.pipeline import clean_corpus

    corpus = spark.createDataFrame(
        [
            (1, "mail me at a@b.io about the data and the results today ok"),
            (2, "the quick brown fox jumps over the lazy dog every single day"),
            (3, "an unrelated document with plenty of ordinary tokens in it"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "the quick brown fox jumps over the lazy dog every single day")],
        "doc_id long, text string",
    )
    out = clean_corpus(
        corpus, min_tokens=3, redact_pii=True, benchmark=bench, decontam_ngram=10
    )
    rows = {r.doc_id: r.text for r in out.collect()}
    assert 2 not in rows  # decontaminated
    assert "<EMAIL>" in rows[1]  # redacted before features/dedup
    assert 3 in rows
