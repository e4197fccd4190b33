"""Pipeline composition + skew-guard equivalence tests."""

import os

import pytest

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


def test_full_corpus_pipeline_end_to_end(spark, tmp_path):
    """The complete 100 TB-shaped training-data flow composed from the
    operator suite: PII scrub -> benchmark decontamination -> quality
    filter + exact dedup -> deterministic sample -> partitioned write.
    Asserts the output AND the plan shape: every stage before dedup is
    map-side (broadcast joins only), so the whole pipeline pays exactly
    the dedup aggregate's shuffle plus the sample-free write."""
    from zeek_duckdb_spark.operators.pipeline import (
        clean_corpus,
        deterministic_sample,
    )
    from zeek_duckdb_spark.plans import audit

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 100 == 7).select("doc_id", "text")

    cleaned = clean_corpus(
        docs, min_tokens=3, redact_pii=True, benchmark=bench, decontam_ngram=8
    )
    sampled = deterministic_sample(cleaned, "doc_id", fraction=0.5, seed=4)

    plan = audit.physical_plan(sampled)
    assert "SortMergeJoin" not in plan  # all joins broadcast at this scale

    out = str(tmp_path / "corpus_out")
    sampled.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    n = back.count()
    assert 0 < n < docs.count()
    assert "lang_guess" in back.columns
    # sample is re-derivable: same seed -> same subset
    again = {r.doc_id for r in deterministic_sample(cleaned, "doc_id", 0.5, seed=4)
             .select("doc_id").collect()}
    assert {r.doc_id for r in back.select("doc_id").collect()} == again


def test_decontamination_catches_pii_spanning_ngrams(spark):
    """A benchmark n-gram that CONTAINS an email must still collide
    with the (redacted) corpus when redact_pii=True — the benchmark
    side is redacted identically before its grams are built, so PII
    inside the overlap can't mask contamination."""
    from zeek_duckdb_spark.operators.pipeline import clean_corpus

    leak = "please contact bob@example.com about the seventh annual review meeting today"
    corpus = spark.createDataFrame(
        [
            (1, leak),  # contaminated, PII inside the overlapping gram
            (2, "an unrelated document with plenty of ordinary tokens in it"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(9, leak)], "doc_id long, text string")
    out = clean_corpus(
        corpus, min_tokens=3, redact_pii=True, benchmark=bench, decontam_ngram=8
    )
    ids = {r.doc_id for r in out.collect()}
    assert 1 not in ids  # dropped despite the email inside the n-gram
    assert 2 in ids


def test_shard_corpus_deterministic_and_complete(spark):
    from zeek_duckdb_spark.operators.pipeline import shard_corpus

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = {r.doc_id: r.shard for r in shard_corpus(df, 8).collect()}
    b = {r.doc_id: r.shard for r in shard_corpus(df.repartition(7), 8).collect()}
    assert a == b                       # placement-independent
    assert set(a.values()) <= set(range(8))
    c = {r.doc_id: r.shard for r in shard_corpus(df, 8, seed=1).collect()}
    assert a != c                       # seed actually reshuffles
    with pytest.raises(ValueError, match="n_shards"):
        shard_corpus(df, 0)


def test_pack_sequences_concat_and_chunk_invariants(spark):
    from zeek_duckdb_spark.operators.pipeline import pack_sequences

    rows = [(i, 100 + (i * 37) % 400) for i in range(50)]   # 100..499 tokens
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, seq_len=512, n_shards=4).collect()
    assert len(out) == 50                                   # no doc dropped
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r.doc_id)
        start = 0
        for r in docs:                                      # running layout
            assert r.seq_id == start // 512
            assert r.seq_offset == start % 512
            start += r.n_tokens
    # deterministic under repartitioning
    again = pack_sequences(df.repartition(9), seq_len=512, n_shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_pack_sequences_single_shard_layout(spark):
    from zeek_duckdb_spark.operators.pipeline import pack_sequences

    df = spark.createDataFrame(
        [(1, 300), (2, 300), (3, 300)], "doc_id long, n_tokens long"
    )
    got = {r.doc_id: (r.seq_id, r.seq_offset)
           for r in pack_sequences(df, seq_len=512).collect()}
    # doc2 STARTS inside seq 0 at offset 300 (straddles into seq 1);
    # doc3 starts in seq 1 at offset 88
    assert got == {1: (0, 0), 2: (0, 300), 3: (1, 88)}


def test_clean_corpus_full_stage_stack(spark):
    """Every optional stage at once, in crawl-pipeline order: domain
    blocklist -> PII redaction -> decontamination -> span stripping ->
    quality filter -> exact dedup."""
    from zeek_duckdb_spark.operators.pipeline import clean_corpus

    passage = "alpha beta gamma delta epsilon zeta eta theta"
    bench_text = "the quick brown fox jumps over the lazy dog every single day"
    corpus = spark.createDataFrame(
        [
            (1, "spam link https://bad.example/x plus plenty of other tokens here"),
            (2, "mail me at a@b.io about the data and the results today ok"),
            (3, bench_text),
            (4, "document one has " + passage + " inside plus unique tail text"),
            (5, "document two has " + passage + " inside plus other words entirely"),
            (6, "an unrelated document with plenty of ordinary tokens in it"),
        ],
        "doc_id long, text string",
    )
    out = clean_corpus(
        corpus,
        min_tokens=3,
        redact_pii=True,
        benchmark=spark.createDataFrame([(9, bench_text)], "doc_id long, text string"),
        decontam_ngram=10,
        blocked_domains=spark.createDataFrame([("bad.example",)], ["domain"]),
        strip_dup_spans=True,
    )
    rows = {r.doc_id: r.text for r in out.collect()}
    assert 1 not in rows                      # blocklisted domain
    assert "<EMAIL>" in rows[2]               # redacted
    assert 3 not in rows                      # decontaminated
    assert passage in rows[4]                 # keeper keeps the passage
    assert passage not in rows[5]             # dup span stripped
    assert 6 in rows


def test_mix_corpora_epochs_and_determinism(spark):
    from zeek_duckdb_spark.operators.pipeline import mix_corpora

    wiki = spark.createDataFrame([(i, f"w{i}") for i in range(100)],
                                 "doc_id long, text string")
    web = spark.createDataFrame([(i, f"c{i}") for i in range(1000)],
                                "doc_id long, text string")
    mixed = mix_corpora({"wiki": (wiki, 2.5), "web": (web, 0.3)}, seed=7)
    rows = mixed.collect()
    n_wiki = sum(1 for r in rows if r.source == "wiki")
    n_web = sum(1 for r in rows if r.source == "web")
    # 2 full epochs + ~half of a third; ~30% of one web epoch
    assert 230 <= n_wiki <= 270 and 250 <= n_web <= 350
    epochs = {r.epoch for r in rows if r.source == "wiki"}
    assert epochs == {0, 1, 2}
    # every wiki doc appears exactly twice in full epochs
    from collections import Counter

    full = Counter(r.doc_id for r in rows if r.source == "wiki" and r.epoch < 2)
    assert set(full.values()) == {2}
    # deterministic under reshuffling and re-run
    again = mix_corpora(
        {"wiki": (wiki.repartition(5), 2.5), "web": (web.repartition(3), 0.3)},
        seed=7,
    ).collect()
    key = lambda r: (r.source, r.epoch, r.doc_id, r.mix_key)  # noqa: E731
    assert sorted(map(key, rows)) == sorted(map(key, again))
    # mix_key interleaves sources (not blocked by source)
    first200 = [r.source for r in sorted(rows, key=lambda r: r.mix_key)[:200]]
    assert {"wiki", "web"} <= set(first200)
    with pytest.raises(ValueError, match="weight"):
        mix_corpora({"x": (wiki, 0.0)})
    with pytest.raises(ValueError, match="sources"):
        mix_corpora({})


def test_mix_corpora_fractional_samples_decorrelated_across_sources(spark):
    # the per-source fractional sample folds the SOURCE NAME into the
    # hash key.  The earlier crc32(name) % 1000 seed derivation let
    # names collide ('p' and 'ak' both hash to 457), and colliding
    # sources with overlapping id spaces made identical keep/drop
    # decisions — a silently biased mix
    from zeek_duckdb_spark.operators.pipeline import mix_corpora

    a = spark.createDataFrame([(i, f"a{i}") for i in range(1000)],
                              "doc_id long, text string")
    b = spark.createDataFrame([(i, f"b{i}") for i in range(1000)],
                              "doc_id long, text string")
    mixed = mix_corpora({"p": (a, 0.5), "ak": (b, 0.5)}, seed=7)
    rows = mixed.collect()
    kept_a = {r.doc_id for r in rows if r.source == "p"}
    kept_b = {r.doc_id for r in rows if r.source == "ak"}
    # independent ~50% samples overlap in ~25% of ids, not ~50%
    assert 400 <= len(kept_a) <= 600 and 400 <= len(kept_b) <= 600
    assert kept_a != kept_b
    overlap = len(kept_a & kept_b)
    assert 150 <= overlap <= 350, overlap


def test_pack_sequences_rejects_bad_token_counts(spark):
    from zeek_duckdb_spark.operators.pipeline import pack_sequences

    df = spark.createDataFrame(
        [(1, 100), (2, None), (3, 50)], "doc_id long, n_tokens long"
    )
    with pytest.raises(Exception, match="non-negative token count"):
        pack_sequences(df, seq_len=512).collect()
    df2 = spark.createDataFrame(
        [(1, 100), (2, -7)], "doc_id long, n_tokens long"
    )
    with pytest.raises(Exception, match="non-negative token count"):
        pack_sequences(df2, seq_len=512).collect()
    # zero is a legal count (empty doc occupies no tokens)
    ok = pack_sequences(
        spark.createDataFrame([(1, 0), (2, 10)], "doc_id long, n_tokens long"),
        seq_len=512,
    ).collect()
    assert len(ok) == 2


@pytest.mark.slow
def test_clean_corpus_near_dedup_removes_planted_near_dups(spark):
    # exact dedup misses boilerplate-perturbed copies; near_dedup must
    # catch them and keep the lowest id of each fuzzy cluster
    base = ("the quick brown fox jumps over the lazy dog while seventeen "
            "sailors watch from the harbour wall in the evening light")
    corpus = spark.createDataFrame(
        [
            (1, base),
            (2, base + " tonight"),                       # near-dup of 1
            (3, base.replace("evening", "morning")),      # near-dup of 1
            (4, "a completely different document about spark shuffle "
                "partitioning strategies and broadcast joins at scale"),
            (5, base),                                    # exact dup of 1
        ],
        "doc_id long, text string",
    )
    for strategy in ("minhash", "simhash"):
        out = clean_corpus(
            corpus, min_tokens=5, max_punct_ratio=0.5,
            near_dedup=strategy,
            near_params={"threshold": 0.6} if strategy == "minhash"
            else {"max_hamming": 6},
        )
        kept = sorted(r.doc_id for r in out.collect())
        assert kept == [1, 4], (strategy, kept)
    import pytest as _pt

    with _pt.raises(ValueError, match="near_dedup"):
        clean_corpus(corpus, near_dedup="nope").collect()


def test_clean_corpus_near_dedup_shuffle_budget(spark):
    # the fuzzy pass must stay one-shuffle-per-stage: candidate
    # banding, cluster propagation, and the final anti-join — no
    # corpus-sized collect, no cartesian product
    from zeek_duckdb_spark.plans import audit

    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = clean_corpus(d, near_dedup="minhash")
    plan = audit.physical_plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert out.count() > 0


# --- deterministic epoch shuffle --------------------------------------


def test_epoch_shuffle_reproducible_and_decorrelated(spark):
    from zeek_duckdb_spark.operators.pipeline import epoch_shuffle

    df = spark.range(500).select(F.col("id").alias("doc_id"))

    def order(epoch, seed=0):
        rows = epoch_shuffle(df, epoch, n_shards=8, seed=seed).collect()
        # replay order: shard-major, then rank within shard
        return [r.doc_id for r in rows]

    a, b = order(1), order(1)
    assert a == b                       # same epoch -> identical replay
    assert sorted(a) == list(range(500))  # a permutation, nothing lost
    c = order(2)
    assert a != c                       # epochs decorrelate
    # ranks are per-(key, epoch) hashes, so the PER-SHARD order is also
    # stable under cluster-size changes — check against a 1-shard run
    one = epoch_shuffle(df, 1, n_shards=1, seed=0).collect()
    by_rank = [r.doc_id for r in one]
    assert by_rank == sorted(by_rank, key=lambda d: dict(
        (r.doc_id, r.epoch_order) for r in one
    )[d])


def test_epoch_shuffle_plan_one_exchange_no_global_sort(spark):
    from zeek_duckdb_spark.operators.pipeline import epoch_shuffle
    from zeek_duckdb_spark.plans import audit

    df = spark.range(100).select(F.col("id").alias("doc_id"))
    out = epoch_shuffle(df, 3, n_shards=8)
    plan = audit.physical_plan(out)
    assert audit.num_shuffles(out) == 1      # the repartition only
    # local sorts only — a global order would show a range-partitioned
    # Sort (Exchange rangepartitioning)
    assert "rangepartitioning" not in plan.lower()


@pytest.mark.slow
def test_clean_corpus_near_keep_score_prefers_quality(spark):
    # the quality-aware keep policy retains the best-scoring cluster
    # member instead of the lowest id; the score rides in on the INPUT
    # frame and survives the pipeline's narrow projection
    base = ("the quick brown fox jumps over the lazy dog while seventeen "
            "sailors watch from the harbour wall in the evening light")
    corpus = spark.createDataFrame(
        [
            (1, base, 0.2),
            (2, base + " tonight", 0.9),                  # best of cluster
            (3, base.replace("evening", "morning"), 0.5),
            (4, "a completely different document about spark shuffle "
                "partitioning strategies and broadcast joins at scale", 0.1),
        ],
        "doc_id long, text string, clf_score double",
    )
    out = clean_corpus(
        corpus, min_tokens=5, max_punct_ratio=0.5,
        near_dedup="minhash", near_params={"threshold": 0.6},
        near_keep_score="clf_score",
    )
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [2, 4]
    # an in-pipeline quality feature works as the score too
    out2 = clean_corpus(
        corpus, min_tokens=5, max_punct_ratio=0.5,
        near_dedup="minhash", near_params={"threshold": 0.6},
        near_keep_score="q_tokens",
    )
    kept2 = sorted(r.doc_id for r in out2.collect())
    assert kept2 == [2, 4]  # doc 2 has one more token than 1/3


def test_corpus_profile_tracks_exact_statistics(spark):
    # sketches must land within their published error bounds of the
    # EXACT statistics, computed relationally on the same frame
    d = spark.read.parquet(f"{SF}/documents.parquet")
    from zeek_duckdb_spark.operators.pipeline import corpus_profile
    from zeek_duckdb_spark.operators.textops import fingerprint

    prof = corpus_profile(d).collect()[0]
    toks = F.size(F.filter(F.split(F.trim(F.col("text")), r"\s+"),
                           lambda x: x != F.lit("")))
    exact = d.select(
        F.count("*").alias("n"),
        F.sum(F.length("text")).alias("chars"),
        F.sum(toks).alias("tokens"),
        F.count_distinct(fingerprint(F.col("text"))).alias("distinct"),
        F.median(toks).alias("p50"),
    ).collect()[0]
    assert prof.n_docs == exact.n
    assert prof.total_chars == exact.chars
    assert prof.total_tokens == exact.tokens
    # HLL++ at rsd=0.05: allow 3 sigma
    assert abs(prof.approx_distinct_docs - exact.distinct) <= 0.15 * exact.distinct
    # GK at accuracy 10000 is exact at this size (rank error < 1 row)
    assert abs(prof.tokens_p50 - exact.p50) <= 1
    assert prof.tokens_p50 <= prof.tokens_p90 <= prof.tokens_p99
    dup = max(0.0, 1.0 - prof.approx_distinct_docs / prof.n_docs)
    assert prof.approx_exact_dup_ratio == pytest.approx(dup, abs=1e-6)


def test_corpus_profile_single_aggregate_scan(spark):
    # the whole profile must be ONE aggregate over one scan: a single
    # pair of HashAggregate/SortAggregate stages around one exchange,
    # no sort, no join
    from zeek_duckdb_spark.operators.pipeline import corpus_profile
    from zeek_duckdb_spark.plans import audit

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = audit.physical_plan(corpus_profile(d))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan and "Sort [" not in plan
    assert audit.num_shuffles(corpus_profile(d)) <= 1


def test_corpus_profile_quantile_column_naming(spark):
    # 0.57 must label p57 (int(0.57*100)=56 would mislabel) and
    # sub-percent quantiles must stay distinct columns, not three
    # duplicate 'tokens_p99's
    from zeek_duckdb_spark.operators.pipeline import corpus_profile

    d = spark.createDataFrame(
        [(i, "word " * (i + 1)) for i in range(20)], "doc_id long, text string"
    )
    prof = corpus_profile(d, quantiles=(0.57, 0.99, 0.995, 0.999))
    got = [c for c in prof.columns if c.startswith("tokens_p")]
    assert got == ["tokens_p57", "tokens_p99", "tokens_p99_5", "tokens_p99_9"]
    row = prof.collect()[0]
    assert row.tokens_p99 <= row.tokens_p99_5 <= row.tokens_p99_9


# --- document chunking --------------------------------------------------

def test_chunk_documents_matches_python_reference(spark):
    import random

    from zeek_duckdb_spark.operators.pipeline import chunk_documents

    rng = random.Random(4)
    docs = [
        (i, " ".join(f"w{j}" for j in range(rng.randrange(0, 40))))
        for i in range(60)
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.chunk_id, r.chunk_text, r.n_tokens)
        for r in chunk_documents(d, max_tokens=10, overlap=3).collect()
    )
    want = []
    for i, text in docs:
        toks = text.split()
        s = 0
        cid = 0
        # starts run to max(1, n - overlap): a start inside the last
        # chunk's overlap region would emit a fully-contained duplicate
        end = max(1, len(toks) - 3)
        while s < end and s < len(toks):
            w = toks[s : s + 10]
            want.append((i, cid, " ".join(w), len(w)))
            s += 7
            cid += 1
    assert got == sorted(want)


def test_chunk_documents_overlap_and_edges(spark):
    from zeek_duckdb_spark.operators.pipeline import chunk_documents

    d = spark.createDataFrame(
        [(1, "a b c d e"), (2, ""), (3, "x")], "doc_id long, text string"
    )
    out = chunk_documents(d, max_tokens=3, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    # the old trailing (2, "e") chunk was fully contained in "c d e"
    assert by_doc[1] == [(0, "a b c"), (1, "c d e")]
    assert 2 not in by_doc  # empty doc -> no chunks
    assert by_doc[3] == [(0, "x")]
    # consecutive chunks share exactly `overlap` tokens
    assert by_doc[1][0][1].split()[-1] == by_doc[1][1][1].split()[0]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(d, max_tokens=3, overlap=3)
    with _pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(d, max_tokens=0)


def test_chunk_documents_zero_shuffle_plan(spark):
    from zeek_duckdb_spark.operators.pipeline import chunk_documents
    from zeek_duckdb_spark.plans import audit

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = chunk_documents(d)
    assert audit.num_shuffles(out) == 0
    assert "Python" not in audit.physical_plan(out)


def test_rag_prep_composition_end_to_end(spark):
    # the full retrieval-prep story composed: clean -> chunk -> embed
    # (deterministic hash stub) -> PQ index -> compressed-domain top-k
    # retrieves the chunk that shares the query's vocabulary
    from pyspark.sql import functions as F

    from zeek_duckdb_spark.operators.pipeline import chunk_documents, clean_corpus
    from zeek_duckdb_spark.operators.pq import pq_encode, pq_topk, pq_train

    docs = [(1, "alpha beta " * 30), (2, "gamma delta " * 30),
            (3, "epsilon zeta " * 30), (4, "x")]  # 4 fails min_tokens
    d = spark.createDataFrame(docs, "doc_id long, text string")
    cleaned = clean_corpus(d, min_tokens=5, max_punct_ratio=1.0)
    chunks = chunk_documents(cleaned, max_tokens=16, overlap=4)
    chunks = chunks.withColumn(
        "cid", F.col("doc_id") * 1000 + F.col("chunk_id")
    )
    # deterministic bag-of-hashed-tokens embedding (dim 16): the md5
    # bucket fold every oracle-checked op uses — no ML libs needed
    dim = 16
    emb_expr = F.expr(
        "transform(sequence(0, %d), i -> CAST(aggregate("
        "split(chunk_text, ' '), 0L, (a, t) -> a + IF("
        "pmod(CAST(conv(substring(md5(t), 1, 7), 16, 10) AS BIGINT), %d) = i,"
        " 1L, 0L)) AS DOUBLE))" % (dim - 1, dim)
    )
    embedded = chunks.select("cid", "chunk_text", emb_expr.alias("embedding"))
    cb = pq_train(embedded, dim=dim, m=4, k=4, iters=2, id_col="cid")
    codes = pq_encode(embedded, cb, id_col="cid")
    # query = the same embedding of a gamma/delta probe text
    probe = spark.createDataFrame(
        [(0, "gamma delta gamma delta gamma delta gamma delta "
             "gamma delta gamma delta gamma delta gamma delta")],
        "cid long, chunk_text string",
    ).select(emb_expr.alias("e")).first().e
    top = pq_topk(codes, list(probe), cb, 3, id_col="cid").collect()
    # every retrieved chunk belongs to the gamma/delta document
    assert all(2000 <= r.cid < 3000 for r in top), [r.cid for r in top]


def test_chunk_documents_matches_duckdb(spark):
    import duckdb

    from zeek_duckdb_spark.operators.pipeline import chunk_documents

    sf = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf}/documents.parquet")
    got = sorted(
        (r.doc_id, r.chunk_id, r.chunk_text, r.n_tokens)
        for r in chunk_documents(d, max_tokens=12, overlap=4).collect()
    )
    want = duckdb.connect().execute(
        f"""
        WITH toked AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\\s+'),
                             t -> t != '') AS toks
          FROM read_parquet('{sf}/documents.parquet')
        ), starts AS (
          SELECT doc_id, toks, unnest(range(1, greatest(1, len(toks) - 4) + 1, 8)) AS s
          FROM toked WHERE len(toks) > 0
        )
        SELECT doc_id,
               CAST((s - 1) / 8 AS INT) AS chunk_id,
               array_to_string(toks[s : s + 11], ' ') AS chunk_text,
               least(12, len(toks) - s + 1) AS n_tokens
        FROM starts ORDER BY doc_id, chunk_id
        """
    ).fetchall()
    assert got == sorted((a, int(b), c, int(d_)) for a, b, c, d_ in want)


@pytest.mark.slow
def test_clean_media_corpus_e2e(spark):
    """Media-side cleaning composition: size gate -> exact byte dedup
    (min id wins) -> pHash near-dedup with the keep-best policy — a
    planted re-encode-style near-dup cluster collapses to its highest
    scoring member; byte-identical copies die regardless of score."""
    import numpy as np

    from zeek_duckdb_spark.operators.pipeline import clean_media_corpus

    rng = np.random.default_rng(21)
    base = rng.integers(0, 256, 1024, dtype=np.uint8)
    near = base.copy()
    # re-encode-style noise at a measured hamming distance of 2 (noise
    # any milder hashes IDENTICALLY — pHash is that robust), so the
    # max_hamming=6 and max_hamming=0 passes below differ
    near[::23] = (near[::23] + 11) % 256
    other = rng.integers(0, 256, 1024, dtype=np.uint8)
    rows = [
        (0, bytearray(base.tobytes()), 1.0),
        (1, bytearray(near.tobytes()), 5.0),   # best of the {0,1} cluster
        (2, bytearray(other.tobytes()), 1.0),
        (3, bytearray(base.tobytes()), 9.0),   # exact copy of 0 -> exact pass
        (4, bytearray(b""), 1.0),              # size gate
        (5, None, 1.0),                        # size gate
    ]
    d = spark.createDataFrame(rows, "doc_id long, media binary, score double")

    kept_best = clean_media_corpus(
        d, fake=True, max_hamming=6, keep_score="score"
    )
    assert kept_best.columns == ["doc_id", "media", "score"]
    assert {r.doc_id for r in kept_best.collect()} == {1, 2}

    kept_min = clean_media_corpus(d, fake=True, max_hamming=6)
    assert {r.doc_id for r in kept_min.collect()} == {0, 2}

    # hamming-2 pair is out of reach at max_hamming=0 -> only the
    # gates + exact dedup fire
    kept_strict = clean_media_corpus(d, fake=True, max_hamming=0)
    assert {r.doc_id for r in kept_strict.collect()} == {0, 1, 2}


def test_clean_corpus_perplexity_gate(spark):
    """lm= + max/min_perplexity gates documents between the surface-
    quality filter and dedup: high-perplexity OOV soup dies, in-domain
    docs survive, the Gopher-style band also drops degenerate
    repetition, and validation is loud."""
    import pytest as _pytest

    from zeek_duckdb_spark.operators.lm import ngram_lm_fit
    from zeek_duckdb_spark.operators.pipeline import clean_corpus

    # 'buy now' spam repetition is IN the training crawl (as it is in
    # any real one), so the degenerate doc below is a high-probability
    # loop of seen bigrams — the low-perplexity failure mode the
    # Gopher-style band exists to drop
    train = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox likes the lazy dog",
        "a lazy dog sleeps while the quick brown fox jumps",
        "buy now buy now buy now buy now",
    ] * 3
    lm = ngram_lm_fit(
        spark.createDataFrame([(t,) for t in train], "text string"), n=2
    )
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "zzqx wvvk pqzj xxo9 qqv7 zk3m wopq 9qxz vvkk zzzz"),
        (2, "buy now buy now buy now buy now buy now"),  # degenerate loop
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    kept = clean_corpus(d, min_tokens=5, lm=lm, max_perplexity=10.0)
    assert {r.doc_id for r in kept.collect()} == {0, 2}

    banded = clean_corpus(
        d, min_tokens=5, lm=lm, max_perplexity=10.0, min_perplexity=1.3
    )
    assert {r.doc_id for r in banded.collect()} == {0}

    with _pytest.raises(ValueError, match="need lm="):
        clean_corpus(d, max_perplexity=10.0)
    with _pytest.raises(ValueError, match="max_perplexity"):
        clean_corpus(d, lm=lm)


def test_clean_corpus_normalize_stage(spark):
    """normalize_form= runs first: a decomposed-unicode copy of a
    composed doc becomes byte-identical and dies in the EXACT pass
    (without the stage both survive — visually identical, different
    bytes)."""
    from zeek_duckdb_spark.operators.pipeline import clean_corpus

    composed = "café menu items with plenty of ordinary tokens listed"
    decomposed = "café menu items with plenty of ordinary tokens listed"
    d = spark.createDataFrame(
        [(1, composed), (2, decomposed)], "doc_id long, text string"
    )
    plain = {r.doc_id for r in clean_corpus(d, min_tokens=3).collect()}
    assert plain == {1, 2}  # different bytes -> both survive
    norm = {r.doc_id for r in clean_corpus(d, min_tokens=3, normalize_form="NFC").collect()}
    assert norm == {1}      # canonicalized -> exact dup, min id wins


def test_balance_clusters_mega_cell_fraction_clamped():
    """A cell where budget/n falls under the sampler's 1e-6 bucket
    resolution must clamp to 1e-6 (keeping ~n*1e-6 rows), not truncate
    to fraction 0 and silently drop the whole cell — the web-scale
    regime (200M-row boilerplate cluster, budget 100) the operator's
    docstring targets."""
    from zeek_duckdb_spark.operators.pipeline import _cell_fractions

    f = _cell_fractions({0: 200_000_000, 1: 50, -1: 7}, budget=100.0)
    assert f[0] == 1e-6          # clamped, not 5e-7 -> int 0
    assert f[1] == 1.0           # small cell keeps everything
    assert -1 not in f           # degenerate cell handled by caller
    # and the clamp round-trips through the sampler's integer
    # threshold: int(1e-6 * 1_000_000) == 1 keeps bucket 0
    assert int(f[0] * 1_000_000) == 1


def test_balance_clusters_downsamples_fat_topics(spark):
    """Three planted embedding clusters (600/300/60 rows): balancing to
    100 rows/cell leaves the small cluster intact, cuts the fat ones to
    ~100 (binomial noise), keeps degenerate zero vectors, is
    deterministic, and validates its knobs."""
    import numpy as np

    from zeek_duckdb_spark.operators.kmeans import kmeans_fit_quantized
    from zeek_duckdb_spark.operators.pipeline import balance_clusters

    rng = np.random.default_rng(3)
    centers = [np.zeros(16), np.zeros(16), np.zeros(16)]
    centers[0][0] = 10.0
    centers[1][5] = 10.0
    centers[2][11] = 10.0
    rows = []
    vid = 0
    for ci, n in [(0, 600), (1, 300), (2, 60)]:
        for _ in range(n):
            v = centers[ci] + rng.normal(0, 0.3, 16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    rows.append((vid, [0.0] * 16))  # degenerate
    d = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = kmeans_fit_quantized(d, k=3, iters=2)
    out = balance_clusters(d, cents, target_rows_per_cell=100, seed=1)
    got = out.collect()
    by_cell = {}
    for r in got:
        by_cell.setdefault(r.cell, []).append(r.vec_id)
    assert set(out.columns) == {"vec_id", "embedding", "cell"}
    assert vid in {i for ids in by_cell.values() for i in ids}  # zero kept
    assert -1 in by_cell and by_cell[-1] == [vid]
    sizes = sorted(len(v) for c, v in by_cell.items() if c >= 0)
    assert sizes[0] == 60                      # small topic untouched
    for s_ in sizes[1:]:
        assert 55 <= s_ <= 145                 # ~100 +- binomial noise
    # deterministic
    again = {r.vec_id for r in balance_clusters(d, cents, target_rows_per_cell=100, seed=1).collect()}
    assert again == {r.vec_id for r in got}
    # share knob: cap at 40% of total
    capped = balance_clusters(d, cents, max_cell_share=0.4, seed=1)
    n_total = len(rows)
    cc = {}
    for r in capped.collect():
        cc[r.cell] = cc.get(r.cell, 0) + 1
    for c, n in cc.items():
        if c >= 0:
            assert n <= 0.4 * n_total * 1.25
    import pytest as _pytest
    with _pytest.raises(ValueError, match="exactly one"):
        balance_clusters(d, cents)
    with _pytest.raises(ValueError, match="max_cell_share"):
        balance_clusters(d, cents, max_cell_share=1.5)


def test_temperature_weights_rule(spark):
    """T=1 keeps natural proportions (all weights 1 at the default
    budget); large T flattens toward uniform; weights compose with
    mix_corpora to hit the budget in expectation."""
    import math

    from zeek_duckdb_spark.operators.pipeline import (
        mix_corpora,
        temperature_weights,
    )

    sizes = {"wiki": 1_000, "web": 99_000}
    w1 = temperature_weights(sizes, temperature=1.0)
    assert w1 == {"wiki": 1.0, "web": 1.0}

    w5 = temperature_weights(sizes, temperature=5.0)
    # p ∝ n^(1/5): wiki gets a far larger share than its natural 1%
    p_wiki = sizes["wiki"] ** 0.2 / (sizes["wiki"] ** 0.2 + sizes["web"] ** 0.2)
    assert w5["wiki"] == pytest.approx(100_000 * p_wiki / 1_000)
    assert w5["wiki"] > 25          # small source repeated many times
    assert w5["web"] < 1.0          # big source subsampled
    # budget conservation: sum of weight_s * n_s == budget
    assert sum(w5[s] * n for s, n in sizes.items()) == pytest.approx(100_000)

    huge_t = temperature_weights(sizes, temperature=1e9)
    assert huge_t["wiki"] * sizes["wiki"] == pytest.approx(
        huge_t["web"] * sizes["web"], rel=1e-3
    )  # uniform split of the budget

    # composition: mixed row counts land near the temperature targets
    wiki = spark.range(100).select(F.col("id").alias("doc_id"))
    web = spark.range(100, 1000).select(F.col("id").alias("doc_id"))
    w = temperature_weights({"wiki": 100, "web": 900}, temperature=3.0)
    mixed = mix_corpora({"wiki": (wiki, w["wiki"]), "web": (web, w["web"])})
    got = {r.source: r.n for r in
           mixed.groupBy("source").agg(F.count("*").alias("n")).collect()}
    want_wiki = w["wiki"] * 100
    want_web = w["web"] * 900
    assert abs(got["wiki"] - want_wiki) < 3 * math.sqrt(want_wiki) + 2
    assert abs(got["web"] - want_web) < 3 * math.sqrt(want_web) + 2

    with pytest.raises(ValueError, match="temperature"):
        temperature_weights(sizes, temperature=0)
    with pytest.raises(ValueError, match="size for"):
        temperature_weights({"x": 0}, temperature=2)


def test_cap_per_group_exact_deterministic(spark):
    from zeek_duckdb_spark.operators.pipeline import cap_per_group

    rows = [(i, f"dom{i % 3}") for i in range(100)] + [(1000, "rare")]
    d = spark.createDataFrame(rows, "doc_id long, domain string")
    capped = cap_per_group(d, "domain", k=10)
    got = capped.collect()
    by_dom = {}
    for r in got:
        by_dom.setdefault(r.domain, set()).add(r.doc_id)
    assert all(len(v) == 10 for k_, v in by_dom.items() if k_ != "rare")
    assert by_dom["rare"] == {1000}          # under-cap group intact
    # deterministic across partitionings
    again = {(r.doc_id, r.domain) for r in
             cap_per_group(d.repartition(7), "domain", k=10).collect()}
    assert again == {(r.doc_id, r.domain) for r in got}
    # a different seed keeps a different (same-sized) subset
    other = {(r.doc_id, r.domain) for r in
             cap_per_group(d, "domain", k=10, seed=5).collect()}
    assert len(other) == len(again) and other != again
    import pytest as _pytest
    with _pytest.raises(ValueError, match="k must be"):
        cap_per_group(d, "domain", k=0)


@pytest.mark.slow
def test_incremental_clean_ingest_two_days(spark, tmp_path):
    """The packaged daily-crawl loop: bootstrap day 0, ingest day 1
    against the persisted indexes, index-always-wins transitivity
    (a new->new->index chain dies entirely), dry-run writes nothing,
    and day 2 is guarded by day 1's survivors."""
    from zeek_duckdb_spark.operators.pipeline import incremental_clean_ingest

    fps = str(tmp_path / "fps")
    sigs = str(tmp_path / "sigs")
    base = ("the quick brown fox jumps over the lazy dog and then "
            "wanders across the wide green field toward the river")
    # day 0: genuinely distinct documents (shared-template docs would
    # near-dup EACH OTHER and the bootstrap would rightly thin them)
    day0 = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(25))) for i in range(5)]
        + [(5, f"{base} chapter five")],
        "doc_id long, text string",
    )
    out0 = incremental_clean_ingest(day0, fps, sigs)
    assert {r.doc_id for r in out0.collect()} == set(range(6))  # bootstrap

    near5 = f"{base} chapter five".replace("river", "ocean")
    chain = near5.replace("wide", "vast")   # reaches doc 5 through 101
    day1 = spark.createDataFrame(
        [
            (100, f"{base} chapter five"),  # exact dup of indexed 5
            (101, near5),                   # near dup of indexed 5
            (102, chain),                   # chained to the index via 101
            (103, "completely novel content " + "alpha beta gamma " * 6),
            (104, "completely novel content " + "alpha beta gamma " * 5 + "alpha beta delta"),
        ],
        "doc_id long, text string",
    )
    # dry run leaves indexes untouched
    before = spark.read.parquet(fps).count()
    dry = incremental_clean_ingest(day1, fps, sigs, threshold=0.5, update_index=False)
    dry_ids = {r.doc_id for r in dry.collect()}
    assert spark.read.parquet(fps).count() == before

    out1 = incremental_clean_ingest(day1, fps, sigs, threshold=0.5)
    got = {r.doc_id for r in out1.collect()}
    assert got == dry_ids
    assert 100 not in got          # exact pass
    assert 101 not in got          # index near-dup
    assert 102 not in got          # transitive chain to the index
    assert 103 in got and 104 not in got  # pure-new cluster: min id wins

    day2 = spark.createDataFrame(
        [(200, "completely novel content " + "alpha beta gamma " * 6)],
        "doc_id long, text string",
    )
    out2 = incremental_clean_ingest(day2, fps, sigs, threshold=0.5)
    assert out2.count() == 0       # day-1 survivor guards the index


@pytest.mark.slow
def test_incremental_clean_ingest_dry_run_is_stable_and_ids_checked(spark, tmp_path):
    """Review regressions: a dry-run's verdicts are snapshotted (a
    later real ingest can't change the frame already held), and id
    collisions with the signature index raise loudly."""
    from zeek_duckdb_spark.operators.pipeline import incremental_clean_ingest

    fps, sigs = str(tmp_path / "fps"), str(tmp_path / "sigs")
    day0 = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(25))) for i in range(3)],
        "doc_id long, text string",
    )
    incremental_clean_ingest(day0, fps, sigs)

    day1 = spark.createDataFrame(
        [(10, "a novel doc " + "alpha beta gamma " * 5)],
        "doc_id long, text string",
    )
    dry = incremental_clean_ingest(day1, fps, sigs, update_index=False)
    incremental_clean_ingest(day1, fps, sigs)          # real ingest
    # the held dry frame still shows the pre-ingest verdict
    assert {r.doc_id for r in dry.collect()} == {10}

    # rerunning the same ids now collides with the signature index
    import pytest as _pytest
    with _pytest.raises(ValueError, match="globally unique"):
        incremental_clean_ingest(day1, fps, sigs)
    # ...unless explicitly acknowledged as a rerun
    rerun = incremental_clean_ingest(day1, fps, sigs, check_ids=False)
    assert rerun.count() == 0  # fp already indexed -> exact pass drops


@pytest.mark.slow
def test_incremental_clean_ingest_auto_compaction(spark, tmp_path):
    """Round-12 maintenance cadence: ``compact_after`` compacts the
    fp/sig indexes MID-LOOP when a directory exceeds the threshold.
    Two arms run the same two-day ingest — with and without
    compaction — and must agree on every survivor set and on the
    final index CONTENT (compaction is content-preserving; appends
    stay exactly-once), while the compacted arm's index file count
    drops to the compaction floor instead of growing per day."""
    import os

    from zeek_duckdb_spark.operators.pipeline import incremental_clean_ingest

    def _nfiles(p):
        return sum(
            1 for r, _d, ns in os.walk(p) for n in ns
            if n.endswith(".parquet") and not n.startswith(".")
        )

    def _day(ids):
        return spark.createDataFrame(
            [(i, " ".join(f"w{i}x{j}" for j in range(25))) for i in ids],
            "doc_id long, text string",
        )

    results = {}
    for arm, kw in (("plain", {}), ("compact", {"compact_after": 1})):
        fps = str(tmp_path / f"fps_{arm}")
        sigs = str(tmp_path / f"sigs_{arm}")
        out0 = {r.doc_id for r in incremental_clean_ingest(
            _day(range(4)), fps, sigs, **kw).collect()}
        out1 = {r.doc_id for r in incremental_clean_ingest(
            _day(range(10, 14)), fps, sigs, **kw).collect()}
        # day 2 replays a day-0 doc id-rekeyed: the index (compacted
        # or not) must still drop it via the exact-fp pass
        out2 = {r.doc_id for r in incremental_clean_ingest(
            _day([0]).withColumn("doc_id", F.lit(200).cast("long")),
            fps, sigs, **kw).collect()}
        results[arm] = {
            "out": (out0, out1, out2),
            "fps_rows": sorted(r.fp for r in spark.read.parquet(fps).collect()),
            "sig_ids": sorted(
                r.doc_id for r in spark.read.parquet(sigs).collect()
            ),
            "files": (_nfiles(fps), _nfiles(sigs)),
        }

    # identical verdicts and identical index content across arms —
    # compaction changed the LAYOUT only, appends stayed exactly-once
    assert results["plain"]["out"] == results["compact"]["out"]
    assert results["plain"]["out"][0] == set(range(4))
    assert results["plain"]["out"][2] == set()          # fp pass holds
    assert results["plain"]["fps_rows"] == results["compact"]["fps_rows"]
    assert results["plain"]["sig_ids"] == results["compact"]["sig_ids"]
    # the compacted arm sits at the floor (tiny data -> 1 file per
    # index), the plain arm accumulated per-day appends
    assert results["compact"]["files"] == (1, 1)
    assert results["plain"]["files"][0] > 1
    assert results["plain"]["files"][1] > 1


def test_maybe_compact_landing_threshold_semantics(spark, tmp_path):
    """The trigger itself: missing path and under-threshold layouts
    are no-ops (None, zero jobs), over-threshold compacts and returns
    the stats dict, bad threshold raises."""
    import pytest as _pytest

    from zeek_duckdb_spark.sources.sink import maybe_compact_landing

    with _pytest.raises(ValueError, match="max_files_per_dir"):
        maybe_compact_landing(spark, str(tmp_path / "x"), 0)
    assert maybe_compact_landing(spark, str(tmp_path / "missing"), 3) is None

    land = str(tmp_path / "land")
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    df.repartition(2).write.mode("append").parquet(land)
    assert maybe_compact_landing(spark, land, 3) is None  # 2 <= 3
    df.repartition(4).write.mode("append").parquet(land)
    stats = maybe_compact_landing(spark, land, 3)          # 6 > 3
    assert stats is not None and stats["files_after"] == 1
    # content preserved, rows doubled by the two appends
    assert spark.read.parquet(land).count() == 200


# ---------------------------------------------------------------------
# weighted_sample_k (Efraimidis-Spirakis A-ES)
# ---------------------------------------------------------------------


def _ws_corpus(spark):
    rows = [(f"doc{i}", 1) for i in range(200)] + [("heavy", 500)]
    return spark.createDataFrame(rows, "key string, w int")


def test_weighted_sample_k_matches_duckdb(spark):
    import duckdb

    from zeek_duckdb_spark.operators.hashutil import md5_long_sql
    from zeek_duckdb_spark.operators.pipeline import weighted_sample_k

    df = _ws_corpus(spark)
    got = [
        (r.key, r.w)
        for r in weighted_sample_k(df, "key", "w", k=20, seed=3).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (key VARCHAR, w INT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(r.key, r.w) for r in df.collect()]
    )
    u = (
        "(("
        + md5_long_sql("concat_ws(':', key, 'ws3')", 13)
        + " + 1) / 4503599627370496.0)"
    )
    want = con.sql(
        f"SELECT key, w FROM t WHERE w > 0 "
        f"ORDER BY ROUND(ln({u}), 9) / w DESC, key ASC LIMIT 20"
    ).fetchall()
    # both sides ordered by the same deterministic score
    assert got == [(k, int(w)) for k, w in want]


@pytest.mark.slow
def test_weighted_sample_k_favors_heavy_and_is_deterministic(spark):
    from zeek_duckdb_spark.operators.pipeline import weighted_sample_k

    df = _ws_corpus(spark)
    hits = 0
    for seed in range(20):
        keys = {
            r.key for r in weighted_sample_k(df, "key", "w", 10, seed).collect()
        }
        hits += "heavy" in keys
    # heavy carries 500/700 of the total weight: inclusion in a
    # 10-of-201 sample is near-certain (P_miss < 1e-8 per seed)
    assert hits == 20
    a = [r.key for r in weighted_sample_k(df, "key", "w", 15, 1).collect()]
    b = [
        r.key
        for r in weighted_sample_k(df.repartition(13), "key", "w", 15, 1).collect()
    ]
    assert a == b


def test_weighted_sample_k_grouped_matches_duckdb(spark):
    """Per-group exact-k: the same A-ES score restated as a DuckDB
    QUALIFY row_number window — full-value oracle over a 3-source
    corpus, including a group smaller than its k."""
    import duckdb

    from zeek_duckdb_spark.operators.hashutil import md5_long_sql
    from zeek_duckdb_spark.operators.pipeline import weighted_sample_k_grouped

    rows = (
        [("web", f"w{i:03d}", (i % 7) + 1) for i in range(60)]
        + [("wiki", f"k{i:03d}", (i % 5) + 1) for i in range(40)]
        + [("code", f"c{i}", 10) for i in range(3)]  # fewer than k=5
    )
    df = spark.createDataFrame(rows, "src string, key string, w int")
    got = {
        (r.src, r.key)
        for r in weighted_sample_k_grouped(
            df, "src", "key", "w", k=5, seed=2
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (src VARCHAR, key VARCHAR, w INT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    u = (
        "(("
        + md5_long_sql("concat_ws(':', key, 'ws2')", 13)
        + " + 1) / 4503599627370496.0)"
    )
    want = {
        tuple(r)
        for r in con.sql(
            f"SELECT src, key FROM t WHERE w > 0 QUALIFY row_number() "
            f"OVER (PARTITION BY src ORDER BY ROUND(ln({u}), 9) / w DESC, "
            f"key ASC) <= 5"
        ).fetchall()
    }
    assert got == want
    assert sum(1 for s, _ in got if s == "code") == 3  # short group: all


def test_weighted_sample_k_grouped_dict_budgets_and_guards(spark):
    """Dict budgets deliver EXACTLY k_s per source (the
    temperature_weights composition) and groups absent from the dict
    drop; guards reject bad budgets."""
    import pytest as _pytest

    from zeek_duckdb_spark.operators.pipeline import (
        temperature_weights,
        weighted_sample_k_grouped,
    )

    rows = [
        ("web", f"w{i:03d}", 1 + (i % 9)) for i in range(90)
    ] + [("wiki", f"k{i:03d}", 1 + (i % 9)) for i in range(30)]
    df = spark.createDataFrame(rows, "src string, key string, w int")
    # temperature-flattened budgets over the source sizes -> exact k_s
    # (temperature_weights returns epochs = target_s / n_s; per-group
    # row budgets are target_s = weight_s * n_s)
    sizes = {"web": 90, "wiki": 30}
    tw = temperature_weights(sizes, temperature=2.0, budget_rows=40)
    ks = {s: max(1, round(w * sizes[s])) for s, w in tw.items()}
    out = weighted_sample_k_grouped(df, "src", "key", "w", k=ks, seed=1)
    by_src = {
        r.src: r.n
        for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert by_src == ks
    # a group missing from the dict is dropped
    only_web = weighted_sample_k_grouped(df, "src", "key", "w", k={"web": 4})
    assert {r.src for r in only_web.collect()} == {"web"}
    with _pytest.raises(ValueError, match="k must be >= 1"):
        weighted_sample_k_grouped(df, "src", "key", "w", k=0)
    with _pytest.raises(ValueError, match="every k must be >= 1"):
        weighted_sample_k_grouped(df, "src", "key", "w", k={"web": 0})
    with _pytest.raises(ValueError, match="k dict is empty"):
        weighted_sample_k_grouped(df, "src", "key", "w", k={})


def test_weighted_sample_k_heavy_weight_regime(spark):
    """The log-form score must not collapse to ties for token-count
    scale weights (w ~ 1e9) or underflow for fractional weights —
    exactly the regimes the naive rounded u^(1/w) form lost (the pow
    form rounds every heavy row to 1.000000000 and the key tie-break
    then deterministically favors low keys)."""
    from zeek_duckdb_spark.operators.pipeline import weighted_sample_k

    # 100 heavy rows, all weights within 2x of 2e9: the pow form would
    # tie them all at 1.0 and pick the lexicographically smallest keys.
    rows = [(f"k{i:03d}", 2_000_000_000 + i * 10_000_000) for i in range(100)]
    df = spark.createDataFrame(rows, "key string, w long")
    picked = [
        r.key for r in weighted_sample_k(df, "key", "w", 10, seed=7).collect()
    ]
    assert picked != sorted(picked)  # not the degenerate low-key prefix
    # fractional weights: u^(1/w) underflows to 0 for w ~ 1e-9 and ties;
    # the log form keeps finite distinct scores.
    tiny = spark.createDataFrame(
        [(f"t{i:02d}", (i + 1) * 1e-9) for i in range(50)],
        "key string, w double",
    )
    got = [r.key for r in weighted_sample_k(tiny, "key", "w", 8, 1).collect()]
    assert len(set(got)) == 8 and got != sorted(got)


def test_weighted_sample_k_guards_and_plan(spark):
    import pytest as _pytest

    from zeek_duckdb_spark.operators.pipeline import weighted_sample_k

    df = spark.createDataFrame(
        [("a", 5), ("b", 0), ("c", -2), ("d", None)],
        "key string, w int",
    )
    kept = {r.key for r in weighted_sample_k(df, "key", "w", 10).collect()}
    assert kept == {"a"}  # zero/negative/NULL weights never win
    with _pytest.raises(ValueError, match="k must"):
        weighted_sample_k(df, "key", "w", 0)
    plan = (
        weighted_sample_k(_ws_corpus(spark), "key", "w", 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # global top-k, never a corpus sort: per-partition heaps + k-row merge
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------
# split_corpus (deterministic train/val/test labeling)
# ---------------------------------------------------------------------


def test_split_corpus_matches_duckdb_and_is_exhaustive(spark):
    import duckdb

    from zeek_duckdb_spark.operators.hashutil import md5_long_sql
    from zeek_duckdb_spark.operators.pipeline import split_corpus

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(2000)], "doc_id long, text string"
    )
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = split_corpus(df, "doc_id", fr, seed=4)
    got = {r.doc_id: r.split for r in out.collect()}
    assert len(got) == 2000  # exhaustive labeling, no drops
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT range AS doc_id FROM range(2000)")
    b = md5_long_sql("concat_ws(':', CAST(doc_id AS VARCHAR), '4')") + " % 1000000"
    want = {
        i: s
        for i, s in con.sql(
            f"SELECT doc_id, CASE WHEN {b} < 800000 THEN 'train' "
            f"WHEN {b} < 900000 THEN 'val' ELSE 'test' END FROM t"
        ).fetchall()
    }
    assert got == want
    # fractions honored within sampling noise at n=2000
    from collections import Counter

    c = Counter(got.values())
    assert abs(c["train"] / 2000 - 0.8) < 0.05
    # deterministic across partitionings
    again = {
        r.doc_id: r.split
        for r in split_corpus(df.repartition(13), "doc_id", fr, 4).collect()
    }
    assert again == got


def test_split_corpus_group_keyed_no_leakage_and_guards(spark):
    import pytest as _pytest

    from zeek_duckdb_spark.operators.pipeline import split_corpus

    # rows keyed by DOMAIN: every row of a domain must share a split
    rows = [(i, f"domain{i % 37}.example") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    out = split_corpus(df, "domain", {"train": 0.7, "test": 0.3})
    per_domain = (
        out.groupBy("domain")
        .agg(F.count_distinct("split").alias("n"))
        .collect()
    )
    assert all(r.n == 1 for r in per_domain)
    with _pytest.raises(ValueError, match="fractions is empty"):
        split_corpus(df, "domain", {})
    with _pytest.raises(ValueError, match="must be in"):
        split_corpus(df, "domain", {"a": 0.0, "b": 1.0})
    with _pytest.raises(ValueError, match="sum to 1"):
        split_corpus(df, "domain", {"a": 0.5, "b": 0.3})
    # zero-shuffle labeling
    from zeek_duckdb_spark.plans import audit

    assert audit.num_shuffles(
        split_corpus(df, "domain", {"train": 0.7, "test": 0.3})
    ) == 0


def test_clean_corpus_compression_band(spark):
    """compression_band gates boilerplate (ratio << lo) and
    high-entropy junk (> hi) while prose passes; stage order keeps it
    after the surface filter."""
    import random as _random

    from zeek_duckdb_spark.operators.pipeline import clean_corpus

    rng = _random.Random(3)
    words = ["model", "signal", "filter", "corpus", "quality", "text",
             "the", "of", "tokens", "entropy", "natural", "prose"]
    prose = " ".join(rng.choice(words) for _ in range(120))
    spam = "win free coins now " * 40
    alnum = "abcdefghijklmnopqrstuvwxyz0123456789"
    junk = " ".join(
        "".join(rng.choice(alnum) for _ in range(12)) for _ in range(60)
    )
    df = spark.createDataFrame(
        [(1, prose), (2, spam), (3, junk)], "doc_id long, text string"
    )
    out = clean_corpus(df, min_tokens=3, max_punct_ratio=0.5,
                       compression_band=(0.15, 0.6))
    assert {r.doc_id for r in out.collect()} == {1}
    # the gate column does not leak into the output schema
    assert "zlib_ratio" not in out.columns
    import pytest as _pytest

    with _pytest.raises(ValueError, match="compression_band"):
        clean_corpus(df, compression_band=(0.9, 0.2))


def test_pack_sequences_duplicate_ids_rows_frame(spark):
    """Review-fix regression: duplicate ids within a shard must lay
    out head-to-tail (ROWS frame), not both receive the RANGE-peer
    sum (overlapping offsets)."""
    from zeek_duckdb_spark.operators.pipeline import pack_sequences

    df = spark.createDataFrame(
        [(7, 10), (7, 20), (9, 5)], "doc_id long, n_tokens long"
    )
    out = pack_sequences(df, seq_len=512, n_shards=1).collect()
    starts = sorted(
        (r.seq_offset + r.seq_id * 512, r.n_tokens) for r in out
    )
    # three rows occupy [0,10), [10,30), [30,35) in SOME order of the
    # duplicate pair — no overlap, total span == sum of tokens
    assert [s for s, _ in starts] == [0, 10, 30]


def test_chunk_documents_no_fully_contained_trailing_chunk(spark):
    """Review-fix regression: a doc whose tail start falls inside the
    previous chunk's overlap region must NOT emit a fully-contained
    duplicate chunk; token coverage is preserved."""
    from zeek_duckdb_spark.operators.pipeline import chunk_documents

    text = " ".join(f"t{i}" for i in range(226))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(df, max_tokens=256, overlap=32).collect()
    assert len(rows) == 1  # chunk 0 covers all 226 tokens
    assert rows[0].n_tokens == 226
    # a genuinely long doc still strides with overlap and loses nothing
    text2 = " ".join(f"t{i}" for i in range(500))
    df2 = spark.createDataFrame([(1, text2)], "doc_id long, text string")
    rows2 = sorted(
        chunk_documents(df2, max_tokens=256, overlap=32).collect(),
        key=lambda r: r.chunk_id,
    )
    covered = set()
    for r in rows2:
        start = r.chunk_id * (256 - 32)
        covered |= set(range(start, start + r.n_tokens))
    assert covered == set(range(500))
    # and no chunk is contained in another
    spans = [
        (r.chunk_id * 224, r.chunk_id * 224 + r.n_tokens) for r in rows2
    ]
    for i, (s1, e1) in enumerate(spans):
        for j, (s2, e2) in enumerate(spans):
            if i != j:
                assert not (s2 <= s1 and e1 <= e2)


@pytest.mark.slow
def test_incremental_clean_ingest_recovers_crashed_compaction(spark, tmp_path):
    """A compaction killed inside its rename-pair fallback window
    leaves the index path MISSING with the data stranded in the
    .compact-* siblings — before the round-12 fix the next ingest read
    mapped that to the empty-index bootstrap and silently re-admitted
    the whole corpus.  The read now repairs the state first."""
    from zeek_duckdb_spark.operators.pipeline import incremental_clean_ingest

    fps = str(tmp_path / "fps")
    sigs = str(tmp_path / "sigs")
    day0 = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(25))) for i in range(4)],
        "doc_id long, text string",
    )
    assert incremental_clean_ingest(day0, fps, sigs).count() == 4

    # simulate the crash window on BOTH indexes: fps mid-fallback with
    # the compacted rewrite complete, sigs with only the old layout
    os.rename(fps, fps + ".compact-old")
    spark.read.parquet(fps + ".compact-old").repartition(1).write.parquet(
        fps + ".compact-tmp"
    )
    os.rename(sigs, sigs + ".compact-old")

    day1 = spark.createDataFrame(
        [
            (100, " ".join(f"w0x{j}" for j in range(25))),  # dup of day-0 id 0
            (101, "genuinely novel text " + "epsilon zeta " * 8),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id for r in incremental_clean_ingest(
        day1, fps, sigs, threshold=0.5
    ).collect()}
    # the duplicate still dies against the RECOVERED index — an empty
    # bootstrap would have admitted both
    assert got == {101}
    assert not os.path.exists(fps + ".compact-old")
    assert not os.path.exists(fps + ".compact-tmp")
