"""N-gram LM perplexity scoring: hand-computed parity, DuckDB
differential on the sf table, discrimination (in-domain text scores
lower than OOV garbage), validation."""

import math

import duckdb
import pytest

from pyspark.sql import functions as F

from zeek_duckdb_spark.operators.lm import ngram_lm_fit, perplexity_scores

SF = "/root/testdata/sf0.001"


def _py_lm(train_texts, n=2, alpha=0.1):
    """Independent reference implementation of the model semantics."""
    grams: dict = {}
    vocab = set()
    for t in train_texts:
        toks = t.strip().lower().split()
        vocab.update(toks)
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i : i + n])
            grams[g] = grams.get(g, 0) + 1
    ctxs: dict = {}
    for g, c in grams.items():
        ctx = " ".join(g.split(" ")[: n - 1])
        ctxs[ctx] = ctxs.get(ctx, 0) + c
    return grams, ctxs, len(vocab)


def _py_score(text, grams, ctxs, v, n=2, alpha=0.1):
    toks = text.strip().lower().split()
    lps = []
    for i in range(len(toks) - n + 1):
        g = " ".join(toks[i : i + n])
        ctx = " ".join(toks[i : i + n - 1])
        lps.append(
            math.log((grams.get(g, 0) + alpha) / (ctxs.get(ctx, 0) + alpha * v))
        )
    if not lps:
        return None
    avg = sum(lps) / len(lps)
    return len(lps), avg, math.exp(-avg)


def test_lm_matches_python_reference(spark):
    train = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog",
    ]
    score_rows = [
        (0, "the cat sat"),          # all-seen bigrams
        (1, "the zebra sat on"),     # OOV token
        (2, "cat"),                  # < n tokens -> absent
        (3, "dog sat on the mat"),
    ]
    d_train = spark.createDataFrame([(t,) for t in train], "text string")
    d_score = spark.createDataFrame(score_rows, "doc_id long, text string")
    lm = ngram_lm_fit(d_train, n=2, alpha=0.1)
    grams, ctxs, v = _py_lm(train)
    assert lm.vocab_size == v
    assert {(r.gram, r.c) for r in lm.grams.collect()} == set(grams.items())
    assert {(r.ctx, r.c) for r in lm.contexts.collect()} == set(ctxs.items())

    got = {r.doc_id: r for r in perplexity_scores(d_score, lm).collect()}
    assert 2 not in got  # un-scorable, absent
    for i, t in score_rows:
        want = _py_score(t, grams, ctxs, v)
        if want is None:
            continue
        n_tok, avg, ppl = want
        assert got[i].lm_tokens == n_tok
        assert got[i].avg_logp == pytest.approx(round(avg, 6), abs=1e-6)
        assert got[i].perplexity == pytest.approx(round(ppl, 4), abs=1e-4)


def test_lm_matches_duckdb_differential(spark):
    """Full restatement on the sf0.001 documents table: fit on
    doc_id < 200, score doc_id >= 200, compare every row at the
    output rounding."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    train = docs.filter(F.col("doc_id") < 200)
    score = docs.filter(F.col("doc_id") >= 200).filter(F.col("doc_id") < 260)
    lm = ngram_lm_fit(train, n=2, alpha=0.5)
    got = {
        r.doc_id: (r.lm_tokens, r.avg_logp, r.perplexity)
        for r in perplexity_scores(score, lm).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = con.execute(
        f"""
        WITH tr AS (
          SELECT list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             t -> t <> '') AS tk
          FROM documents WHERE doc_id < 200),
        trg AS (
          SELECT concat_ws(' ', tk[i], tk[i+1]) AS gram
          FROM tr, unnest(range(1, greatest(len(tk) - 1, 0) + 1)) AS u(i)),
        g AS (SELECT gram, COUNT(*) AS c FROM trg GROUP BY gram),
        cx AS (
          SELECT string_split(gram, ' ')[1] AS ctx, SUM(c) AS c
          FROM g GROUP BY 1),
        v AS (
          SELECT COUNT(DISTINCT u.t) AS v
          FROM tr, unnest(tk) AS u(t)),
        sc AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             t -> t <> '') AS tk
          FROM documents WHERE doc_id >= 200 AND doc_id < 260),
        scg AS (
          SELECT doc_id, concat_ws(' ', tk[i], tk[i+1]) AS gram,
                 tk[i] AS ctx
          FROM sc, unnest(range(1, greatest(len(tk) - 1, 0) + 1)) AS u(i)),
        lp AS (
          SELECT doc_id,
                 ln((COALESCE(g.c, 0) + 0.5) /
                    (COALESCE(cx.c, 0) + 0.5 * v.v)) AS logp
          FROM scg LEFT JOIN g USING (gram)
                   LEFT JOIN cx USING (ctx)
                   CROSS JOIN v)
        SELECT doc_id, COUNT(*) AS lm_tokens,
               ROUND(AVG(logp), 6) AS avg_logp,
               ROUND(exp(-AVG(logp)), 4) AS perplexity
        FROM lp GROUP BY doc_id
        """
    ).fetchall()
    want_d = {r[0]: (r[1], r[2], r[3]) for r in want}
    assert set(got) == set(want_d)
    for k in got:
        assert got[k][0] == want_d[k][0], k
        assert got[k][1] == pytest.approx(want_d[k][1], abs=2e-6), k
        assert got[k][2] == pytest.approx(want_d[k][2], rel=1e-5), k


def test_lm_discriminates_in_domain_text(spark):
    """The quality-gate property: text made of training-corpus
    collocations scores far lower perplexity than (a) OOV token soup,
    which floors at ~V (the uniform-model score), and (b) in-vocab
    tokens in never-seen orders.  (The sf documents table is itself
    near-uniform token soup over a 31-word vocabulary, so this test
    fits on structured sentences instead.)"""
    train = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox likes the lazy dog",
        "a lazy dog sleeps while the quick brown fox jumps",
    ] * 3
    lm = ngram_lm_fit(
        spark.createDataFrame([(t,) for t in train], "text string"), n=2
    )
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),  # in-domain
        (1, "zzqx wvvk pqzj xxo9 qqv7 zk3m wopq 9qxz"),      # OOV soup
        (2, "dog the fox quick brown lazy the jumps over"),   # shuffled
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    ppl = {r.doc_id: r.perplexity for r in perplexity_scores(d, lm).collect()}
    assert ppl[0] < ppl[1] / 3 and ppl[0] < ppl[2] / 3
    # OOV soup floors near the uniform-model score ~V
    assert ppl[1] == pytest.approx(lm.vocab_size, rel=0.35)


def test_lm_validation(spark):
    d = spark.createDataFrame([("hello world",)], "text string")
    with pytest.raises(ValueError, match="n must be >= 2"):
        ngram_lm_fit(d, n=1)
    with pytest.raises(ValueError, match="alpha"):
        ngram_lm_fit(d, alpha=0.0)
    empty = spark.createDataFrame([("",), ("   ",)], "text string")
    with pytest.raises(ValueError, match="no tokens"):
        ngram_lm_fit(empty)


def test_lm_scoring_plan_shape(spark):
    """Pin the scale shape: scoring is pure JVM (no Python in the
    plan), the model sides broadcast at this size, and the only wide
    work is the model aggregates + the final per-doc aggregate."""
    from zeek_duckdb_spark.plans import audit

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lm = ngram_lm_fit(docs, n=2)
    df = perplexity_scores(docs, lm)
    plan = audit.physical_plan(df)
    assert "Python" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_perplexity_col_parity_with_scores(spark):
    """The closure-based column and the distributed-join operator must
    emit identical numbers row-for-row (including NULL for < n-token
    docs), on both the sf corpus and unicode-ish text."""
    from zeek_duckdb_spark.operators.lm import perplexity_col

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lm = ngram_lm_fit(docs.filter(F.col("doc_id") < 300), n=2)
    extra = spark.createDataFrame(
        [(900001, "tiny"), (900002, None), (900003, "Ünïcode text  with   gaps")],
        "doc_id long, text string",
    )
    target = docs.filter(F.col("doc_id") >= 300).select("doc_id", "text").unionByName(extra)

    want = {
        r.doc_id: (r.lm_tokens, r.avg_logp, r.perplexity)
        for r in perplexity_scores(target, lm).collect()
    }
    got_rows = target.select(
        "doc_id", perplexity_col(lm, F.col("text")).alias("p")
    ).collect()
    got = {
        r.doc_id: (r.p.lm_tokens, r.p.avg_logp, r.p.perplexity)
        for r in got_rows
        if r.p is not None and r.p.lm_tokens is not None
    }
    assert got == want          # scorable rows agree exactly
    nulls = {r.doc_id for r in got_rows if r.p is None or r.p.lm_tokens is None}
    assert nulls == {900001, 900002}  # < n tokens / NULL text

    with pytest.raises(ValueError, match="max_model_rows"):
        perplexity_col(lm, F.col("text"), max_model_rows=3)

    # the context table is guarded INDEPENDENTLY of grams (a fitted
    # model always has |contexts| <= |grams|, but a hand-built or
    # refactored one may not): small grams + oversized contexts must
    # still refuse the driver collect
    from zeek_duckdb_spark.operators.lm import NgramLM

    lopsided = NgramLM(
        n=2, alpha=1.0, vocab_size=4,
        grams=spark.createDataFrame([("a b", 1)], "gram string, c long"),
        contexts=spark.createDataFrame(
            [(f"c{i}", 1) for i in range(10)], "ctx string, c long"
        ),
    )
    with pytest.raises(ValueError, match="context table exceeds"):
        perplexity_col(lopsided, F.col("text"), max_model_rows=5)


def test_perplexity_gate_in_a_stream(spark, tmp_path):
    """The streaming crawl-gate story: a file stream of documents is
    scored with perplexity_col (stateless map — no state store needed)
    and filtered in-flight; the surviving set equals the batch gate."""
    import json
    import os

    from zeek_duckdb_spark.operators.lm import perplexity_col

    train = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox likes the lazy dog",
    ] * 2
    lm = ngram_lm_fit(
        spark.createDataFrame([(t,) for t in train], "text string"), n=2
    )
    src = tmp_path / "in"
    src.mkdir()
    rows = [
        {"doc_id": 0, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 1, "text": "zzqx wvvk pqzj xxo9 qqv7 zk3m wopq 9qxz"},
        {"doc_id": 2, "text": "the lazy dog likes the quick brown fox"},
    ]
    with open(src / "batch0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .json(str(src))
        .withColumn("p", perplexity_col(lm, F.col("text")))
        .filter(F.col("p.perplexity") <= 5.0)
        .select("doc_id", "p.perplexity")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ppl_gate")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.doc_id for r in spark.sql("SELECT * FROM ppl_gate").collect()}

    batch = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
    )
    want = {
        r.doc_id
        for r in perplexity_scores(batch, lm)
        .filter(F.col("perplexity") <= 5.0)
        .collect()
    }
    assert got == want and 1 not in got and got  # OOV doc gated out


def test_lm_trigram_matches_python_reference(spark):
    """n=3: prefix-count normalization and scoring generalize beyond
    bigrams (the reference helpers take n)."""
    train = [
        "the cat sat on the mat",
        "the cat sat on the log",
        "a dog sat on the mat",
    ]
    d_train = spark.createDataFrame([(t,) for t in train], "text string")
    lm = ngram_lm_fit(d_train, n=3, alpha=0.2)
    grams, ctxs, v = _py_lm(train, n=3, alpha=0.2)
    assert lm.vocab_size == v
    assert {(r.gram, r.c) for r in lm.grams.collect()} == set(grams.items())
    assert {(r.ctx, r.c) for r in lm.contexts.collect()} == set(ctxs.items())

    rows = [(0, "the cat sat on the mat"), (1, "cat sat")]  # 1: < n tokens
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in perplexity_scores(d, lm).collect()}
    assert 1 not in got
    n_tok, avg, ppl = _py_score(rows[0][1], grams, ctxs, v, n=3, alpha=0.2)
    assert got[0].lm_tokens == n_tok
    assert got[0].avg_logp == pytest.approx(round(avg, 6), abs=1e-6)
    assert got[0].perplexity == pytest.approx(round(ppl, 4), abs=1e-4)
    # the closure column agrees at n=3 too
    from zeek_duckdb_spark.operators.lm import perplexity_col

    c = d.select("doc_id", perplexity_col(lm, F.col("text")).alias("p")).collect()
    by_id = {r.doc_id: r.p for r in c}
    assert by_id[0].lm_tokens == n_tok
    assert by_id[0].perplexity == got[0].perplexity
    assert by_id[1] is None or by_id[1].lm_tokens is None


def test_perplexity_col_null_struct_contract(spark):
    """Review regression (verified by execution): un-scorable rows get
    a genuinely NULL struct, so struct-level `p IS NULL` predicates
    work as the docstring promises."""
    from zeek_duckdb_spark.operators.lm import perplexity_col

    lm = ngram_lm_fit(
        spark.createDataFrame([("a b c d e",)], "text string"), n=2
    )
    d = spark.createDataFrame(
        [(0, "a b c"), (1, "solo"), (2, None), (3, "   ")],
        "doc_id long, text string",
    )
    out = d.select("doc_id", perplexity_col(lm, F.col("text")).alias("p"))
    assert {r.doc_id for r in out.filter(F.col("p").isNull()).collect()} == {1, 2, 3}
    assert {r.doc_id for r in out.filter(F.col("p").isNotNull()).collect()} == {0}
