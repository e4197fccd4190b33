"""vocab_counts / vocab_coverage: DuckDB differential, both token
modes, determinism of tie-breaks, and the aggregate-shape plan."""

import duckdb
import pytest

from zeek_duckdb_spark.operators.vocab import vocab_counts, vocab_coverage
from zeek_duckdb_spark.plans import audit

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def test_counts_match_duckdb_ws(spark, docs):
    got = [(r.token, r.n) for r in vocab_counts(docs, top_n=50).collect()]
    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH toks AS (
          SELECT unnest(list_filter(
            string_split_regex(trim(lower(text)), '\\s+'), t -> t != ''
          )) AS token
          FROM read_parquet('{SF}/documents.parquet')
        )
        SELECT token, count(*) AS n FROM toks
        GROUP BY token ORDER BY n DESC, token ASC LIMIT 50
        """
    ).fetchall()
    assert got == [(t, int(n)) for t, n in want]


def test_counts_bpe_mode_and_min_count(spark, docs):
    out = vocab_counts(docs, top_n=2000, min_count=3, mode="bpe").collect()
    assert all(r.n >= 3 for r in out)
    # bpe mode splits punctuation and digit runs into their own tokens
    d = spark.createDataFrame(
        [(1, "ab12cd! ab12cd! x"), (2, "ab, cd")], "doc_id long, text string"
    )
    got = {(r.token, r.n) for r in vocab_counts(d, top_n=100, mode="bpe").collect()}
    assert got == {
        ("ab", 3), ("12", 2), ("cd", 3), ("!", 2), (",", 1), ("x", 1)
    }


def test_counts_deterministic_tie_break(spark):
    d = spark.createDataFrame(
        [(1, "b a"), (2, "a b"), (3, "c")], "doc_id long, text string"
    )
    got = [(r.token, r.n) for r in vocab_counts(d, top_n=3).collect()]
    assert got == [("a", 2), ("b", 2), ("c", 1)]  # ties: token ascending


def test_coverage_curve_monotone_and_total(spark, docs):
    cov = vocab_coverage(docs, top_n=100).collect()
    assert [r.rank for r in cov] == list(range(1, len(cov) + 1))
    vals = [r.cum_coverage for r in cov]
    assert vals == sorted(vals)
    assert 0 < vals[0] <= vals[-1] <= 1.0
    # full-vocab coverage == 1 exactly
    full = vocab_coverage(docs, top_n=10**6).collect()
    assert full[-1].cum_coverage == pytest.approx(1.0, abs=1e-6)


def test_coverage_matches_duckdb(spark, docs):
    got = [
        (r.rank, r.token, r.n, r.cum_coverage)
        for r in vocab_coverage(docs, top_n=30).collect()
    ]
    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH toks AS (
          SELECT unnest(list_filter(
            string_split_regex(trim(lower(text)), '\\s+'), t -> t != ''
          )) AS token
          FROM read_parquet('{SF}/documents.parquet')
        ), counts AS (
          SELECT token, count(*) AS n FROM toks GROUP BY token
        ), top AS (
          SELECT token, n FROM counts ORDER BY n DESC, token ASC LIMIT 30
        ), tot AS (SELECT count(*) AS total FROM toks)
        SELECT row_number() OVER (ORDER BY n DESC, token ASC) AS rank,
               token, n,
               round(CAST(sum(n) OVER (ORDER BY n DESC, token ASC
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) / total, 6)
                 AS cum_coverage
        FROM top, tot ORDER BY rank
        """
    ).fetchall()
    assert got == [(int(a), b, int(c), float(d)) for a, b, c, d in want]


def test_counts_plan_one_aggregate_topk(spark, docs):
    plan = audit.physical_plan(vocab_counts(docs, top_n=10))
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan
    # explode + two-phase hash aggregate: exactly one shuffle
    assert audit.num_shuffles(vocab_counts(docs, top_n=10)) == 1


def test_mode_validation(spark, docs):
    with pytest.raises(ValueError, match="mode"):
        vocab_counts(docs, mode="char")
    with pytest.raises(ValueError, match="top_n"):
        vocab_counts(docs, top_n=0)


def test_counts_property_random_docs_vs_python_counter(spark):
    # randomized differential vs a plain Python counter, both modes
    import random
    import re
    from collections import Counter

    rng = random.Random(99)
    words = ["alpha", "beta", "Gamma", "x1", "...", "a,b", ""]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randrange(0, 12))))
        for i in range(200)
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    for mode in ("ws", "bpe"):
        want = Counter()
        for _, text in docs:
            t = text.lower()
            if mode == "ws":
                toks = [w for w in re.split(r"\s+", t.strip()) if w != ""]
            else:
                toks = re.findall(r"[a-z]+|[0-9]+|[^a-z0-9\s]", t)
            want.update(toks)
        got = {
            r.token: r.n
            for r in vocab_counts(d, top_n=10**6, mode=mode).collect()
        }
        assert got == dict(want), mode


def test_coverage_guards_driver_sized_window(spark, docs):
    with pytest.raises(ValueError, match="ONE partition"):
        vocab_coverage(docs, top_n=2_000_000)


# --- BPE training ------------------------------------------------------

def _ref_bpe(word_freqs, num_merges):
    """Independent O(n^2)-per-merge reference (straight from the
    Sennrich pseudocode): recount every pair each round, merge the
    (count desc, pair asc) argmax."""
    words = {tuple(w) + ("</w>",): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, f in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + f
        live = {p: c for p, c in pairs.items() if c >= 2}
        if not live:
            break
        best = min(live.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        out = {}
        for syms, f in words.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out[tuple(res)] = out.get(tuple(res), 0) + f
        words = out
    return merges


def test_bpe_train_matches_reference(spark):
    from zeek_duckdb_spark.operators.vocab import bpe_train

    corpus = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    text = " ".join(corpus)
    d = spark.createDataFrame([(text,)], "text string")
    model = bpe_train(d, num_merges=10, min_count=1)
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    want = _ref_bpe(freqs, 10)
    assert model.merges == want
    # the classic outcome: 'est</w>' is learned as a unit
    assert ("est", "</w>") in model.merges or ("es", "t") in model.merges
    # deterministic across partitionings (exact integer counts)
    d2 = spark.createDataFrame(
        [(w,) for w in corpus], "text string"
    ).repartition(7)
    assert bpe_train(d2, num_merges=10, min_count=1).merges == want


def test_bpe_tokenize_roundtrip_and_open_vocab(spark):
    from zeek_duckdb_spark.operators.vocab import bpe_tokenize_col, bpe_train

    corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    d = spark.createDataFrame([(" ".join(corpus),)], "text string")
    model = bpe_train(d, num_merges=20, min_count=1)

    target = spark.createDataFrame(
        [(0, "low lower newest"), (1, "zzz"), (2, None), (3, "lowest")],
        "doc_id long, text string",
    )
    import pyspark.sql.functions as F2
    got = {
        r.doc_id: r.toks
        for r in target.select(
            "doc_id", bpe_tokenize_col(model, F2.col("text")).alias("toks")
        ).collect()
    }
    # fully-merged training words reassemble to themselves + </w>
    assert "".join(got[0]) == "low</w>lower</w>newest</w>"
    # trained words segment into few units
    assert len(got[0]) <= 6
    # unseen word: falls back to chars (+ any applicable merges), never fails
    assert got[1] and "".join(got[1]) == "zzz</w>"
    assert got[2] is None
    # 'lowest' = unseen but composed of seen units: starts with 'low'
    assert got[3][0].startswith("low")
    # encoding matches the reference greedy apply word-for-word
    from zeek_duckdb_spark.operators.vocab import _bpe_encode_word
    ranks = {p: i for i, p in enumerate(model.merges)}
    assert got[0] == (
        _bpe_encode_word("low", ranks)
        + _bpe_encode_word("lower", ranks)
        + _bpe_encode_word("newest", ranks)
    )


def test_bpe_train_on_sf_documents_and_coverage(spark):
    """End-to-end on the sf table: merges reduce the token count of
    the corpus it was trained on (the whole point), and validation is
    loud."""
    import pytest as _pytest

    import pyspark.sql.functions as F2
    from zeek_duckdb_spark.operators.vocab import bpe_tokenize_col, bpe_train

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = bpe_train(d, num_merges=60, min_count=2)
    assert len(model.merges) > 0

    n_tok = d.select(
        F2.sum(F2.size(bpe_tokenize_col(model, F2.col("text")))).alias("n")
    ).first()["n"]
    from zeek_duckdb_spark.operators.vocab import BPEModel
    no_merges = BPEModel([], model.vocab)
    n_char = d.select(
        F2.sum(F2.size(bpe_tokenize_col(no_merges, F2.col("text")))).alias("n")
    ).first()["n"]
    assert n_tok < n_char * 0.7  # merges compress substantially

    with _pytest.raises(ValueError, match="num_merges"):
        bpe_train(d, num_merges=0)
    with _pytest.raises(ValueError, match="no words"):
        bpe_train(
            spark.createDataFrame([("",)], "text string"), min_count=2
        )


def test_bpe_tokenize_nbsp_train_apply_parity(spark):
    """Review regression: mode='bpe' applies with re.ASCII so NBSP-class
    characters tokenize exactly as the Java-regex trainer sees them
    (a [^A-Za-z0-9\\s] token, not whitespace)."""
    import pyspark.sql.functions as F2

    from zeek_duckdb_spark.operators.vocab import (
        _token_array,
        bpe_tokenize_col,
        bpe_train,
    )

    text = "a b plain words here"
    d = spark.createDataFrame([(text,)], "text string")
    model = bpe_train(d, num_merges=5, min_count=1)
    spark_toks = d.select(
        _token_array("text", "bpe", lowercase=True).alias("t")
    ).first()["t"]
    assert " " in spark_toks  # the trainer sees NBSP as a token
    applied = d.select(
        bpe_tokenize_col(model, F2.col("text")).alias("t")
    ).first()["t"]
    # every trainer-side word appears in the applied stream (joined
    # form), NBSP included
    joined = "".join(applied)
    assert " </w>" in joined
