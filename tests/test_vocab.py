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
