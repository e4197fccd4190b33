"""Connected components / dedup clustering (operators/graph.py) and
boilerplate-line removal (operators/textops.strip_boilerplate)."""

import pytest

from pyspark.sql import functions as F

from zeek_duckdb_spark.operators.graph import connected_components, dedup_clusters
from zeek_duckdb_spark.operators.textops import strip_boilerplate


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_cc_triangle_and_chain(spark):
    # triangle {1,2,3}, chain {10-11-12-13}, isolated pair {20,21}
    pairs = _pairs(
        spark,
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13), (20, 21)],
    )
    cc = {r.v: r.component for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}


@pytest.mark.slow
def test_cc_long_chain_converges(spark):
    n = 20
    pairs = _pairs(spark, [(i, i + 1) for i in range(n)])
    cc = connected_components(pairs)
    assert {r.component for r in cc.collect()} == {0}
    assert cc.count() == n + 1


def test_cc_max_iter_raises(spark):
    pairs = _pairs(spark, [(i, i + 1) for i in range(30)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2)


def test_dedup_clusters_shape(spark):
    pairs = _pairs(spark, [(5, 9), (9, 7), (30, 31)])
    rows = {r.cluster_id: r for r in dedup_clusters(pairs).collect()}
    assert rows[5].cluster_size == 3 and rows[5].members == [5, 7, 9]
    assert rows[30].cluster_size == 2 and rows[30].members == [30, 31]


def test_strip_boilerplate(spark):
    docs = spark.createDataFrame(
        [
            (1, "unique one\nCOOKIE BANNER\nfooter"),
            (2, "unique two\nCOOKIE BANNER\nfooter"),
            (3, "unique three\nCOOKIE BANNER\nfooter"),
            (4, "COOKIE BANNER"),          # all-boilerplate doc
            (5, "standalone text"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in strip_boilerplate(docs, min_docs=3).collect()}
    assert out[1] == "unique one"          # hot lines stripped, order kept
    assert out[2] == "unique two"
    assert out[3] == "unique three"
    assert out[4] == ""                    # survives as empty, not dropped
    assert out[5] == "standalone text"     # untouched (footer seen 3x, banner 4x)
    assert len(out) == 5


def test_strip_boilerplate_preserves_order(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha{i}\nHOT\nbeta{i}\nHOT\ngamma{i}") for i in range(3)],
        "doc_id long, text string",
    )
    out = strip_boilerplate(docs, min_docs=2).collect()
    # repeated HOT lines removed (both occurrences), unique lines in order
    assert {r.doc_id: r.text for r in out} == {
        i: f"alpha{i}\nbeta{i}\ngamma{i}" for i in range(3)
    }


# --- resolve_clusters: quality-aware keep policy ------------------------


def _scored_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, score double")


def test_resolve_clusters_min_id_default(spark):
    docs = _scored_docs(
        spark,
        [(1, "a", 0.1), (2, "b", 0.9), (3, "c", 0.5), (7, "alone", 0.2)],
    )
    pairs = _pairs(spark, [(1, 2), (2, 3)])
    from zeek_duckdb_spark.operators.graph import resolve_clusters

    kept = sorted(r.doc_id for r in resolve_clusters(docs, pairs).collect())
    assert kept == [1, 7]  # min id of the {1,2,3} cluster + untouched 7


def test_resolve_clusters_keeps_best_score(spark):
    docs = _scored_docs(
        spark,
        [
            (1, "low", 0.1),
            (2, "best", 0.9),
            (3, "mid", 0.5),
            (10, "tie-a", 0.4),
            (11, "tie-b", 0.4),   # score tie -> min id wins
            (20, "null-a", None),
            (21, "null-b", None),  # all-NULL cluster -> min id wins
            (30, "solo", 0.0),
        ],
    )
    pairs = _pairs(spark, [(1, 2), (2, 3), (10, 11), (20, 21)])
    from zeek_duckdb_spark.operators.graph import resolve_clusters

    out = resolve_clusters(docs, pairs, score_col="score")
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [2, 10, 20, 30]
    # schema passes through untouched (no helper columns leak)
    assert out.columns == ["doc_id", "text", "score"]


def test_resolve_clusters_null_loses_to_scored(spark):
    docs = _scored_docs(spark, [(1, "scored", 0.2), (2, "null", None)])
    pairs = _pairs(spark, [(1, 2)])
    from zeek_duckdb_spark.operators.graph import resolve_clusters

    kept = [r.doc_id for r in resolve_clusters(docs, pairs, score_col="score").collect()]
    assert kept == [1]


# --- pagerank -----------------------------------------------------------

def _np_pagerank(edges, iters=10, d=0.85, directed=False):
    es = set()
    for a, b in edges:
        es.add((a, b))
        if not directed:
            es.add((b, a))
    verts = sorted({v for e in es for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    deg = {v: 0 for v in verts}
    for a, b in es:
        deg[a] += 1
    r = [1.0 / n] * n
    for _ in range(iters):
        nxt = [(1.0 - d) / n] * n
        for a, b in es:
            nxt[idx[b]] += d * r[idx[a]] / deg[a]
        r = nxt
    return {v: r[idx[v]] for v in verts}


def test_pagerank_matches_reference_power_iteration(spark):
    from zeek_duckdb_spark.operators.graph import pagerank

    import random

    rng = random.Random(5)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(80)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.v: r.rank for r in pagerank(df, iters=12).collect()}
    want = _np_pagerank(edges, iters=12)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-4)


def test_pagerank_hub_ranks_highest_directed(spark):
    from zeek_duckdb_spark.operators.graph import pagerank

    # star: every leaf points AT the hub
    df = spark.createDataFrame(
        [(i, 99) for i in range(1, 9)], "id_a long, id_b long"
    )
    got = {r.v: r.rank for r in pagerank(df, iters=10, directed=True).collect()}
    assert got[99] == max(got.values())
    want = _np_pagerank([(i, 99) for i in range(1, 9)], iters=10, directed=True)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)


def test_pagerank_validation(spark):
    from zeek_duckdb_spark.operators.graph import pagerank

    df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="iters"):
        pagerank(df, iters=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.5)
