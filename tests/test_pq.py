"""Product quantization: train determinism, encode/ADC parity vs
numpy, the refine serving shape, and the zero-shuffle plan contract."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from zeek_duckdb_spark.operators.pq import pq_encode, pq_topk, pq_train
from zeek_duckdb_spark.plans import audit

SF = "/root/testdata/sf0.001"
DIM, M, K = 64, 8, 4


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def model(spark, emb):
    return pq_train(emb, dim=DIM, m=M, k=K, iters=2)


def _np_embs(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([[float(v) for v in r.embedding] for r in rows])
    return ids, X


def test_train_shapes_and_partitioning_invariance(spark, emb, model):
    assert len(model) == M and len(model[0]) == K and len(model[0][0]) == DIM // M
    # exact-int64-sum training: identical codebooks under any partitioning
    again = pq_train(emb.repartition(7), dim=DIM, m=M, k=K, iters=2)
    assert model == again


def test_encode_matches_numpy_argmin(spark, emb, model):
    got = {
        r.vec_id: list(r.pq_codes)
        for r in pq_encode(emb, model).collect()
    }
    ids, X = _np_embs(emb)
    cb = np.array(model)  # m x k x dsub
    dsub = DIM // M
    for i, vid in enumerate(ids[:100]):
        for j in range(M):
            sub = X[i, j * dsub : (j + 1) * dsub]
            d = ((cb[j] - sub) ** 2).sum(axis=1)
            # tie-break: lowest code
            assert got[vid][j] == int(np.argmin(d))


def test_topk_matches_numpy_adc_l2_and_ip(spark, emb, model):
    ids, X = _np_embs(emb)
    query = X[3].tolist()
    codes = pq_encode(emb, model)
    cb = np.array(model)
    dsub = DIM // M
    code_np = {
        r.vec_id: list(r.pq_codes) for r in codes.collect()
    }
    for metric, col, sign in (("l2", "adc_dist", 1), ("ip", "adc_score", -1)):
        lut = np.zeros((M, K))
        for j in range(M):
            sub = np.array(query[j * dsub : (j + 1) * dsub])
            if metric == "l2":
                lut[j] = ((cb[j] - sub) ** 2).sum(axis=1)
            else:
                lut[j] = cb[j] @ sub
        adc = {
            vid: round(sum(lut[j][c] for j, c in enumerate(cs)), 6)
            for vid, cs in code_np.items()
        }
        want = sorted(adc.items(), key=lambda kv: (sign * kv[1], kv[0]))[:10]
        got = [
            (r.vec_id, r[col])
            for r in pq_topk(codes, query, model, 10, metric=metric).collect()
        ]
        assert got == [(int(v), pytest.approx(s, abs=1e-9)) for v, s in want]


def test_refine_reranks_by_exact_distance(spark, emb, model):
    ids, X = _np_embs(emb)
    query = X[5].tolist()
    codes = pq_encode(emb, model)
    out = pq_topk(
        codes, query, model, 5, metric="l2", refine_with=emb, refine_factor=8
    ).collect()
    assert [c for c in out[0].asDict()] == ["vec_id", "adc_dist", "exact_dist"]
    # exact_dist values match numpy for the returned rows, and ordering
    # is by exact distance
    by_id = {int(i): X[n] for n, i in enumerate(ids)}
    q = np.array(query)
    for r in out:
        want = float(((by_id[r.vec_id] - q) ** 2).sum())
        assert r.exact_dist == pytest.approx(round(want, 6), abs=1e-6)
    dists = [r.exact_dist for r in out]
    assert dists == sorted(dists)


def test_encode_and_topk_zero_shuffle_plans(spark, emb, model):
    codes = pq_encode(emb, model)
    assert audit.num_shuffles(codes) == 0
    assert "Python" not in audit.physical_plan(codes)
    ids, X = _np_embs(emb)
    top = pq_topk(codes, X[0].tolist(), model, 10)
    plan = audit.physical_plan(top)
    assert audit.num_shuffles(top) == 0
    assert "TakeOrderedAndProject" in plan


def test_geometry_validation(spark, emb):
    with pytest.raises(ValueError, match="must divide"):
        pq_train(emb, dim=DIM, m=7, k=4)
    with pytest.raises(ValueError, match="one byte"):
        pq_train(emb, dim=DIM, m=8, k=1000)
    with pytest.raises(ValueError, match="query dim"):
        pq_topk(pq_encode(emb, [[[0.0] * 8] * 4] * 8), [0.0] * 10, [[[0.0] * 8] * 4] * 8)
    with pytest.raises(ValueError, match="train_sample"):
        pq_train(emb, dim=DIM, m=8, k=4, train_sample=1.5)


def test_train_sample_subsets_deterministically(spark, emb):
    a = pq_train(emb, dim=DIM, m=M, k=K, iters=1, train_sample=0.5, seed=3)
    b = pq_train(emb, dim=DIM, m=M, k=K, iters=1, train_sample=0.5, seed=3)
    assert a == b
