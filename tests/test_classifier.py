"""Learned quality classifier (operators/classifier.py): fit
determinism under repartitioning, exact numpy differential of the
fixed-point GD, separable-data accuracy, DuckDB score oracle, kernel
parity, the gate, and plan shape."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from zeek_duckdb_spark.operators.classifier import (
    filter_by_classifier,
    logreg_fit,
    logreg_score,
)
from zeek_duckdb_spark.plans import audit

DIM = 16


def _blobs(spark, n=400, seed=5, parts=8):
    """Two separable Gaussian blobs with 0/1 labels."""
    rng = np.random.default_rng(seed)
    w_true = rng.normal(0, 1, DIM)
    X = rng.normal(0, 1, (n, DIM))
    y = (X @ w_true > 0).astype(int)
    X = X + 0.8 * np.sign(X @ w_true)[:, None] * w_true / np.linalg.norm(w_true)
    rows = [
        (i, [float(v) for v in X[i]], int(y[i])) for i in range(n)
    ]
    return (
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        ).repartition(parts),
        X,
        y,
    )


def _np_reference_fit(X, y, iters, lr, l2=0.0):
    """The SAME fixed-point GD re-implemented in numpy — must match
    the distributed fit bit-for-bit (both run exact int64 gradient
    sums on the identical int8 grid)."""
    FP = 1 << 20
    scale = np.abs(X).max() / 127.0
    Q = np.floor(X / scale + 0.5).astype(np.int64)
    dim = X.shape[1]
    w = np.zeros(dim)
    b = 0.0
    n = len(X)
    for _ in range(iters):
        z = Q.astype(np.float64) @ w + b
        p = np.where(
            z >= 0, 1.0 / (1.0 + np.exp(-np.abs(z))),
            np.exp(-np.abs(z)) / (1.0 + np.exp(-np.abs(z))),
        )
        r = np.floor((p - y) * FP + 0.5).astype(np.int64)
        g = (Q * r[:, None]).sum(axis=0)
        gb = int(r.sum())
        w = w - lr * ((g / FP) / n + l2 * w)
        b = b - lr * ((gb / FP) / n)
    return (w / scale).tolist(), b


def test_fit_deterministic_and_matches_numpy(spark):
    df, X, y = _blobs(spark)
    m1 = logreg_fit(df, "label", DIM, iters=5, lr=1.0)
    m2 = logreg_fit(df.repartition(17), "label", DIM, iters=5, lr=1.0)
    assert m1["weights"] == m2["weights"] and m1["bias"] == m2["bias"]
    ref_w, ref_b = _np_reference_fit(X, y.astype(float), iters=5, lr=1.0)
    assert m1["weights"] == pytest.approx(ref_w, abs=0, rel=0)
    assert m1["bias"] == ref_b
    assert m1["n"] == len(X)
    # loss trace falls on separable data
    assert m1["loss"][0] > m1["loss"][-1]


def test_fit_separates_and_gate_keeps_quality(spark):
    df, X, y = _blobs(spark, n=600, seed=11)
    m = logreg_fit(df, "label", DIM, iters=30, lr=2.0)
    scored = logreg_score(df, m["weights"], m["bias"])
    rows = scored.select("vec_id", "label", "quality_score").collect()
    acc = sum(
        1 for r in rows if (r.quality_score >= 0.5) == (r.label == 1)
    ) / len(rows)
    assert acc >= 0.95
    kept = filter_by_classifier(df, m["weights"], m["bias"], 0.5)
    junk = filter_by_classifier(df, m["weights"], m["bias"], 0.5,
                                keep="below")
    assert kept.count() + junk.count() == len(rows)
    kept_ids = {r.vec_id for r in kept.select("vec_id").collect()}
    assert {r.vec_id for r in rows if r.quality_score >= 0.5} == kept_ids


def test_score_matches_duckdb_oracle(spark):
    import duckdb

    df, X, _ = _blobs(spark, n=120, seed=3)
    w = [((j * 37) % 19 - 9) / 10.0 for j in range(DIM)]
    b = 0.25
    got = {
        r.vec_id: r.quality_score
        for r in logreg_score(df, w, b).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (vec_id BIGINT, embedding DOUBLE[])")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
    )
    w_sql = "[" + ", ".join(repr(v) for v in w) + "]"
    want = {
        i: p
        for i, p in con.sql(
            "SELECT vec_id, ROUND(1.0 / (1.0 + exp(-(list_sum("
            f"list_transform(list_zip(embedding, {w_sql}), "
            f"z -> z[1] * z[2])) + {b!r}))), 6) FROM t"
        ).fetchall()
    }
    # same sequential fold on both sides -> identical after 6 dp
    assert got == want


def test_kernel_parity_plan_and_nulls(spark):
    df, _, _ = _blobs(spark, n=100, seed=7)
    w = [0.1] * DIM
    a = {r.vec_id: r.quality_score
         for r in logreg_score(df, w, -0.2, kernel="expr").collect()}
    b = {r.vec_id: r.quality_score
         for r in logreg_score(df, w, -0.2, kernel="arrow").collect()}
    assert a == b
    scored = logreg_score(df, w, -0.2)
    assert audit.num_shuffles(scored) == 0  # pure per-row fold
    # wrong-length vector scores NULL and never passes the gate
    odd = spark.createDataFrame(
        [(1, [0.5] * DIM, 1), (2, [0.5] * (DIM - 1), 1)],
        "vec_id long, embedding array<double>, label int",
    )
    s = {r.vec_id: r.quality_score
         for r in logreg_score(odd, w, 0.0).collect()}
    assert s[2] is None and s[1] is not None
    assert {
        r.vec_id
        for r in filter_by_classifier(odd, w, 0.0, 0.0).collect()
    } == {1}
    assert {
        r.vec_id
        for r in filter_by_classifier(odd, w, 0.0, 1.0, keep="below").collect()
    } == {1}


def test_validation(spark):
    df, _, _ = _blobs(spark, n=40)
    with pytest.raises(ValueError, match="iters"):
        logreg_fit(df, "label", DIM, iters=-1)
    with pytest.raises(ValueError, match="lr"):
        logreg_fit(df, "label", DIM, lr=0)
    with pytest.raises(ValueError, match="labels must be 0/1"):
        logreg_fit(
            df.withColumn("label", F.lit(2)), "label", DIM, iters=1
        )
    with pytest.raises(ValueError, match="no usable rows"):
        logreg_fit(df.filter("vec_id < 0"), "label", DIM, iters=1)
    with pytest.raises(ValueError, match="kernel"):
        logreg_score(df, [0.1] * DIM, 0.0, kernel="gpu")
    with pytest.raises(ValueError, match="weights is empty"):
        logreg_score(df, [], 0.0)
    with pytest.raises(ValueError, match="keep"):
        filter_by_classifier(df, [0.1] * DIM, 0.0, 0.5, keep="maybe")
    with pytest.raises(ValueError, match="threshold"):
        filter_by_classifier(df, [0.1] * DIM, 0.0, 1.5)
    # iters=0 returns the zero model but still validates rows exist
    m = logreg_fit(df, "label", DIM, iters=0)
    assert m["weights"] == [0.0] * DIM and m["bias"] == 0.0


def test_null_and_nan_vectors_review_regressions(spark):
    """Review-fix regressions: a NULL vector must score NULL on BOTH
    kernels (arrow used to crash the task), and a NaN element in a fit
    row is dropped instead of poisoning the corpus-global scale."""
    from zeek_duckdb_spark.operators.classifier import logreg_fit, logreg_score

    w = [0.5] * 4
    odd = spark.createDataFrame(
        [(1, [0.1] * 4), (2, None)],
        "vec_id long, embedding array<double>",
    )
    for kernel in ("expr", "arrow"):
        s = {r.vec_id: r.quality_score
             for r in logreg_score(odd, w, 0.0, kernel=kernel).collect()}
        assert s[2] is None and s[1] is not None, kernel
    labeled = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0], 1),
         (2, [-1.0, 0.0, 0.0, 0.0], 0),
         (3, [float("nan"), 1.0, 1.0, 1.0], 1),   # dropped, not poison
         (4, [1.0, None, 0.0, 0.0], 0)],          # dropped, not crash
        "vec_id long, embedding array<double>, label int",
    )
    m = logreg_fit(labeled, "label", 4, iters=3, lr=1.0)
    assert m["n"] == 2  # only the two clean rows fit
    assert all(math.isfinite(v) for v in m["weights"])


def test_logreg_score_existing_out_col_kernel_parity(spark):
    """Advice-fix regression: when out_col already EXISTS in df, both
    kernels must REPLACE it (withColumn semantics) — the arrow kernel
    used to append a duplicate StructField while the pandas assignment
    overwrote in place, so the declared schema had one more column
    than the yielded batches and the job died at runtime."""
    w = [0.5] * 4
    df = spark.createDataFrame(
        [(1, [0.2] * 4, 99.0), (2, [-0.2] * 4, 99.0)],
        "vec_id long, embedding array<double>, quality_score double",
    )
    outs = {}
    for kernel in ("expr", "arrow"):
        got = logreg_score(df, w, 0.0, kernel=kernel)
        assert got.columns == ["vec_id", "embedding", "quality_score"]
        outs[kernel] = {
            r.vec_id: r.quality_score for r in got.collect()
        }
    assert outs["expr"] == outs["arrow"]
    assert outs["expr"][1] != 99.0  # replaced, not kept
