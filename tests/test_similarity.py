"""kcenter_select (greedy furthest-point diversity selection)."""

import pytest


# ---------------------------------------------------------------------
# kcenter_select (greedy furthest-point diversity selection)
# ---------------------------------------------------------------------


def test_kcenter_hits_every_cluster_before_duplicates(spark):
    import numpy as np

    from zeek_duckdb_spark.operators.similarity import kcenter_select

    rng = np.random.default_rng(6)
    DIM = 16
    centres = rng.normal(0, 12, (5, DIM))
    pts = np.concatenate([c + rng.normal(0, 0.3, (40, DIM)) for c in centres])
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )
    sel = kcenter_select(df, 5)
    assert len(sel) == 5 and sel[0][0] == 0  # deterministic anchor
    clusters = {int(i) // 40 for i, _ in sel}
    assert clusters == {0, 1, 2, 3, 4}  # one exemplar per mode
    # radius trace: monotone non-increasing after the anchor, and the
    # drop after all 5 modes are covered is sharp (inter-cluster ->
    # intra-cluster distances)
    radii = [r for _, r in sel[1:]]
    assert radii == sorted(radii, reverse=True)
    more = kcenter_select(df, 7)
    assert more[5][1] < 0.2 * radii[-1]


def test_kcenter_deterministic_and_matches_numpy(spark):
    import numpy as np

    from zeek_duckdb_spark.operators.similarity import kcenter_select

    rng = np.random.default_rng(2)
    DIM = 8
    pts = rng.normal(0, 1, (120, DIM))
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )
    a = kcenter_select(df, 6)
    b = kcenter_select(df.repartition(13), 6)
    assert a == b  # exact-int distances -> identical under partitioning

    # numpy reference of the SAME quantized greedy (int64 distances,
    # max-dist argmax, low-id ties)
    scale = np.abs(pts).max() / 127.0
    Q = np.floor(pts / scale + 0.5).astype(np.int64)
    sel = [0]
    want = [(0, float("inf"))]
    for _ in range(5):
        d2 = np.min(
            [((Q - Q[s]) ** 2).sum(axis=1) for s in sel], axis=0
        )
        i = int(np.argmax(d2))  # argmax returns the first (lowest) index
        want.append((i, float(np.sqrt(d2[i])) * scale))
        sel.append(i)
    assert [(i, r) for i, r in a] == want


def test_kcenter_duplicates_and_guards(spark):
    from zeek_duckdb_spark.operators.similarity import kcenter_select

    # only 2 distinct points: selection stops early instead of padding
    df = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [0.0, 1.0]), (3, [5.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    sel = kcenter_select(df, 3)
    assert [i for i, _ in sel] == [1, 3]
    with pytest.raises(ValueError, match="k must"):
        kcenter_select(df, 0)
    with pytest.raises(ValueError, match="empty"):
        kcenter_select(df.filter("vec_id < 0"), 2)


def test_kcenter_malformed_rows_dropped_and_string_ids(spark):
    """Review-fix regressions: a wrong-length/NaN vector must be
    DROPPED (the null-padded distance fold would otherwise make it win
    every round with a garbage radius), and string ids must work (the
    old tie-break negated the id, which CAST-errors under ANSI)."""
    from zeek_duckdb_spark.operators.similarity import kcenter_select

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [10.0, 10.0]), (3, [5.0]),
         (4, [float("nan"), 1.0]), (5, [1.0, None])],
        "vec_id long, embedding array<double>",
    )
    sel = kcenter_select(df, 2)
    assert [i for i, _ in sel] == [1, 2]  # malformed 3/4/5 never win
    assert sel[1][1] == pytest.approx((200.0) ** 0.5, rel=0.02)
    s = spark.createDataFrame(
        [("b2", [0.0, 0.0]), ("a1", [0.0, 0.0]), ("c3", [9.0, 9.0])],
        "vec_id string, embedding array<double>",
    )
    got = kcenter_select(s, 2)
    assert [i for i, _ in got] == ["a1", "c3"]  # min-id anchor, ties low


@pytest.mark.slow
def test_kcenter_coreset_composition_and_covering_radius(spark):
    """Coreset mode (sample_fraction): the k greedy rounds scan only a
    deterministic sample, every selected id comes FROM that sample,
    and on planted modes the full-corpus covering radius stays within
    2x of direct greedy (the Gonzalez 2-approx composes when the
    sample hits every mode).  kcenter_covering_radius measures the
    radius with one zero-shuffle pass and matches numpy."""
    import numpy as np

    from zeek_duckdb_spark.operators.pipeline import deterministic_sample
    from zeek_duckdb_spark.operators.similarity import (
        kcenter_covering_radius,
        kcenter_select,
    )

    rng = np.random.default_rng(11)
    DIM = 12
    centres = rng.normal(0, 15, (6, DIM))
    pts = np.concatenate(
        [c + rng.normal(0, 0.4, (400, DIM)) for c in centres]
    )
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(pts)],
        "vec_id long, embedding array<double>",
    ).repartition(8)

    direct = kcenter_select(df, 6)
    coreset = kcenter_select(df, 6, sample_fraction=0.25, seed=3)
    assert len(coreset) == 6
    # the loop ran on the sample ONLY: every pick is a sample member
    sample_ids = {
        r.vec_id
        for r in deterministic_sample(df, "vec_id", 0.25, 3)
        .select("vec_id")
        .collect()
    }
    assert {i for i, _ in coreset} <= sample_ids
    assert len(sample_ids) < 0.4 * len(pts)  # genuinely sublinear scan

    r_direct = kcenter_covering_radius(df, [i for i, _ in direct])
    r_coreset = kcenter_covering_radius(df, [i for i, _ in coreset])
    assert 0 < r_coreset <= 2.0 * r_direct  # the 2-approx composes

    # covering radius == the numpy value (same float64 geometry)
    ids = [int(i) for i, _ in direct]
    C = pts[ids]
    d2 = ((pts[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).min(axis=1)
    assert r_direct == pytest.approx(float(np.sqrt(d2.max())), rel=1e-9)

    # key-hash determinism: same fraction/seed on ANY partitioning
    assert (
        kcenter_select(df.repartition(3), 6, sample_fraction=0.25, seed=3)
        == coreset
    )
    with pytest.raises(ValueError, match="sample_fraction"):
        kcenter_select(df, 2, sample_fraction=0.0)
    with pytest.raises(ValueError, match="not found"):
        kcenter_covering_radius(df, [99999999])
    with pytest.raises(ValueError, match="ids is empty"):
        kcenter_covering_radius(df, [])
