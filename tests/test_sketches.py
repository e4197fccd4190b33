"""heavy_hitters (Misra–Gries two-pass exact + one-pass bounds):
DuckDB differential on skewed data, the superset guarantee at tight
capacity, one-pass bound containment, NULL policy, and the
broadcast-semi-join plan shape of the exact second pass."""

import collections
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from zeek_duckdb_spark.operators.sketches import heavy_hitters

SF = "/root/testdata/sf0.001"


def _zipf_rows(n=20_000, n_keys=2_000, seed=7):
    """Skewed (zipf-ish) key stream with a deterministic shuffle —
    heavy keys are spread across partitions, the adversarial layout
    for a per-partition sketch."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        # rank ~ zipf: key j picked with weight 1/(j+1)
        r = rng.random()
        j = int(n_keys ** r) - 1
        rows.append((f"k{j:05d}",))
    rng.shuffle(rows)
    return rows


@pytest.fixture(scope="module")
def skewed(spark):
    return spark.createDataFrame(_zipf_rows(), "url string").repartition(8)


def test_exact_matches_duckdb(spark, skewed):
    got = [(r.url, r.n) for r in heavy_hitters(skewed, "url", k=20).collect()]
    con = duckdb.connect()
    con.register("t", skewed.toPandas())
    want = con.execute(
        "SELECT url, count(*) AS n FROM t GROUP BY url "
        "ORDER BY n DESC, url ASC LIMIT 20"
    ).fetchall()
    assert got == [(u, int(n)) for u, n in want]


def test_exact_on_parquet_docs(spark):
    # real table: most frequent languages over documents — tiny key
    # space, so any capacity holds the guarantee; exact equality
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = [(r.lang, r.n) for r in heavy_hitters(docs, "lang", k=5).collect()]
    want = duckdb.connect().execute(
        f"SELECT lang, count(*) AS n FROM "
        f"read_parquet('{SF}/documents.parquet') WHERE lang IS NOT NULL "
        f"GROUP BY lang ORDER BY n DESC, lang ASC LIMIT 5"
    ).fetchall()
    assert got == [(u, int(n)) for u, n in want]


def test_guarantee_at_tight_capacity(spark):
    # one key holds 30% of a 10k-row stream; capacity 16 (threshold
    # N/17 ~ 588 << 3000) must surface it with its exact count even
    # though thousands of distinct tail keys churn the summary
    rng = random.Random(11)
    rows = [("hot",)] * 3_000 + [(f"t{rng.randrange(5_000):04d}",) for _ in range(7_000)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "url string").repartition(8)
    truth = collections.Counter(r[0] for r in rows)
    got = heavy_hitters(df, "url", k=1, capacity=16).collect()
    assert (got[0].url, got[0].n) == ("hot", truth["hot"])


def test_one_pass_bounds_contain_truth(spark, skewed):
    truth = collections.Counter(r[0] for r in _zipf_rows())
    out = heavy_hitters(skewed, "url", k=30, exact=False).collect()
    assert len(out) == 30
    for r in out:
        assert r.n_lo <= truth[r.url] <= r.n_hi
    # the true top key must rank first: its undercount is bounded by
    # the decrement budget, far below its lead here
    top_true = max(truth.items(), key=lambda kv: (kv[1], kv[0]))[0]
    assert out[0].url == top_true


def test_nulls_dropped_and_errors(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",), (None,)], "url string"
    )
    got = [(r.url, r.n) for r in heavy_hitters(df, "url", k=10).collect()]
    assert got == [("a", 2), ("b", 1)]
    with pytest.raises(ValueError, match="k must be >= 1"):
        heavy_hitters(df, "url", k=0)
    with pytest.raises(ValueError, match="capacity must be >= k"):
        heavy_hitters(df, "url", k=10, capacity=5)


def test_exact_pass2_plan_shape(spark, skewed):
    # JVM path: no join at all — an In/InSet filter restricts the scan,
    # then a candidate-sized hash aggregate; and no Python anywhere
    plan = heavy_hitters(skewed, "url", k=10)._jdf.queryExecution().toString()
    assert "Join" not in plan
    assert ("dynamicpruning" in plan or " IN " in plan or "INSET" in plan.upper())
    assert "MapInPandas" not in plan and "SortMergeJoin" not in plan
    # fallback path (capacity past freqItems' support floor): candidate
    # restriction is a broadcast left-semi join, never sort-merge
    plan2 = (
        heavy_hitters(skewed, "url", k=10, capacity=20_000)
        ._jdf.queryExecution().toString()
    )
    assert "BroadcastHashJoin" in plan2 and "LeftSemi" in plan2
    assert "SortMergeJoin" not in plan2


def test_exact_pass1_stays_in_jvm(spark, skewed):
    # the exact mode's candidate pass is df.stat.freqItems — pure JVM;
    # the plan must carry NO Python evaluation node anywhere
    plan = heavy_hitters(skewed, "url", k=10)._jdf.queryExecution().toString()
    assert "MapInPandas" not in plan and "PythonUDF" not in plan


def test_exact_large_capacity_fallback(spark, skewed):
    # capacity+1 > 10_000 puts support under Spark's 1e-4 freqItems
    # floor -> Python MG pass 1; results must still equal plain groupBy
    got = [
        (r.url, r.n)
        for r in heavy_hitters(skewed, "url", k=15, capacity=20_000).collect()
    ]
    want = [
        (r.url, r.n)
        for r in skewed.filter("url IS NOT NULL")
        .groupBy("url")
        .count()
        .withColumnRenamed("count", "n")
        .orderBy(F.desc("n"), F.asc("url"))
        .limit(15)
        .collect()
    ]
    assert got == want


def test_integer_key_type(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (1,), (1,), (3,), (2,)], "k long"
    )
    got = [(r.k, r.n) for r in heavy_hitters(df, "k", k=2).collect()]
    assert got == [(1, 3), (2, 2)]


# ---- property-based: random streams, random capacities -------------
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_key_st = st.sampled_from([f"k{i}" for i in range(40)])


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(_key_st, min_size=1, max_size=300),
    capacity=st.integers(min_value=3, max_value=50),
    parts=st.integers(min_value=1, max_value=6),
)
@pytest.mark.slow
def test_property_bounds_and_exactness(spark, vals, capacity, parts):
    """For ANY stream / capacity / partitioning: exact counts are
    truly exact for every emitted key, one-pass bounds contain the
    truth, and any key with count > N/(capacity+1) appears in exact
    mode (the MG guarantee)."""
    truth = collections.Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], "url string").repartition(parts)
    k = min(capacity, 10)
    got = heavy_hitters(df, "url", k=k, capacity=capacity).collect()
    for r in got:
        assert r.n == truth[r.url]  # exact counts, always
    thresh = len(vals) / (capacity + 1)
    guaranteed = {u for u, c in truth.items() if c > thresh}
    top_guaranteed = sorted(
        guaranteed, key=lambda u: (-truth[u], u)
    )[:k]
    assert set(top_guaranteed) <= {r.url for r in got}
    approx = heavy_hitters(df, "url", k=k, capacity=capacity, exact=False).collect()
    for r in approx:
        assert r.n_lo <= truth[r.url] <= r.n_hi


# ---------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------


def _cm_skewed(spark):
    rows = []
    for i, reps in [(1, 400), (2, 120), (3, 40)]:
        rows += [(f"hot{i}",)] * reps
    rows += [(f"cold{i}",) for i in range(200)]
    return spark.createDataFrame(rows, "url string")


def test_cm_never_undershoots_and_exact_when_wide(spark):
    from zeek_duckdb_spark.operators.sketches import cm_build, cm_estimate

    df = _cm_skewed(spark)
    true = {r.url: r.n for r in df.groupBy("url").agg(F.count("*").alias("n")).collect()}
    model = cm_build(df, "url", width=1 << 14, depth=4)
    assert model["n"] == sum(true.values())
    keys = df.select("url").distinct()
    est = {r.url: r.est for r in cm_estimate(keys, "url", model).collect()}
    # 203 keys in 16384 columns x 4 independent rows: the min over
    # rows is collision-free here, so estimates are EXACT
    assert est == true


def test_cm_overestimate_bounded_when_narrow(spark):
    from zeek_duckdb_spark.operators.sketches import cm_build, cm_estimate

    df = _cm_skewed(spark)
    true = {r.url: r.n for r in df.groupBy("url").agg(F.count("*").alias("n")).collect()}
    model = cm_build(df, "url", width=16, depth=4)
    est = {r.url: r.est for r in cm_estimate(df.select("url").distinct(), "url", model).collect()}
    n = model["n"]
    import math
    eps = math.e / 16
    over = [est[k] - true[k] for k in true]
    assert all(o >= 0 for o in over)                 # never undershoots
    assert sum(o <= eps * n for o in over) >= len(over) * 0.9


def test_cm_counts_match_duckdb_exactly(spark):
    import duckdb

    from zeek_duckdb_spark.operators.hashutil import md5_long_sql
    from zeek_duckdb_spark.operators.sketches import cm_counts_df

    df = _cm_skewed(spark)
    w, d = 1 << 10, 3
    got = {
        (r.row, r.pos): r.cnt for r in cm_counts_df(df, "url", w, d).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(r.url,) for r in df.collect()])
    hashes = " UNION ALL ".join(
        f"SELECT {i} AS row, "
        + md5_long_sql(f"concat_ws(':', '7', 'cm{i}', url)")
        + f" % {w} AS pos FROM t WHERE url IS NOT NULL"
        for i in range(d)
    )
    want = {
        (int(r), int(p)): int(c)
        for r, p, c in con.sql(
            f"WITH h AS ({hashes}) SELECT row, pos, COUNT(*) FROM h GROUP BY 1, 2"
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_cm_deterministic_weighted_null_and_validation(spark):
    from zeek_duckdb_spark.operators.sketches import cm_build, cm_estimate

    df = _cm_skewed(spark)
    a = cm_build(df, "url", width=512, depth=3)
    assert cm_build(df.repartition(13), "url", width=512, depth=3) == a
    # weighted: one row with weight 7 == seven rows of weight 1
    wdf = spark.createDataFrame([("k", 7)], "url string, w int")
    sdf = spark.createDataFrame([("k",)] * 7, "url string")
    mw = cm_build(wdf, "url", width=256, depth=2, weight_col="w")
    ms = cm_build(sdf, "url", width=256, depth=2)
    assert mw == ms
    nulls = spark.createDataFrame([("k",), (None,)], "url string")
    est = cm_estimate(nulls, "url", mw).collect()
    by = {r.url: r.est for r in est}
    assert by["k"] == 7 and by[None] is None
    with pytest.raises(ValueError, match="width"):
        cm_build(df, "url", width=1)
    with pytest.raises(ValueError, match="depth"):
        cm_build(df, "url", depth=0)


def test_cm_estimate_plan_zero_shuffle(spark):
    from zeek_duckdb_spark.operators.sketches import cm_build, cm_estimate

    df = _cm_skewed(spark)
    model = cm_build(df, "url", width=256, depth=2)
    plan = (
        cm_estimate(df.select("url").distinct(), "url", model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "Python" not in plan


def test_cm_merge_equals_combined_build(spark):
    from zeek_duckdb_spark.operators.sketches import cm_build, cm_merge

    rows = [(r.url,) for r in _cm_skewed(spark).collect()]
    a = spark.createDataFrame(rows[:300], "url string")
    b = spark.createDataFrame(rows[300:], "url string")
    df = spark.createDataFrame(rows, "url string")
    ma = cm_build(a, "url", width=512, depth=3)
    mb = cm_build(b, "url", width=512, depth=3)
    assert cm_merge(ma, mb) == cm_build(df, "url", width=512, depth=3)
    with pytest.raises(ValueError, match="width"):
        cm_merge(ma, cm_build(b, "url", width=256, depth=3))
    # deletions are unsupported: negative counters void the min
    # estimator's no-undershoot guarantee, so the merge rejects them
    neg = {**mb, "counts": [[-c for c in row] for row in mb["counts"]]}
    with pytest.raises(ValueError, match="negative counters"):
        cm_merge(ma, neg)


def test_hll_build_merge_estimate(spark, tmp_path):
    from zeek_duckdb_spark.operators.sketches import (
        hll_build,
        hll_estimate,
        hll_merge,
    )

    df = spark.range(20_000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 4211).alias("k")
    )
    exact = {
        r.g: r.n
        for r in df.groupBy("g").agg(F.countDistinct("k").alias("n")).collect()
    }
    est = {
        r.g: r.distinct_est
        for r in hll_estimate(hll_build(df, "k", ("g",))).collect()
    }
    for g, n in exact.items():
        assert abs(est[g] - n) <= max(3, 0.05 * n), (g, est[g], n)
    # merge of per-half sketches == sketch of the union (deterministic
    # bucket state), and it survives a parquet round-trip
    a = df.filter(F.col("id") < 10_000)
    b = df.filter(F.col("id") >= 10_000)
    pa = str(tmp_path / "hll_a")
    hll_build(a, "k", ("g",)).write.parquet(pa)
    landed = spark.read.parquet(pa)
    merged = {
        r.g: r.distinct_est
        for r in hll_estimate(
            hll_merge(landed, hll_build(b, "k", ("g",)), ("g",))
        ).collect()
    }
    full = {
        r.g: r.distinct_est
        for r in hll_estimate(hll_build(df, "k", ("g",))).collect()
    }
    assert merged == full
    # global (ungrouped) form
    tot = hll_estimate(hll_build(df, "k")).first()["distinct_est"]
    assert abs(tot - 4211) <= max(3, 0.05 * 4211)
    # a bare-string group_cols (the natural mistake mirroring key_col
    # params) normalizes to a 1-tuple instead of splatting characters
    # into groupBy('g')... one char at a time
    s = {
        r.g: r.distinct_est
        for r in hll_estimate(hll_build(df, "k", "g")).collect()
    }
    assert s == est
    m = hll_estimate(
        hll_merge(hll_build(a, "k", "g"), hll_build(b, "k", "g"), "g")
    ).count()
    assert m == 3


def test_cm_build_rejects_negative_weights(spark):
    """Review-fix regression: negative build weights silently make the
    min estimator undershoot (counters can still look non-negative),
    so cm_build rejects them up front like cm_merge does."""
    from zeek_duckdb_spark.operators.sketches import cm_build

    df = spark.createDataFrame(
        [("a", 5), ("a", -2), ("b", 3)], "url string, w int"
    )
    with pytest.raises(ValueError, match="negative weights"):
        cm_build(df, "url", width=64, depth=2, weight_col="w")


def test_cm_median_signed_deletes_exact_when_wide(spark):
    """CM-median (the Cormode-Muthukrishnan signed regime): a deletion
    batch built with allow_signed=True merges into the standing sketch
    (the windowed-stream expiry path); estimator='median' tracks the
    NET counts, while the min path refuses the signed sketch — its
    one-sided no-undershoot bound is void.  Wide sketch: probes are
    collision-free, so the medians are EXACT nets."""
    from zeek_duckdb_spark.operators.sketches import (
        cm_build,
        cm_estimate,
        cm_merge,
    )

    ins = _cm_skewed(spark)
    true = {
        r.url: r.n
        for r in ins.groupBy("url").agg(F.count("*").alias("n")).collect()
    }
    dels = spark.createDataFrame(
        [("hot1", -100), ("hot3", -40)], "url string, w int"
    )
    m_ins = cm_build(ins, "url", width=1 << 14, depth=5)
    m_del = cm_build(
        dels, "url", width=1 << 14, depth=5, weight_col="w",
        allow_signed=True,
    )
    assert m_ins["signed"] is False and m_del["signed"] is True
    merged = cm_merge(m_ins, m_del)
    assert merged["signed"] is True
    net = {**true, "hot1": true["hot1"] - 100, "hot3": 0}
    keys = ins.select("url").distinct()
    est = {
        r.url: r.est
        for r in cm_estimate(
            keys, "url", merged, estimator="median"
        ).collect()
    }
    assert est == net
    with pytest.raises(ValueError, match="median"):
        cm_estimate(keys, "url", merged)  # min refuses signed
    # median reads unsigned sketches too (weaker: still >= true here)
    est_u = {
        r.url: r.est
        for r in cm_estimate(
            keys, "url", m_ins, estimator="median"
        ).collect()
    }
    assert all(est_u[k] >= true[k] for k in true)
    with pytest.raises(ValueError, match="estimator"):
        cm_estimate(keys, "url", m_ins, estimator="avg")
    # min-path behavior on unsigned sketches is UNCHANGED
    est_min = {
        r.url: r.est for r in cm_estimate(keys, "url", m_ins).collect()
    }
    assert est_min == true


def test_cm_median_two_sided_bound_when_narrow(spark):
    """Interleaved inserts + deletes on a NARROW signed sketch: the
    CM-median error is TWO-SIDED (under- and overshoot both possible)
    but stays within 3e/width * ||f||_1 for the large majority of keys
    (the 1 - e^-depth/4 regime)."""
    import math

    from zeek_duckdb_spark.operators.sketches import (
        cm_build,
        cm_estimate,
        cm_merge,
    )

    ins = _cm_skewed(spark)
    dels = spark.createDataFrame(
        [("hot1", -100), ("hot2", -20), ("hot3", -40)], "url string, w int"
    )
    width, depth = 32, 5
    merged = cm_merge(
        cm_build(ins, "url", width=width, depth=depth),
        cm_build(
            dels, "url", width=width, depth=depth, weight_col="w",
            allow_signed=True,
        ),
    )
    true = {
        r.url: r.n
        for r in ins.groupBy("url").agg(F.count("*").alias("n")).collect()
    }
    net = {
        **true,
        "hot1": true["hot1"] - 100,
        "hot2": true["hot2"] - 20,
        "hot3": 0,
    }
    est = {
        r.url: r.est
        for r in cm_estimate(
            ins.select("url").distinct(), "url", merged,
            estimator="median",
        ).collect()
    }
    bound = 3 * math.e / width * sum(abs(v) for v in net.values())
    errs = [abs(est[k] - net[k]) for k in net]
    assert sum(e <= bound for e in errs) >= len(errs) * 0.9


def test_heavy_hitters_one_pass_single_scan(spark):
    """Review-fix regression: exact=False must scan the corpus ONCE —
    the budget and merged branches read a materialized sketch, not two
    re-executions of the mapInPandas pass.  Proven via the Python-UDF
    accumulator-free route: count scan executions with an accumulator."""
    from zeek_duckdb_spark.operators.sketches import heavy_hitters

    acc = spark.sparkContext.accumulator(0)

    def counting_rows():
        rows = [("k%d" % (i % 50),) for i in range(5000)]
        return spark.createDataFrame(rows, "url string")

    df = counting_rows()

    def bump(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    tapped = df.mapInPandas(bump, schema="url string")
    out = heavy_hitters(tapped, "url", k=5, capacity=32, exact=False)
    rows = out.collect()
    assert len(rows) == 5 and rows[0].n_lo <= rows[0].n_hi
    # every input row crossed the tap exactly once
    assert acc.value == 5000


def test_cm_allow_signed_is_a_regime_declaration(spark):
    """allow_signed declares the signed-update regime; it takes effect
    only when a weight_col exists (unit weights cannot be negative, so
    an unweighted allow_signed build stays unsigned and keeps the
    stronger min estimator).  A value scan deciding the flag would
    race a second evaluation of a non-deterministic df against the
    counts job — the declaration is the only consistent contract."""
    from zeek_duckdb_spark.operators.sketches import cm_build, cm_estimate

    ins = _cm_skewed(spark)
    true = {
        r.url: r.n
        for r in ins.groupBy("url").agg(F.count("*").alias("n")).collect()
    }
    # unweighted build with allow_signed=True: no-op, never signed
    m_unit = cm_build(ins, "url", width=1 << 14, depth=5, allow_signed=True)
    assert m_unit["signed"] is False
    keys = ins.select("url").distinct()
    est = {r.url: r.est for r in cm_estimate(keys, "url", m_unit).collect()}
    assert est == true  # min path still serves, exact at this width
    # weighted + allow_signed: signed by declaration, even when the
    # batch happens to contain no negative weight
    w_pos = spark.createDataFrame(
        [("hot1", 3), ("hot2", 0), ("cold0", 1)], "url string, w int"
    )
    m_pos = cm_build(
        w_pos, "url", width=1 << 14, depth=5, weight_col="w",
        allow_signed=True,
    )
    assert m_pos["signed"] is True
    with pytest.raises(ValueError, match="median"):
        cm_estimate(w_pos.select("url"), "url", m_pos)  # min refuses
    est_p = {
        r.url: r.est
        for r in cm_estimate(
            w_pos.select("url").distinct(), "url", m_pos,
            estimator="median",
        ).collect()
    }
    assert est_p == {"hot1": 3, "hot2": 0, "cold0": 1}
    # a genuinely negative batch without the declaration still raises
    dels = spark.createDataFrame([("hot1", -1)], "url string, w int")
    with pytest.raises(ValueError, match="allow_signed"):
        cm_build(dels, "url", width=1 << 14, depth=5, weight_col="w")
