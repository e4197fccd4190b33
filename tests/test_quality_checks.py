"""check_rules / assert_rules: per-rule counts vs hand-computed truth,
the one-aggregate plan contract, and the loud gate."""

import pytest

from zeek_duckdb_spark.operators.quality_checks import assert_rules, check_rules
from zeek_duckdb_spark.plans import audit


@pytest.fixture()
def d(spark):
    return spark.createDataFrame(
        [
            (1, "a@x.com", 10, "en"),
            (2, None, 5, "en"),
            (3, "bad-email", 200, "xx"),
            (4, "b@y.org", None, "de"),
            (4, "c@z.io", 7, "fr"),
        ],
        "id long, email string, score int, lang string",
    )


def test_rule_counts_match_hand_truth(spark, d):
    rules = [
        {"rule": "not_null", "col": "email"},
        {"rule": "in_range", "col": "score", "min": 0, "max": 100},
        {"rule": "matches", "col": "email", "pattern": r"[^@]+@[^@]+\.[a-z]+"},
        {"rule": "in_set", "col": "lang", "values": ["en", "de", "fr"]},
        {"rule": "max_null_frac", "col": "score", "frac": 0.3},
        {"rule": "expr", "sql": "id > 0"},
        {"rule": "unique", "col": "id"},
    ]
    got = {r.rule + ":" + r.col: r for r in check_rules(d, rules).collect()}
    assert got["not_null:email"].violations == 1
    assert got["in_range:score"].violations == 1  # 200; NULL passes
    assert got["matches:email"].violations == 1  # bad-email; NULL passes
    assert got["in_set:lang"].violations == 1  # xx
    nf = got["max_null_frac:score"]
    assert nf.violations == 1 and nf.frac == 0.2 and nf.passed
    assert got["expr:id > 0"].violations == 0 and got["expr:id > 0"].passed
    u = got["unique:id"]
    assert u.violations == 1 and not u.passed  # id=4 twice -> 1 excess row
    assert all(r.n_rows == 5 for r in got.values())


def test_scalar_rules_are_one_aggregate_pass(spark, d):
    # plan shape: N scalar rules -> one aggregate over one scan
    rules = [
        {"rule": "not_null", "col": "email"},
        {"rule": "in_range", "col": "score", "min": 0},
        {"rule": "matches", "col": "lang", "pattern": "[a-z]{2}"},
    ]
    aggs = [pytest.importorskip("pyspark.sql.functions").count("*")]
    _ = aggs
    from zeek_duckdb_spark.operators import quality_checks as qc
    from pyspark.sql import functions as F

    exprs = [F.count("*").alias("__n")] + [
        F.sum(qc._violation_expr(d, r).cast("long")).alias(f"__v{i}")
        for i, r in enumerate(rules)
    ]
    plan = audit.physical_plan(d.agg(*exprs))
    assert plan.count("Scan ") <= 1
    assert audit.num_shuffles(d.agg(*exprs)) <= 1


def test_assert_rules_raises_with_names(spark, d):
    with pytest.raises(ValueError, match="not_null\\(email\\): 1/5"):
        assert_rules(d, [{"rule": "not_null", "col": "email"},
                         {"rule": "expr", "sql": "id > 0"}])
    assert_rules(d, [{"rule": "expr", "sql": "id > 0"}])  # passes silently


def test_rule_validation_errors(spark, d):
    with pytest.raises(ValueError, match="unknown rule"):
        check_rules(d, [{"rule": "bogus", "col": "id"}])
    with pytest.raises(ValueError, match="non-empty"):
        check_rules(d, [])
    with pytest.raises(ValueError, match="in_range"):
        check_rules(d, [{"rule": "in_range", "col": "score"}])
    with pytest.raises(ValueError, match="in_set"):
        check_rules(d, [{"rule": "in_set", "col": "lang", "values": []}])


def test_multi_column_uniqueness(spark):
    d = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "b"), (2, "a")], "k long, s string"
    )
    got = check_rules(d, [{"rule": "unique", "cols": ["k", "s"]}]).collect()[0]
    assert got.col == "k,s" and got.violations == 1 and not got.passed
