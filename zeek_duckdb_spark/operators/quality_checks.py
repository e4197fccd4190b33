"""Declarative data-quality validation — the pre-flight gate a corpus
or landed log table passes before a cluster-days pipeline run ingests
it (the 'expectations' pattern from data-quality tooling, expressed as
ONE Spark aggregate pass).

``check_rules`` evaluates every rule in a single scan: each rule
becomes one conditional-count aggregate expression, so 20 rules cost
exactly one job with map-side partials — never a scan per rule.
Uniqueness rules need grouping, so they run as their own aggregate
(one extra shuffle per DISTINCT key-set, the relational minimum).

Rules (dicts, ``{"rule": ..., "col": ...}``):

- ``not_null``                 — col must never be NULL
- ``unique``   (+ ``cols``)    — column (or column set) has no dup keys
- ``in_range`` (+ ``min``/``max``, inclusive) — NULLs don't violate
- ``matches``  (+ ``pattern``) — full-match Java regex; NULLs pass
- ``in_set``   (+ ``values``)  — membership; NULLs pass
- ``max_null_frac`` (+ ``frac``) — NULL rate at most ``frac``
- ``expr``     (+ ``sql``)     — arbitrary SQL boolean; rows where it
  is false or NULL violate

Returns one row per rule: (rule, col, violations, n_rows, frac,
passed).  ``assert_rules`` raises with the failing rules formatted —
the loud gate for pipeline entry points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["check_rules", "assert_rules"]


def _violation_expr(df: DataFrame, rule: dict):
    kind = rule.get("rule")
    c = rule.get("col")
    if kind == "not_null":
        return F.col(c).isNull()
    if kind == "in_range":
        lo, hi = rule.get("min"), rule.get("max")
        if lo is None and hi is None:
            raise ValueError("in_range needs min and/or max")
        v = F.lit(False)
        if lo is not None:
            v = v | (F.col(c) < F.lit(lo))
        if hi is not None:
            v = v | (F.col(c) > F.lit(hi))
        return F.when(F.col(c).isNull(), F.lit(False)).otherwise(v)
    if kind == "matches":
        ok = F.col(c).rlike("^(?:" + rule["pattern"] + ")$")
        return F.when(F.col(c).isNull(), F.lit(False)).otherwise(~ok)
    if kind == "in_set":
        vals = rule.get("values")
        if not vals:
            raise ValueError("in_set needs non-empty values")
        return F.when(F.col(c).isNull(), F.lit(False)).otherwise(
            ~F.col(c).isin(*list(vals))
        )
    if kind == "expr":
        ok = F.expr(rule["sql"])
        return ~F.coalesce(ok, F.lit(False))
    if kind == "max_null_frac":
        return F.col(c).isNull()  # thresholded against frac afterwards
    raise ValueError(f"check_rules: unknown rule '{kind}'")


def check_rules(df: DataFrame, rules: list[dict]) -> DataFrame:
    """One row per rule: (rule, col, violations, n_rows, frac, passed).

    Scan shape: all non-uniqueness rules fold into ONE aggregate over
    the table; each ``unique`` rule adds one groupBy over its key set
    (counting keys with count > 1 — the duplicate-KEY count, and the
    excess-row count as violations)."""
    if not rules:
        raise ValueError("check_rules: rules must be non-empty")
    spark = df.sparkSession
    scalar = [r for r in rules if r.get("rule") != "unique"]
    uniq = [r for r in rules if r.get("rule") == "unique"]

    out = None
    if scalar:
        aggs = [F.count("*").alias("__n")]
        for i, r in enumerate(scalar):
            aggs.append(
                F.sum(_violation_expr(df, r).cast("long")).alias(f"__v{i}")
            )
        row = df.agg(*aggs).collect()[0]
        n = int(row["__n"])
        recs = []
        for i, r in enumerate(scalar):
            v = int(row[f"__v{i}"] or 0)
            frac = round(v / n, 6) if n else 0.0
            if r["rule"] == "max_null_frac":
                # threshold against the UNROUNDED rate: a 6dp-rounded
                # compare would pass a rate up to 5e-7 over the limit
                passed = (v / n if n else 0.0) <= float(r["frac"])
            else:
                passed = v == 0
            recs.append(
                (r["rule"], str(r.get("col") or r.get("sql")), v, n, frac, passed)
            )
        out = spark.createDataFrame(
            recs,
            "rule string, col string, violations long, n_rows long, "
            "frac double, passed boolean",
        )
    n_cached = int(row["__n"]) if scalar else None
    for r in uniq:
        cols = r.get("cols") or [r["col"]]
        dup = (
            df.groupBy(*[F.col(c) for c in cols])
            .agg(F.count("*").alias("__c"))
            .filter(F.col("__c") > 1)
            .agg(
                F.count("*").alias("dup_keys"),
                F.coalesce(F.sum(F.col("__c") - 1), F.lit(0)).alias("excess"),
            )
            .collect()[0]
        )
        # row count comes from the scalar pass when one ran — never a
        # second full-table scan per uniqueness rule
        n = n_cached if n_cached is not None else df.count()
        n_cached = n
        v = int(dup["excess"])
        rec = spark.createDataFrame(
            [("unique", ",".join(cols), v, n, round(v / n, 6) if n else 0.0,
              v == 0)],
            "rule string, col string, violations long, n_rows long, "
            "frac double, passed boolean",
        )
        out = rec if out is None else out.unionByName(rec)
    return out


def assert_rules(df: DataFrame, rules: list[dict]) -> None:
    """Raise ValueError naming every failed rule (violation counts and
    fractions included); no-op when all pass."""
    failed = [r for r in check_rules(df, rules).collect() if not r.passed]
    if failed:
        lines = "; ".join(
            f"{r.rule}({r.col}): {r.violations}/{r.n_rows} ({r.frac:.2%})"
            for r in failed
        )
        raise ValueError(f"data-quality rules failed: {lines}")
