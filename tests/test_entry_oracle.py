"""Local mini-harness mirroring the driver's t2 correctness gate:
run every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same sf0.001 parquet, compare row count + column names
+ order-insensitive values.  Queries without an oracle get a rows-run
smoke check."""

import datetime
import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, int):
        return repr(v)
    if v is None:
        return "<null>"
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


@pytest.fixture(scope="module")
def ora():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


QUERIES = dict(entry_mod.queries())
ORACLES = dict(entry_mod.oracle_sql())
# rotated-out driver slots keep full local oracle coverage
QUERIES.update(entry_mod.extra_queries())
ORACLES.update(entry_mod.extra_oracle_sql())


def test_driver_dict_budget():
    """The driver checks only the first 50 queries() entries; every
    entry must have an oracle (zeek_scan's reads its re-landed
    parquet, so since round 6 even it is hash-grade)."""
    q = entry_mod.queries()
    assert len(q) == 50
    assert [k for k in q if k not in entry_mod.oracle_sql()] == []


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, ora, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    if name not in ORACLES:
        # rows-only check (driver's weaker path)
        assert spark_rows is not None
        return

    res = ora.sql(ORACLES[name])
    ora_cols = [c.lower() for c in res.columns]
    ora_rows = res.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(ora_cols), (
        f"{name}: column mismatch {spark_cols} vs {res.columns}"
    )
    assert len(spark_rows) == len(ora_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(ora_rows)}"
    )
    a = _normalize(spark_rows, [c.lower() for c in spark_cols])
    b = _normalize(ora_rows, ora_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first value mismatch {mismatches[:3]}"


def test_zeek_scan_landing_golden(spark):
    """Golden pin for the hash-grade zeek_scan entry: the re-landed
    reference corpus totals (27 rows / 43 conns_opened across 24
    files, one host) match the reference's sqllogictest values
    (/root/reference/test/sql/zeek.test)."""
    df = QUERIES["zeek_scan"](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) == 24                               # one per file
    assert sum(r.n for r in rows) == 27
    assert sum(r.conns_opened for r in rows) == 43
    assert {r.n_hosts for r in rows} == {1}
    # the landing file exists where the oracle reads it
    assert os.path.exists(entry_mod._ZEEK_LANDING)
