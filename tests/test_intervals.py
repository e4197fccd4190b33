"""DuckDB-style interval text rendering (functions/intervals.py): the
reference's golden strings (ref test/sql/zeek.test:79-89) on the real
fixtures, plus a randomized differential against DuckDB's own renderer
(DuckDB builds Zeek intervals via Interval::FromMicro — day split from
the microsecond total — ref src/zeek_scanner.cpp:28-31)."""

import duckdb
import pytest

from pyspark.sql import functions as F

from zeek_duckdb_spark.functions.intervals import (
    interval_text,
    register_interval_functions,
)
from zeek_duckdb_spark.sources.zeek import read_zeek

REF = "/root/reference/data"

DAY_US = 86_400_000_000


def _duckdb_text(micros: int) -> str:
    """What DuckDB prints for a Zeek interval of this many microseconds
    (FromMicro splits whole days, truncating toward zero)."""
    d = int(micros / DAY_US)
    rest = micros - d * DAY_US
    return duckdb.sql(
        f"SELECT CAST((INTERVAL '{d} days' + to_microseconds({rest})) AS VARCHAR)"
    ).fetchone()[0]


def _itv_us(us_col):
    # exact micros -> interval (no seconds-double round trip; the scan's
    # own text->double path is covered by the golden-string test)
    return F.make_dt_interval(
        F.lit(0), F.lit(0), F.lit(0), us_col.cast("decimal(20,0)") / F.lit(1000000)
    )


def test_reference_golden_strings(spark):
    # ref test/sql/zeek.test:79-83
    kh = read_zeek(
        spark,
        f"{REF}/known_hosts_20260116_00.00.00-01.00.00-0500.log.gz",
        inet=False,
    )
    r = kh.select(
        interval_text("duration").alias("d"),
        interval_text("last_active_interval").alias("l"),
    ).first()
    assert (r.d, r.l) == ("00:05:23.12666", "01:04:55.038597")

    # ref test/sql/zeek.test:85-89 — 86400 s renders as '1 day'
    dhcp = read_zeek(spark, f"{REF}/dhcp.log.gz", inet=False)
    assert dhcp.select(interval_text("lease_time").alias("t")).first().t == "1 day"


def test_differential_vs_duckdb(spark):
    import random

    rng = random.Random(20260814)
    micros = [0, 1, -1, DAY_US, -DAY_US, DAY_US + 1, 2 * DAY_US, 59_999_999]
    micros += [rng.randrange(-3 * DAY_US, 3 * DAY_US) for _ in range(200)]
    df = spark.createDataFrame([(m,) for m in micros], "us long")
    # the Column expression and the SQL-language UDF are maintained as
    # two renderings of the same spec — run BOTH over every case so
    # they can never silently diverge from each other or from DuckDB
    register_interval_functions(spark)
    got = df.select(
        "us",
        interval_text(_itv_us(F.col("us"))).alias("t"),
        F.expr(
            "zeek_interval_text(make_dt_interval(0, 0, 0, "
            "CAST(us AS DECIMAL(20,0)) / 1000000))"
        ).alias("t_sql"),
    ).collect()
    for r in got:
        want = _duckdb_text(r.us)
        assert r.t == want, r.us
        assert r.t_sql == want, r.us


def test_sql_registration_and_null(spark):
    register_interval_functions(spark)
    r = spark.sql(
        "SELECT zeek_interval_text(INTERVAL '2 03:00:00.100' DAY TO SECOND) a, "
        "zeek_interval_text(CAST(NULL AS INTERVAL DAY TO SECOND)) b"
    ).first()
    assert r.a == "2 days 03:00:00.1"
    assert r.b is None


def test_stays_jvm_side(spark):
    from zeek_duckdb_spark.plans import audit

    df = spark.range(10).select(_itv_us(F.col("id") * F.lit(1000000)).alias("itv"))
    plan = audit.physical_plan(df.select(interval_text("itv")))
    assert "Python" not in plan  # no UDF eval — pure codegen expressions


def test_property_differential_vs_duckdb(spark):
    from hypothesis import given, settings, strategies as st

    collected = []

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=-30 * DAY_US, max_value=30 * DAY_US))
    def gather(us):
        collected.append(us)

    gather()
    # one Spark job over all generated cases (per-example jobs would
    # take minutes); DuckDB rendering checked per row
    df = spark.createDataFrame([(m,) for m in set(collected)], "us long")
    for r in df.select("us", interval_text(_itv_us(F.col("us"))).alias("t")).collect():
        assert r.t == _duckdb_text(r.us), r.us
