"""Local mini-harness mirroring the driver's t2 correctness gate:
run every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same sf0.001 parquet, compare row count + column names
+ order-insensitive values + CANONICAL ARROW DTYPES.  Queries without
an oracle get a rows-run smoke check.

The dtype gate exists because the driver's value hash is
TYPE-sensitive while this harness's cell normalization is not: in
round 11 an oracle ``SUM(...)`` left uncast returned DuckDB HUGEINT
(arrow ``decimal128(38,0)``) against Spark int64 — values equal,
driver hash red, local harness green (``repr(int)`` stringification
hid the class).  Both sides now surface an Arrow schema (DuckDB via
``fetch_arrow_table``, Spark via its Arrow type mapping) and each
column pair must agree on a canonical dtype family: int widths and
timestamp tz/unit are DELIBERATELY pooled (the driver's hash
normalizes values, not storage widths — every historically
driver-green row mixes them freely), while decimal-vs-int,
float-vs-int, string-vs-anything etc. FAIL.  The round-11 miss is
pinned as a regression test below."""

import datetime
import math
import os

import duckdb
import pyarrow as pa
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


def _canon_arrow(t: pa.DataType):
    """Canonical dtype family for an Arrow type — the pooling the
    driver's type-sensitive hash is known to tolerate (int widths,
    signedness, timestamp tz/unit, string/binary largeness) and
    NOTHING else; decimal is its own family so decimal-vs-int fails."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return ("list", _canon_arrow(t.value_type))
    if pa.types.is_struct(t):
        return (
            "struct",
            tuple(
                (t.field(i).name.lower(), _canon_arrow(t.field(i).type))
                for i in range(t.num_fields)
            ),
        )
    if pa.types.is_null(t):
        return "null"
    return str(t)


def _canon_spark(dt):
    """Same canonical families from a Spark SQL type (no extra job:
    this is exactly Spark's own Arrow type mapping, folded)."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.ArrayType):
        return ("list", _canon_spark(dt.elementType))
    if isinstance(dt, T.StructType):
        return (
            "struct",
            tuple((f.name.lower(), _canon_spark(f.dataType)) for f in dt.fields),
        )
    if isinstance(dt, T.NullType):
        return "null"
    return dt.simpleString()


def _assert_dtypes_match(name, spark_schema, arrow_schema):
    """Column-name-aligned canonical dtype compare (both sides sorted
    by lowercased name, like the driver's hash recipe)."""
    s = {f.name.lower(): _canon_spark(f.dataType) for f in spark_schema.fields}
    o = {
        fld.name.lower(): _canon_arrow(fld.type)
        for fld in arrow_schema
    }
    bad = {
        c: (s[c], o[c])
        for c in sorted(set(s) & set(o))
        if s[c] != o[c]
    }
    assert not bad, (
        f"{name}: canonical dtype mismatch (spark, oracle-arrow): {bad} "
        "— the driver's value hash is type-sensitive; cast the oracle "
        "(or the Spark side) so the families agree"
    )


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
    # ONE execution: the Arrow table carries both the driver-faithful
    # dtypes and the values (fetchall after fetch_arrow_table would
    # re-run the relation)
    ora_arrow = res.fetch_arrow_table()
    ora_rows = list(zip(*(c.to_pylist() for c in ora_arrow.columns)))

    assert sorted(c.lower() for c in spark_cols) == sorted(ora_cols), (
        f"{name}: column mismatch {spark_cols} vs {res.columns}"
    )
    _assert_dtypes_match(name, sdf.schema, ora_arrow.schema)
    assert len(spark_rows) == len(ora_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(ora_rows)}"
    )
    a = _normalize(spark_rows, [c.lower() for c in spark_cols])
    b = _normalize(ora_rows, ora_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first value mismatch {mismatches[:3]}"


def test_harness_catches_uncast_hugeint(spark, ora):
    """Regression pin for the round-11 ``emb_comoments`` driver miss:
    an oracle ``SUM`` over BIGINT products left uncast returns DuckDB
    HUGEINT (arrow decimal128(38,0)) against a Spark int64 — values
    equal, driver hash red.  The Arrow-dtype gate must FAIL that pair
    even though every cell stringifies identically."""
    from pyspark.sql import functions as F

    sdf = spark.range(1).select(F.lit(3).cast("bigint").alias("s_ij"))
    # uncast SUM of BIGINTs -> HUGEINT, the exact r11 shape
    bad = ora.sql(
        "SELECT SUM(x) AS s_ij FROM (VALUES (CAST(1 AS BIGINT)), "
        "(CAST(2 AS BIGINT))) t(x)"
    ).fetch_arrow_table()
    assert pa.types.is_decimal(bad.schema.field("s_ij").type)
    with pytest.raises(AssertionError, match="canonical dtype mismatch"):
        _assert_dtypes_match("regression_hugeint", sdf.schema, bad.schema)
    # and the cast form passes
    good = ora.sql(
        "SELECT CAST(SUM(x) AS BIGINT) AS s_ij FROM (VALUES "
        "(CAST(1 AS BIGINT)), (CAST(2 AS BIGINT))) t(x)"
    ).fetch_arrow_table()
    _assert_dtypes_match("regression_hugeint", sdf.schema, good.schema)


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
