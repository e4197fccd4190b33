"""DuckDB-style interval text rendering for reference-output porting.

The reference materializes Zeek ``interval`` fields as DuckDB
``INTERVAL`` values built by ``Interval::FromMicro``
(ref src/zeek_scanner.cpp:28-31), which splits whole days out of the
microsecond total; DuckDB then renders them as e.g.::

    00:05:23.12666          (trailing fractional zeros trimmed)
    01:04:55.038597
    1 day                   (zero time part omitted)
    2 days 00:00:00.25
    -1 day -01:01:01.5      (sign on BOTH parts)

(golden strings: ref test/sql/zeek.test:79-89).  This engine keeps the
values as Spark ``DayTimeIntervalType`` — value-comparable, but Spark's
own display format differs — so users porting reference output verbatim
get :func:`interval_text`, a pure JVM Column expression producing the
DuckDB text form.  Day split truncates toward zero exactly like
``Interval::FromMicro`` (a -1.5-day interval is ``-1 day -12:00:00``).
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

__all__ = ["interval_text", "register_interval_functions"]


def interval_text(col: Column | str) -> Column:
    """Render a day-time interval column as DuckDB's VARCHAR cast would
    (see module docstring).  NULL in -> NULL out; whole-stage-codegen
    expressions only, no Python execution."""
    itv = F.col(col) if isinstance(col, str) else col
    neg = itv < F.expr("INTERVAL '0' SECOND")
    a = F.when(neg, -itv).otherwise(itv)

    d = F.extract(F.lit("DAY"), a).cast("long")
    h = F.extract(F.lit("HOUR"), a).cast("long")
    m = F.extract(F.lit("MINUTE"), a).cast("long")
    s_dec = F.extract(F.lit("SECOND"), a)  # decimal(8,6), micro-exact
    si = F.floor(s_dec).cast("long")
    frac_us = ((s_dec - si) * F.lit(1000000)).cast("long")

    sign = F.when(neg, F.lit("-")).otherwise(F.lit(""))
    frac_str = F.when(
        frac_us > 0,
        F.concat(
            F.lit("."),
            F.regexp_replace(F.format_string("%06d", frac_us), "0+$", ""),
        ),
    ).otherwise(F.lit(""))
    time_str = F.concat(
        sign, F.format_string("%02d:%02d:%02d", h, m, si), frac_str
    )
    day_str = F.concat(
        sign,
        d.cast("string"),
        F.when(d == 1, F.lit(" day")).otherwise(F.lit(" days")),
    )
    time_zero = (h == 0) & (m == 0) & (si == 0) & (frac_us == 0)

    body = F.when(
        d > 0,
        F.when(time_zero, day_str).otherwise(F.concat(day_str, F.lit(" "), time_str)),
    ).otherwise(time_str)
    return F.when(itv.isNull(), F.lit(None).cast("string")).otherwise(body)


def _expr_sql() -> str:
    """SQL text of :func:`interval_text` over a parameter named ``itv``,
    templated from shared sub-expressions (codegen CSEs the repeats)."""
    neg = "(itv < INTERVAL '0' SECOND)"
    a = f"IF({neg}, -itv, itv)"
    d = f"CAST(extract(DAY FROM {a}) AS BIGINT)"
    h = f"CAST(extract(HOUR FROM {a}) AS BIGINT)"
    m = f"CAST(extract(MINUTE FROM {a}) AS BIGINT)"
    s_dec = f"extract(SECOND FROM {a})"
    si = f"CAST(floor({s_dec}) AS BIGINT)"
    fus = f"CAST(({s_dec} - floor({s_dec})) * 1000000 AS BIGINT)"
    sgn = f"IF({neg}, '-', '')"
    frac = (
        f"IF({fus} > 0, CONCAT('.', "
        f"regexp_replace(format_string('%06d', {fus}), '0+$', '')), '')"
    )
    tstr = f"CONCAT({sgn}, format_string('%02d:%02d:%02d', {h}, {m}, {si}), {frac})"
    days = f"CONCAT({sgn}, CAST({d} AS STRING), IF({d} = 1, ' day', ' days'))"
    return (
        "CASE WHEN itv IS NULL THEN CAST(NULL AS STRING) "
        f"WHEN {d} > 0 AND {h} = 0 AND {m} = 0 AND {si} = 0 AND {fus} = 0 "
        f"THEN {days} "
        f"WHEN {d} > 0 THEN CONCAT({days}, ' ', {tstr}) "
        f"ELSE {tstr} END"
    )


def register_interval_functions(spark: SparkSession) -> None:
    """SQL-callable registration: ``zeek_interval_text(itv)``.  A Spark
    SQL-language UDF (CREATE FUNCTION ... RETURN <expr>) so the call
    stays JVM-side in SQL too — no Python round-trip."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION zeek_interval_text(itv "
        f"INTERVAL DAY TO SECOND) RETURNS STRING RETURN {_expr_sql()}"
    )
