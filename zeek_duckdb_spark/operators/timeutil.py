"""Shared event-time helpers for the time-keyed operators (netflow,
asof) — one place for the timestamp-vs-numeric column handling."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ts_seconds"]


def ts_seconds(df: DataFrame, ts_col: str) -> Column:
    """``ts_col`` as epoch-seconds DOUBLE (µs fraction preserved).
    Numeric columns pass through as-is; TIMESTAMP and TIMESTAMP_NTZ
    convert via ``unix_micros`` — the NTZ cast through TimestampType is
    UTC-safe because the engine pins ``spark.sql.session.timeZone=UTC``
    (session.py), matching DuckDB's treat-naive-as-UTC ``epoch()``."""
    ts_dt = df.schema[ts_col].dataType.typeName()
    if ts_dt in ("timestamp", "timestamp_ntz"):
        return (
            F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double")
            / F.lit(1e6)
        )
    return F.col(ts_col).cast("double")
