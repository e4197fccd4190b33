"""Structured Streaming ingestion of rotating Zeek logs.

The reference is strictly batch, but its fixture set — 24 hourly-rotated
``known_hosts_*.log.gz`` files — is exactly the production shape a
streaming file source handles: a monitor drops a finished log into the
directory every rotation period and the stream picks it up
(SURVEY.md §2.B "Streaming operators").

Design: schema is resolved ONCE, driver-side, from existing files (or an
explicit sample file) with the same header module as the batch path —
streams can't re-infer schema per file, and Zeek streams keep a stable
schema per log type.  Then ``spark.readStream.csv`` over the directory
with the shared typed-cast pipeline.  Everything downstream (watermarks,
windowed rollups, stateful ops) is stock Structured Streaming.

Scale notes: the file source scales by listing + per-file tasks (same
unit as batch); ``maxFilesPerTrigger`` bounds micro-batch size;
checkpointing gives exactly-once into parquet/delta-style sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zeek_duckdb_spark.header import ZeekHeader, glob_zeek_files, parse_header
from zeek_duckdb_spark.sources.zeek import _raw_schema, typed_columns

__all__ = ["read_zeek_stream", "windowed_rollup"]


def read_zeek_stream(
    spark: SparkSession,
    directory: str,
    *,
    pattern: str = "*.log*",
    schema_from: str | None = None,
    inet: bool = True,
    replace_periods: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Open a streaming DataFrame over a directory of rotating Zeek logs.

    ``schema_from``: path of a file whose header defines the stream
    schema; default = first (sorted) existing file matching ``pattern``
    in ``directory``.  Files whose schema later diverges produce NULLs /
    misparsed columns rather than failing the stream — validate offline
    with the batch reader if the log type evolves.
    """
    if schema_from is None:
        schema_from = glob_zeek_files(f"{directory.rstrip('/')}/{pattern}")[0]
    hdr: ZeekHeader = parse_header(schema_from)

    inet_canon = None
    if inet:
        from zeek_duckdb_spark.functions.inet import inet_canon_col

        inet_canon = inet_canon_col

    names = hdr.column_names(replace_periods)
    reader = (
        spark.readStream.schema(_raw_schema(names))
        .options(
            sep=hdr.separator,
            comment="#",
            quote="\u0000",
            escape="\u0000",
            mode="PERMISSIVE",
            header=False,
            # bare '' cells read NULL here exactly as in the batch scan
            # (univocity nulls zero-length unquoted tokens; see the
            # _read_group note in sources/zeek.py)
        )
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.csv(f"{directory.rstrip('/')}/{pattern}")
    return raw.select(*typed_columns(hdr, replace_periods, inet_canon))


def windowed_rollup(
    stream: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Watermarked tumbling-window rollup — the hypertable-style
    continuous aggregate over a Zeek stream.  Late rows within the
    watermark update their window; older rows are dropped (state is
    bounded, which is what makes this run forever at scale)."""
    group_cols = group_cols or []
    aggs = aggs or [F.count("*").alias("n")]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *group_cols)
        .agg(*aggs)
    )
