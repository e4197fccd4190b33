"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (this container ships no image/audio
libraries): ``decode_media`` raises NotImplementedError unless a
deterministic fake decoder is requested.  Everything Spark-side —
schema, Arrow batch shape, ``mapInPandas`` plumbing, partition sizing —
is real and tested, so dropping in a PIL/librosa decoder is a one-
function change.

Scale notes: media bytes ride in the row as BinaryType; the decode map
is ``mapInPandas`` (Arrow batches, no per-row Python overhead beyond
the batch loop).  Keep ``spark.sql.execution.arrow.maxRecordsPerBatch``
modest when media cells are MBs so a batch fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MEDIA_META_SCHEMA", "attach_media", "decode_media", "media_stats"]

# typed metadata struct carried alongside the opaque payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def attach_media(df: DataFrame, payload_col: str, fmt: str = "utf8") -> DataFrame:
    """Wrap a column's bytes as an opaque media column + typed metadata
    (JVM-side; for real pipelines the payload comes from
    ``spark.read.format('binaryFile')``)."""
    payload = (
        F.encode(F.col(payload_col), "utf-8")
        if fmt == "utf8"
        else F.col(payload_col).cast("binary")
    )
    return df.withColumn("media", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(fmt).alias("format"),
            F.octet_length(F.col("media")).cast("long").alias("n_bytes"),
            F.md5(F.col("media")).alias("checksum"),
        ),
    )


_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_media(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media", fake: bool = False
) -> DataFrame:
    """Decode/feature-extract media via mapInPandas.

    fake=False requires a real decoder library -> NotImplementedError
    (clearly-marked stub; the container has no PIL/librosa).
    fake=True emits a deterministic 4-dim feature from the raw bytes so
    the distributed plumbing (schema, batching, partitioning) is
    testable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "real media decode requires an image/audio library not present "
            "in this environment; pass fake=True for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            media = pdf[media_col]
            n = media.map(lambda b: len(b) if b is not None else 0)
            # deterministic fake "features": byte-statistics of the payload
            def feat(b):
                if not b:
                    return [0.0, 0.0, 0.0, 0.0]
                return [
                    float(len(b)),
                    float(b[0]),
                    float(b[-1]),
                    float(sum(b[:64]) % 997),
                ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n,
                    "feature": media.map(feat),
                }
            )

    return df.mapInPandas(batches, _DECODED_SCHEMA)


def media_stats(df: DataFrame, group_col: str) -> DataFrame:
    """Per-group media payload stats over the typed metadata — a pure
    relational query on the struct column (no decode needed)."""
    return (
        df.groupBy(group_col)
        .agg(
            F.count("*").alias("n_media"),
            F.sum(F.col("media_meta.n_bytes")).alias("total_bytes"),
            F.round(F.avg(F.col("media_meta.n_bytes")), 4).alias("avg_bytes"),
            # distinct on the payload itself (duckdb 1.0 lacks md5(BLOB),
            # so the oracle counts DISTINCT encode(text) — same cardinality)
            F.count_distinct(F.col("media")).alias("distinct_payloads"),
        )
    )
