"""End-to-end training-data pipeline composition: the operators in this
package chained the way a 100 TB corpus-cleaning job would run them.

    raw documents
      -> quality features (map, no shuffle)
      -> quality filter (pushable predicates)
      -> language ID (map)
      -> exact dedup (one hash-aggregate + semi join)
      -> cleaned corpus

Each stage is a DataFrame -> DataFrame transform, so Catalyst fuses the
maps into one stage and the whole pipeline costs exactly the shuffles
the dedup strategy needs (one for exact).  ``clean_corpus`` is
ANSI-SQL-expressible end-to-end and oracle-checked
(entry: pipe_clean_corpus).

Skew note: ``salted_group_count`` is the hot-key guard for group-bys
whose key distribution is unknown (e.g. counting by fingerprint when
one boilerplate doc dominates a crawl): two-phase aggregate over a
salted key bounds any single reducer at 1/salt of the hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zeek_duckdb_spark.operators.textops import fingerprint, lang_id, quality_features

__all__ = ["clean_corpus", "salted_group_count"]


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_punct_ratio: float = 0.2,
    dedup_key: Column | None = None,
) -> DataFrame:
    """Quality-filter + language-tag + exact-dedup a document table.

    Keeps the lowest-id document of each duplicate group (the usual
    'first seen wins' policy).  Returns the cleaned rows with
    ``lang_guess`` attached.
    """
    feats = quality_features(df.select(id_col, text_col), text_col)
    kept = feats.filter(
        (F.col("q_tokens") >= min_tokens)
        & (F.col("punct_ratio") <= max_punct_ratio)
    )
    key = dedup_key if dedup_key is not None else fingerprint(F.col(text_col))
    with_key = kept.withColumn("fp", key)
    keepers = with_key.groupBy("fp").agg(F.min(id_col).alias(id_col))
    deduped = with_key.join(keepers, [id_col, "fp"], "left_semi").drop("fp")
    return deduped.withColumn("lang_guess", lang_id(F.col(text_col)))


def salted_group_count(
    df: DataFrame, key_col: str, salt: int = 16
) -> DataFrame:
    """Two-phase (salted) count per key: phase 1 aggregates
    (key, hash(row)%salt) partial counts, phase 2 sums partials per
    key.  Bounds the hottest reducer at ~1/salt of the hottest key —
    the standard skew guard when a key may dominate the corpus.
    Result is identical to ``groupBy(key).count()``."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    )
    partial = salted.groupBy(key_col, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(key_col).agg(F.sum("_c").alias("count"))
