"""Vocabulary statistics for tokenizer construction: the counts a
BPE/unigram tokenizer trainer consumes, and the coverage curve that
decides vocab size.

Shapes (100 TB contract):

- :func:`vocab_counts` is ONE explode + hash-aggregate: map-side
  partial counts reduce the shuffle to (distinct tokens x partitions)
  rows — word counting is the canonical associative aggregate, so no
  skew guard is needed (a hot token combines locally before it ever
  shuffles).  The top-N cut is a TakeOrderedAndProject, never a global
  sort of the full vocabulary.
- :func:`vocab_coverage` runs entirely on the top-N table (model-sized
  — N rows, not corpus rows): one running-sum window over a single
  partition of N rows plus the corpus total from the SAME aggregate
  pass that produced the counts.

Both are plain relational algebra, restated 1:1 in DuckDB by the test
differential (tests/test_vocab.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from zeek_duckdb_spark.operators.textops import nonempty_tokens

__all__ = ["vocab_counts", "vocab_coverage"]

_BPE_RE = r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"


def _token_array(text_col: str, mode: str, lowercase: bool):
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    if mode == "ws":
        return nonempty_tokens(t)
    if mode == "bpe":
        return F.regexp_extract_all(t, F.lit(_BPE_RE), 0)
    raise ValueError(f"vocab: mode must be 'ws' or 'bpe', got '{mode}'")


def vocab_counts(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 10_000,
    min_count: int = 1,
    mode: str = "ws",
    lowercase: bool = True,
) -> DataFrame:
    """Top-``top_n`` tokens by occurrence count: (token, n), count
    descending then token ascending (deterministic ties).  ``mode='ws'``
    splits on whitespace; ``'bpe'`` uses the BPE-ish pre-tokenization
    regex (letter runs, digit runs, single punctuation — the
    textops.token_count vocabulary)."""
    if top_n < 1:
        raise ValueError("vocab_counts: top_n must be >= 1")
    toks = _token_array(text_col, mode, lowercase)
    counts = (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    if min_count > 1:
        counts = counts.filter(F.col("n") >= min_count)
    return counts.orderBy(F.desc("n"), F.asc("token")).limit(top_n)


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 10_000,
    mode: str = "ws",
    lowercase: bool = True,
) -> DataFrame:
    """Coverage curve: for each vocab rank r in 1..top_n, the fraction
    of ALL token occurrences covered by the top-r tokens —
    (rank, token, n, cum_coverage).  The window runs over the N-row
    vocab table only (single tiny partition by construction); the
    corpus-wide total is one scalar aggregate attached as a broadcast
    cross join.  Read off the vocab size where the curve crosses your
    target (e.g. 0.995)."""
    if top_n > 1_000_000:
        raise ValueError(
            "vocab_coverage: top_n > 1e6 — the running-sum window "
            "materializes the top-N table in ONE partition; for a "
            "full-vocabulary curve, bucket vocab_counts output by rank "
            "range instead"
        )
    toks = _token_array(text_col, mode, lowercase)
    exploded = df.select(F.explode(toks).alias("token"))
    counts = exploded.groupBy("token").agg(F.count("*").alias("n"))
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(top_n)
    # total occurrences = sum over the SAME aggregate (not a second
    # corpus explode): both branches share the groupBy exchange, which
    # Spark's ReuseExchange collapses to one physical shuffle
    total = counts.agg(F.sum("n").alias("__total"))
    w = Window.orderBy(F.desc("n"), F.asc("token")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("n"), F.asc("token")))
            .alias("rank"),
            "token",
            "n",
            F.round(
                F.sum("n").over(w).cast("double") / F.col("__total"), 6
            ).alias("cum_coverage"),
        )
    )
