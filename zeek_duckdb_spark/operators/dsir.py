"""DSIR-style data selection: importance resampling toward a target
distribution (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling").

The method: featurize documents as hashed n-gram bags, fit two
bag-of-words distributions — p from a (small) TARGET corpus that looks
like what you want more of, q from the RAW corpus — and score each raw
document with the importance log-weight

    log w(doc) = sum over doc n-grams of [log p_bucket - log q_bucket]

then sample without replacement with probability proportional to w via
the Gumbel top-k trick.  Documents whose n-gram profile resembles the
target score high; generic/boilerplate text scores low.

Spark shapes:

- Fitting (:func:`dsir_fit`) aggregates bucket counts with ONE
  explode+groupBy per corpus — the aggregate has exactly ``buckets``
  rows (a model, not data) and is collected driver-side.
- Scoring (:func:`dsir_logweight`) is a pure per-row fold: the
  log-ratio table rides into the plan as ONE array literal indexed by
  ``md5(ngram) % buckets`` — zero shuffle, zero joins, the same
  inline-the-model trick as ``similarity.ivf_assign``.  Keep
  ``buckets`` ≲ 65k so the literal stays plan-friendly.
- Resampling (:func:`dsir_resample`) keys Gumbel noise on
  ``md5(id:seed)`` — fully deterministic, cluster-size-independent —
  and takes the global top-n as sort-limit (TakeOrderedAndProject;
  n is the selected subset size, which is driver-plannable.  For
  n beyond sort-limit comfort, use the returned ``dsir_key`` with a
  pre-computed threshold instead).

The md5-derived hashing is engine-portable (operators/hashutil), so a
DuckDB restatement reproduces weights bit-for-bit — see
tests/test_dsir.py's differential.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zeek_duckdb_spark.operators.hashutil import md5_long
from zeek_duckdb_spark.operators.textops import nonempty_tokens

__all__ = ["dsir_fit", "dsir_logweight", "dsir_resample"]


def _ngrams(col: Column, n_max: int) -> Column:
    """Unigram (+ bigram for n_max=2) array, empty tokens dropped (so
    ''/' ' docs featurize as zero n-grams, not one empty-string gram)."""
    toks = nonempty_tokens(col)
    if n_max == 1:
        return toks
    bi = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.slice(toks, 1, F.size(toks) - 1),
            lambda t, i: F.concat_ws(" ", t, F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bi)


def _bucket(gram: Column, buckets: int) -> Column:
    return md5_long(gram) % F.lit(buckets)


def _bucket_counts(df: DataFrame, text_col: str, buckets: int, n_max: int):
    """(bucket -> count) for one corpus: explode + count, ``buckets``
    output rows, collected as a dense Python list (the model)."""
    agg = (
        df.select(F.explode(_ngrams(F.col(text_col), n_max)).alias("g"))
        .select(_bucket(F.col("g"), buckets).alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("n"))
    )
    dense = [0] * buckets
    for r in agg.collect():
        dense[int(r["b"])] = int(r["n"])
    return dense


def dsir_fit(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    buckets: int = 4096,
    n_max: int = 2,
    smoothing: float = 1.0,
) -> list[float]:
    """Fit the DSIR log-ratio table: ``llr[b] = log p_target(b) -
    log p_raw(b)`` over hashed n-gram buckets, add-``smoothing``
    smoothed.  Returns a plain Python list (driver-side model — persist
    it yourself; scoring inlines it as a literal)."""
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    if n_max not in (1, 2):
        raise ValueError("n_max must be 1 or 2 (unigram / unigram+bigram)")
    if not smoothing > 0:
        raise ValueError("smoothing must be > 0 (0 gives log(0) on any empty bucket)")
    tc = _bucket_counts(target, text_col, buckets, n_max)
    rc = _bucket_counts(raw, text_col, buckets, n_max)
    t_tot = sum(tc) + smoothing * buckets
    r_tot = sum(rc) + smoothing * buckets
    return [
        (math.log((tc[b] + smoothing) / t_tot) - math.log((rc[b] + smoothing) / r_tot))
        for b in range(buckets)
    ]


def dsir_logweight(
    df: DataFrame,
    llr: list[float],
    text_col: str = "text",
    n_max: int = 2,
) -> DataFrame:
    """Add ``dsir_logw``: the importance log-weight fold over the doc's
    hashed n-grams.  Pure map — the log-ratio table is an array literal
    indexed per gram; zero shuffle (plan-pinned in tests)."""
    if n_max not in (1, 2):
        raise ValueError("n_max must be 1 or 2 (unigram / unigram+bigram)")
    buckets = len(llr)
    table = F.array(*[F.lit(float(x)) for x in llr])
    grams = _ngrams(F.col(text_col), n_max)
    logw = F.aggregate(
        grams,
        F.lit(0.0),
        lambda acc, g: acc + F.element_at(table, (_bucket(g, buckets) + 1).cast("int")),
    )
    return df.withColumn("dsir_logw", F.round(logw, 6))


def dsir_resample(
    df: DataFrame,
    llr: list[float],
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_max: int = 2,
    seed: int = 0,
) -> DataFrame:
    """Select ``n`` documents with probability proportional to their
    importance weight, WITHOUT replacement, deterministically: Gumbel
    top-k (key = logw + Gumbel(md5(id:seed))) — the paper's sampling
    made reproducible by hashing the noise instead of drawing it.
    Output keeps all input columns plus ``dsir_logw`` and ``dsir_key``.
    """
    scored = dsir_logweight(df, llr, text_col, n_max)
    # uniform in (0,1): md5-bucket over 1e6 cells, offset half a cell so
    # u is never 0 or 1 (log(-log(u)) stays finite)
    u = (
        md5_long(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed))))
        % F.lit(1_000_000)
    ).cast("double") / F.lit(1_000_000.0) + F.lit(0.5e-6)
    gumbel = -F.log(-F.log(u))
    keyed = scored.withColumn("dsir_key", F.col("dsir_logw") + gumbel)
    return keyed.orderBy(F.desc("dsir_key"), F.asc(id_col)).limit(n)
