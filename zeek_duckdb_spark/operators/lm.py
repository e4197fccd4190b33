"""N-gram language-model perplexity scoring — the CCNet-class quality
filter of a training-data pipeline (Wenzek et al. 2020 filter CommonCrawl
by KenLM perplexity; Gopher/FineWeb pipelines keep LM-perplexity gates).
A 5-gram KenLM is not restatable cross-engine, so this operator is the
Spark-first, oracle-restatable core of that stage: an add-alpha-smoothed
n-gram LM fit on one corpus, scoring any other corpus.

Model semantics (all counts over whitespace tokens of
``trim(lower(text))``):

    p(w | ctx) = (c(ctx·w) + alpha) / (c_prefix(ctx) + alpha · V)

where ``c(ctx·w)`` is the n-gram count, ``c_prefix(ctx)`` is the
PREFIX count (sum of counts of n-grams starting with ctx — the proper
conditional normalizer; a bare (n-1)-gram count would leak mass at
document tails), and ``V`` is the distinct-token vocabulary size of the
training corpus.  Per-document score = mean ln p over its n-grams;
``perplexity = exp(-mean ln p)`` (natural-log perplexity — a uniform
model over V tokens scores ~V).  Documents with fewer than ``n`` tokens
have no n-grams and are absent from the output (un-scorable; left-join
them back if the pipeline needs a NULL row).

Scale shape: fitting is one explode + one map-side-combinable hash
aggregate over the training corpus plus one distinct-count job for V
(the model stays DISTRIBUTED — n-gram tables at web scale are
millions of rows and never collect to the driver); scoring is one
explode + two equi-joins against the model (AQE broadcasts a small
model, shuffle-hash otherwise — either way keyed, bounded, never
all-pairs) + one per-doc aggregate.  No windows, no driver-side
state beyond the two scalars (V, alpha).

Reference scope note: the reference engine (a DuckDB Zeek-scan
extension, /root/reference/src) has no LM surface; this belongs to the
training-data-pipeline suite (SURVEY.md "beyond the reference" track).
"""

from __future__ import annotations

from typing import NamedTuple

# module-global so pandas_udf can resolve stringized `pd.Series` type
# hints (future-annotations keeps them strings; pyspark resolves them
# against the defining module's globals — the textops lesson)
import pandas as pd  # noqa: F401

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zeek_duckdb_spark.operators.textops import nonempty_tokens

__all__ = ["NgramLM", "ngram_lm_fit", "perplexity_scores", "perplexity_col"]


class NgramLM(NamedTuple):
    """A fitted n-gram LM: two distributed count tables + two scalars.
    ``grams``: (gram, c) n-gram counts; ``contexts``: (ctx, c) PREFIX
    counts (see module docstring); ``vocab_size``: distinct training
    tokens; ``alpha``: add-alpha smoothing mass."""

    n: int
    alpha: float
    vocab_size: int
    grams: DataFrame
    contexts: DataFrame


def _gram_col(tok_col: str, n: int):
    """In-order, non-distinct n-grams over a materialized token-array
    column (''-joined with single spaces; [] when the doc is shorter
    than n).  Generated as one SQL string — the _shingles_from_tokens
    lesson (py4j tree cost; slicing a STORED array inside the lambda is
    cheap)."""
    return F.expr(
        f"if(size({tok_col}) >= {n}, "
        f"transform(sequence(0, size({tok_col}) - {n}), "
        f"i -> concat_ws(' ', slice({tok_col}, i + 1, {n}))), "
        f"array())"
    )


def _gram_rows(df: DataFrame, id_cols: list[str], text_col: str, n: int) -> DataFrame:
    toks = nonempty_tokens(F.lower(F.col(text_col)))
    return (
        df.select(*id_cols, toks.alias("__toks"))
        .select(*id_cols, F.explode(_gram_col("__toks", n)).alias("gram"))
    )


def ngram_lm_fit(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    alpha: float = 0.1,
) -> NgramLM:
    """Fit the add-alpha n-gram LM on ``df``'s ``text_col``.  Runs ONE
    job eagerly (the distinct-token count for V); the count tables are
    lazy DataFrames — persist them if many corpora will be scored
    against one model."""
    if n < 2:
        raise ValueError("ngram_lm_fit: n must be >= 2 (unigram rates are "
                         "operators/vocab.py's job)")
    if alpha <= 0:
        raise ValueError("ngram_lm_fit: alpha must be > 0")
    grams = _gram_rows(df, [], text_col, n).groupBy("gram").agg(
        F.count("*").alias("c")
    )
    # prefix counts: aggregate the (already reduced) n-gram table by
    # its leading n-1 tokens — model-sized input, not corpus-sized
    contexts = grams.select(
        F.substring_index("gram", " ", n - 1).alias("ctx"), F.col("c")
    ).groupBy("ctx").agg(F.sum("c").alias("c"))
    toks = nonempty_tokens(F.lower(F.col(text_col)))
    vocab_size = (
        df.select(F.explode(toks).alias("tok")).agg(
            F.count_distinct("tok").alias("v")
        ).first()["v"]
    )
    if not vocab_size:
        raise ValueError("ngram_lm_fit: training corpus has no tokens")
    return NgramLM(n, float(alpha), int(vocab_size), grams, contexts)


def perplexity_scores(
    df: DataFrame,
    lm: NgramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, lm_tokens, avg_logp, perplexity) per document with >= n
    tokens: ``avg_logp`` = mean ln p(w|ctx) over the doc's n-grams
    (6 dp), ``perplexity`` = exp(-avg) rounded to 4 dp — LOWER is more
    natural relative to the training corpus; the standard gate keeps
    docs under a perplexity ceiling (or inside a band, Gopher-style,
    to also drop degenerate low-perplexity repetition)."""
    g = _gram_rows(df, [id_col], text_col, lm.n)
    scored = (
        g.join(lm.grams.withColumnRenamed("c", "__cg"), "gram", "left")
        .withColumn("ctx", F.substring_index("gram", " ", lm.n - 1))
        .join(lm.contexts.withColumnRenamed("c", "__cc"), "ctx", "left")
        .withColumn(
            "__logp",
            F.log(
                (F.coalesce(F.col("__cg"), F.lit(0)) + F.lit(lm.alpha))
                / (
                    F.coalesce(F.col("__cc"), F.lit(0))
                    + F.lit(lm.alpha) * F.lit(float(lm.vocab_size))
                )
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("lm_tokens"),
        F.round(F.avg("__logp"), 6).alias("avg_logp"),
        F.round(F.exp(-F.avg("__logp")), 4).alias("perplexity"),
    )


def perplexity_col(
    lm: NgramLM,
    col,
    max_model_rows: int = 2_000_000,
):
    """Zero-shuffle scoring COLUMN: ``struct<lm_tokens, avg_logp,
    perplexity>`` per row (NULL when the text has < n tokens) — same
    numbers as :func:`perplexity_scores` (parity-pinned), different
    topology: the count tables collect ONCE into plain dicts that ship
    per executor inside a pandas-UDF closure (the
    ``registered_domain_psl_col`` pattern), so scoring is a pure
    Arrow-batched map with no joins and no aggregate.

    This is the STREAMING/serving path: ``perplexity_scores``'s
    explode + groupBy(doc) shape doesn't fit a stream (per-doc
    aggregation over exploded rows needs state the problem doesn't —
    every gram of a doc lives in its one row), while a map column
    drops straight into ``readStream -> withColumn -> filter``.

    Scale bound: the closure holds the WHOLE model, so this path is
    for models up to ~``max_model_rows`` grams (a few hundred MB of
    dict — fine for the n=2..3 gate models this stage uses; raise the
    cap deliberately if you know your executors).  For web-scale
    5-gram tables keep the distributed-join path.  The collect runs
    eagerly, once, at column-construction time."""
    n_grams = lm.grams.limit(max_model_rows + 1).collect()
    if len(n_grams) > max_model_rows:
        raise ValueError(
            f"perplexity_col: model exceeds max_model_rows={max_model_rows}; "
            "use perplexity_scores (distributed joins) for models this size"
        )
    gd = {r["gram"]: r["c"] for r in n_grams}
    # contexts are prefixes of grams, so |contexts| <= |grams| holds
    # for any model THIS module fits — but guard it independently so a
    # refactor (or a hand-built NGramLM) can't turn this collect into
    # an unbounded driver pull
    n_ctx = lm.contexts.limit(max_model_rows + 1).collect()
    if len(n_ctx) > max_model_rows:
        raise ValueError(
            f"perplexity_col: context table exceeds "
            f"max_model_rows={max_model_rows}; use perplexity_scores "
            "(distributed joins) for models this size"
        )
    cd = {r["ctx"]: r["c"] for r in n_ctx}
    n, alpha, v = lm.n, lm.alpha, float(lm.vocab_size)
    import re
    from math import exp, log

    from pyspark.sql.functions import pandas_udf

    # Java-regex parity: \s under re.ASCII is the same 6-char class as
    # Spark's split(col, '\\s+'); empties filtered like nonempty_tokens
    ws = re.compile(r"\s+", re.ASCII)

    def _score_one(text):
        if text is None:
            return None
        toks = [t for t in ws.split(text.lower()) if t]
        if len(toks) < n:
            return None
        acc = 0.0
        cnt = len(toks) - n + 1
        for i in range(cnt):
            g = " ".join(toks[i : i + n])
            ctx = " ".join(toks[i : i + n - 1])
            acc += log((gd.get(g, 0) + alpha) / (cd.get(ctx, 0) + alpha * v))
        avg = acc / cnt
        return {
            "lm_tokens": cnt,
            "avg_logp": round(avg, 6),
            "perplexity": round(exp(-avg), 4),
        }

    @pandas_udf(
        "struct<lm_tokens: long, avg_logp: double, perplexity: double>"
    )
    def _ppl(s: pd.Series) -> pd.DataFrame:
        rows = [_score_one(v) for v in s]
        return pd.DataFrame(
            {
                "lm_tokens": [r["lm_tokens"] if r else None for r in rows],
                "avg_logp": [r["avg_logp"] if r else None for r in rows],
                "perplexity": [r["perplexity"] if r else None for r in rows],
            }
        )

    # a struct-returning pandas UDF yields a NON-null struct with null
    # FIELDS for unscorable rows; wrap with a JVM token-count guard so
    # the docstring's contract ('NULL when < n tokens') holds for
    # struct-level predicates (`p IS NULL`) too
    scorable = (
        F.size(F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != F.lit("")))
        >= F.lit(n)
    )
    return F.when(col.isNotNull() & scorable, _ppl(col))
