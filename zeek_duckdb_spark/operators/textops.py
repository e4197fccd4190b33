"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure DataFrame expressions (JVM-side, whole-stage
codegen, no Python in the hot path) and are deterministic so they can be
oracle-checked against ANSI SQL.  Designed for 100 TB corpora: every
function is a narrow map over one table — no shuffle, no driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "quality_features",
    "lang_id",
    "fingerprint",
    "strip_boilerplate",
]

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic.  Deliberately tiny and explicit so the oracle SQL can
# restate them verbatim.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
}

PUNCT_CLASS = "[.,!?;:]"
STOPWORDS = ("the", "a", "of", "and", "is", "in", "to", "it")


def tokens(col: Column) -> Column:
    """Whitespace tokenization (the BPE-ish regex path lives in
    token_count's ``mode='bpe'``)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column, mode: str = "ws") -> Column:
    """Token count: ``ws`` = whitespace split; ``bpe`` = a BPE-ish regex
    (letter runs, digit runs, single punctuation) that approximates
    subword pre-tokenization."""
    if mode == "ws":
        return F.size(tokens(col))
    if mode == "bpe":
        return F.size(
            F.regexp_extract_all(col, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 0)
        )
    raise ValueError(f"unknown token_count mode '{mode}'")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality scoring: length, token count, punctuation
    ratio, stopword ratio, mean token length.  Ratios use the
    length-difference trick (``len(x) - len(strip_punct(x))``) so the
    identical arithmetic is expressible in ANSI SQL for the oracle."""
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    sum_tok_len = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tokens.alias("q_tokens"),
        F.round(n_punct.cast("double") / n_chars, 6).alias("punct_ratio"),
        F.round(n_stop.cast("double") / n_tokens, 6).alias("stopword_ratio"),
        F.round(sum_tok_len.cast("double") / n_tokens, 6).alias("mean_token_len"),
    )


def lang_id(col: Column) -> Column:
    """Language-ID heuristic: count marker-stopword hits per language,
    argmax; no hits -> 'und'.  Ties break by the fixed language order
    (en, de, fr, es) — deterministic and SQL-expressible."""
    toks = tokens(F.lower(col))

    def marker_filter(markers):
        # factory, not a default-arg lambda: a 2-arg lambda would make
        # pyspark pass the element *index* as the second argument
        return lambda x: x.isin(*markers)

    scores = {
        lang: F.size(F.filter(toks, marker_filter(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # reversed so earlier languages win ties via later (outer) WHEN order
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of case-folded, whitespace-collapsed
    text.  A content-defined identity for exact dedup that survives
    formatting noise."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def strip_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
) -> DataFrame:
    """Remove boilerplate lines — lines occurring (as exact strings) in
    at least ``min_docs`` distinct documents — from every document;
    the standard web-corpus cleaning pass for headers, footers, nav
    text, and cookie banners.

    Shape: explode to (id, pos, line); the hot-line set is a
    countDistinct aggregate (map-side partial, shuffle carries one row
    per distinct line per partition) and is TINY relative to the corpus
    (lines crossing the threshold), so the exclusion join broadcasts at
    any scale; reassembly is one groupBy(id) with an order-restoring
    sort_array over (pos, line) structs — deterministic, so the oracle
    can restate it with an ordered string_agg.

    Output: (id, text) with boilerplate lines removed, empty string if
    everything was boilerplate; line order otherwise preserved.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    hot = (
        lines.groupBy("line")
        .agg(F.count_distinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("line")
    )
    kept = lines.join(F.broadcast(hot), "line", "left_anti")
    assembled = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("line")))
                ),
                lambda s: s["line"],
            ),
        ).alias(text_col)
    )
    # docs whose every line was boilerplate have no kept rows — restore
    # them as empty strings so the row count is input-preserving
    return (
        df.select(id_col)
        .join(assembled, id_col, "left")
        .select(
            F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
        )
    )
