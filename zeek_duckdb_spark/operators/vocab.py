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

# module-global so pandas_udf can resolve stringized `pd.Series` type
# hints (future-annotations keeps them strings; pyspark resolves them
# against the defining module's globals)
import pandas as pd  # noqa: F401

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from zeek_duckdb_spark.operators.textops import nonempty_tokens

__all__ = [
    "vocab_counts",
    "vocab_coverage",
    "BPEModel",
    "bpe_train",
    "bpe_tokenize_col",
]

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


# ----------------------------------------------------------------------
# BPE tokenizer training (Sennrich et al. 2016, arXiv:1508.07909) —
# the merge-learning stage vocab_counts/vocab_coverage feed.
# ----------------------------------------------------------------------

from typing import NamedTuple  # noqa: E402


class BPEModel(NamedTuple):
    """A trained byte-pair-encoding tokenizer: ``merges`` in learned
    order (rank = list position), ``vocab`` = the resulting symbol
    inventory (single chars + merged units, '</w>' marks word ends)."""

    merges: list  # [(left_symbol, right_symbol), ...]
    vocab: list   # [symbol, ...]


END = "</w>"


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    min_count: int = 2,
    max_words: int = 1_000_000,
    mode: str = "bpe",
    lowercase: bool = True,
) -> BPEModel:
    """Learn ``num_merges`` BPE merges from a corpus.

    Altitude split (the kmeans principle — corpus passes distributed,
    model fitting driver-side when the state is model-sized): the ONE
    corpus-sized job is the word-frequency aggregate (explode +
    map-side-combinable hash count — the vocab_counts shape); classic
    BPE then trains on that WORD-FREQUENCY DICT, not the corpus
    (Sennrich's own formulation), so the merge loop runs driver-side
    over at most ``max_words`` (word, count) rows with an incremental
    pair index — each merge touches only the words containing its
    pair.  At 100 TB the aggregate is the job; the dict is megabytes.

    ``min_count`` drops hapax words before training (noise + bound);
    ``max_words`` caps the dict at the most frequent words
    (TakeOrdered, deterministic count-then-word order) — tail words'
    mass is negligible for merge statistics by construction.

    Merge selection is deterministic: highest pair count, ties to the
    lexicographically smallest pair; training stops early when no pair
    occurs twice.  Word counts are exact integers, so the learned
    merges are independent of partitioning (test-pinned).
    """
    if num_merges < 1:
        raise ValueError("bpe_train: num_merges must be >= 1")
    if min_count < 1 or max_words < 1:
        raise ValueError("bpe_train: min_count and max_words must be >= 1")
    toks = _token_array(text_col, mode, lowercase)
    wc = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    if not wc:
        raise ValueError(
            "bpe_train: no words survive min_count — corpus too small?"
        )
    words = [tuple(r["w"]) + (END,) for r in wc]
    freqs = [int(r["n"]) for r in wc]

    # incremental pair index: pair -> total weighted count, and
    # pair -> {word indices containing it}
    pair_count: dict = {}
    pair_words: dict = {}
    for wi, (syms, f) in enumerate(zip(words, freqs)):
        for a, b in zip(syms, syms[1:]):
            pair_count[(a, b)] = pair_count.get((a, b), 0) + f
            pair_words.setdefault((a, b), set()).add(wi)

    def _recount(wi: int, sign: int) -> None:
        f = freqs[wi] * sign
        syms = words[wi]
        for p in zip(syms, syms[1:]):
            pair_count[p] = pair_count.get(p, 0) + f
            if sign > 0:
                pair_words.setdefault(p, set()).add(wi)
            else:
                # keep the index EXACT: a rebuilt word that no longer
                # contains p must not be rescanned when p is merged
                # later (stale entries cost O(len(word)) each)
                s = pair_words.get(p)
                if s is not None:
                    s.discard(wi)

    merges: list = []
    for _ in range(num_merges):
        best = None
        for p, c in pair_count.items():
            if c < 2:
                continue
            if best is None or c > best[0] or (c == best[0] and p < best[1]):
                best = (c, p)
        if best is None:
            break
        pair = best[1]
        merges.append(pair)
        merged_sym = pair[0] + pair[1]
        for wi in list(pair_words.get(pair, ())):
            _recount(wi, -1)
            syms = words[wi]
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == pair[0]
                    and syms[i + 1] == pair[1]
                ):
                    out.append(merged_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = tuple(out)
            _recount(wi, 1)
        # drop exhausted entries so the argmax scan stays tight
        for p in [p for p, c in pair_count.items() if c <= 0]:
            del pair_count[p]
            pair_words.pop(p, None)

    vocab = sorted(
        {s for syms in words for s in syms}
        | {a for a, _ in merges} | {b for _, b in merges}
        | {a + b for a, b in merges}
    )
    return BPEModel(merges, vocab)


def _bpe_encode_word(word: str, ranks: dict) -> list:
    """Greedy rank-order BPE apply for one word (chars + '</w>', then
    repeatedly merge the lowest-rank pair present) — reproduces the
    training segmentation on training words."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        pair = (syms[best_i], syms[best_i + 1])
        merged = pair[0] + pair[1]
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_tokenize_col(
    model: BPEModel,
    col,
    mode: str = "bpe",
    lowercase: bool = True,
):
    """``array<string>`` of BPE tokens per text row — the learned
    merges ship per executor inside an Arrow-batched pandas-UDF
    closure (model-sized, the perplexity_col topology); a per-batch
    word cache collapses repeated words, so cost tracks DISTINCT words
    per batch, not tokens.  Zero shuffle; NULL text -> NULL.  Words
    with no applicable merges fall back to characters + '</w>'
    (open-vocabulary by construction — the point of BPE)."""
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {p: i for i, p in enumerate(model.merges)}
    if mode == "bpe":
        # re.ASCII: Java regex \s is the 6-char ASCII class, so without
        # it Python's unicode \s would swallow NBSP-class characters
        # the Spark-side trainer tokenizes — train/apply parity breaks
        pre = re.compile(_BPE_RE, re.ASCII)
        split = lambda t: pre.findall(t)  # noqa: E731
    elif mode == "ws":
        ws = re.compile(r"\s+", re.ASCII)
        split = lambda t: [w for w in ws.split(t) if w]  # noqa: E731
    else:
        raise ValueError(f"bpe_tokenize_col: mode must be 'ws' or 'bpe', got '{mode}'")

    @pandas_udf("array<string>")
    def _enc(s: pd.Series) -> pd.Series:
        cache: dict = {}

        def enc(text):
            if text is None:
                return None
            if lowercase:
                text = text.lower()
            out = []
            for w in split(text):
                got = cache.get(w)
                if got is None:
                    got = _bpe_encode_word(w, ranks)
                    cache[w] = got
                out.extend(got)
            return out

        return s.map(enc)

    return _enc(col)
