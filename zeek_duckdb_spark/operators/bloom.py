"""Portable Bloom filter: the broadcastable membership gate.

The pipeline shape this serves: "is this URL / fingerprint / test-set
n-gram in a 10^6-10^8-key reference set?" asked once per corpus row
at 100 TB.  A broadcast semi-join against the RAW keys ships the
whole key set to every executor (GBs); the Bloom filter ships
``m/8`` bytes (16 MB at m=2^27) for a tunable false-positive rate
and ZERO false negatives — so ``~maybe`` ("definitely new") is safe
for dedup/decontamination gates, and the FP side only costs a second
exact check on a tiny candidate set.

Spark-first build: the k bit positions are pure-JVM md5 row functions
(``hashutil.md5_long`` — the repo's portable hash family), exploded
to (word_idx, bit) pairs and reduced with a ``bit_or`` aggregate —
map-side combined, the shuffle carries at most ``m/64`` words per
partition regardless of corpus size.  Because OR is commutative and
the hash is deterministic, the words table is IDENTICAL under any
partitioning and carries a full-value DuckDB oracle (same md5
restatement, same bit arithmetic; DuckDB refuses ``1 << 63`` so the
sign bit rides as the min-int64 literal in both restatements... the
Spark side uses shiftleft which wraps identically).

The membership probe keeps the words array OUT of the generated code
(a broadcast 1-row join, the kmeans centroid lesson — literals would
recompile codegen per model) and tests all k bits JVM-side.

Sizing: fpr ~= (1 - e^(-k*n/m))^k; k=5, m=16n gives ~1.2%.  For
billions of keys use the partitioned fingerprint indexes
(dedup.exact_dedup_incremental) instead — a Bloom model is driver /
broadcast state, not a table.

No reference-engine counterpart; training-data-pipeline operator
family (SURVEY.md "beyond the reference" track).  Bloom 1970.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zeek_duckdb_spark.operators.hashutil import md5_long

__all__ = [
    "bloom_build",
    "bloom_words_df",
    "bloom_contains",
    "bloom_gate",
]

_MIN64 = -(1 << 63)


def _positions(col: Column, num_bits: int, num_hashes: int,
               seed: int) -> list[Column]:
    """k bit positions in [0, num_bits) — pure row functions."""
    return [
        md5_long(
            F.concat_ws(":", F.lit(str(seed)), F.lit(str(i)),
                        col.cast("string"))
        )
        % F.lit(num_bits)
        for i in range(num_hashes)
    ]


def _word_rows(df: DataFrame, col: str, num_bits: int, num_hashes: int,
               seed: int) -> DataFrame:
    pos = F.explode(
        F.array(*_positions(F.col(col), num_bits, num_hashes, seed))
    ).alias("pos")
    rows = (
        df.filter(F.col(col).isNotNull())
        .select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("pos") % 64).cast("int"),
            ).alias("bit"),
        )
    )
    return rows.groupBy("word_idx").agg(F.bit_or("bit").alias("word"))


def _validate(num_bits: int, num_hashes: int) -> None:
    if num_bits < 64 or num_bits % 64 != 0:
        raise ValueError("bloom: num_bits must be a positive multiple of 64")
    if num_hashes < 1:
        raise ValueError("bloom: num_hashes must be >= 1")


def bloom_build(
    df: DataFrame,
    col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    seed: int = 7,
) -> dict:
    """Build the filter over ``df[col]`` (NULLs skipped).  Returns a
    model dict ``{num_bits, num_hashes, seed, words}`` with ``words``
    a dense ``num_bits/64`` list of int64 — broadcast-sized driver
    state, identical under any partitioning."""
    _validate(num_bits, num_hashes)
    words = [0] * (num_bits // 64)
    for r in _word_rows(df, col, num_bits, num_hashes, seed).collect():
        words[int(r["word_idx"])] = int(r["word"])
    return {
        "num_bits": num_bits,
        "num_hashes": num_hashes,
        "seed": seed,
        "words": words,
    }


def bloom_words_df(
    df: DataFrame,
    col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    seed: int = 7,
) -> DataFrame:
    """Sparse ``(word_idx, word)`` DataFrame of the NONZERO filter
    words — the oracle shape (bit_or is order-independent integer
    arithmetic, so the match is full-value)."""
    _validate(num_bits, num_hashes)
    return _word_rows(df, col, num_bits, num_hashes, seed)


def bloom_contains(
    df: DataFrame,
    col: str,
    model: dict,
    out_col: str = "maybe",
) -> DataFrame:
    """``df`` + a boolean ``out_col``: True = possibly in the set
    (false positives at the configured rate), False = DEFINITELY not.
    NULL keys probe False.  The words array rides as a broadcast
    1-row join (kept out of codegen so per-model recompiles don't
    happen); each of the k probes is one element_at + bitwise AND —
    a zero-shuffle map."""
    spark = df.sparkSession
    words_df = spark.createDataFrame(
        [([int(w) for w in model["words"]],)], "__bloom_words array<long>"
    )
    probed = df.crossJoin(F.broadcast(words_df))
    cond = F.col(col).isNotNull()
    for p in _positions(
        F.col(col), model["num_bits"], model["num_hashes"], model["seed"]
    ):
        w = F.element_at(F.col("__bloom_words"), (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        cond = cond & (w.bitwiseAND(bit) == bit)
    return probed.withColumn(out_col, cond).drop("__bloom_words")


def bloom_gate(
    df: DataFrame,
    col: str,
    model: dict,
    keep: str = "new",
) -> DataFrame:
    """The composition: ``keep='new'`` keeps rows DEFINITELY not in
    the reference set (no false negatives -> nothing referenced leaks
    through); ``keep='maybe'`` keeps the candidate set for an exact
    second-pass check (small: true members + the fp rate)."""
    if keep not in ("new", "maybe"):
        raise ValueError("bloom_gate: keep must be 'new' or 'maybe'")
    out = bloom_contains(df, col, model, out_col="__maybe")
    cond = F.col("__maybe") if keep == "maybe" else ~F.col("__maybe")
    return out.filter(cond).drop("__maybe")
