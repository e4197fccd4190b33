"""Portable Bloom filter: the broadcastable membership gate.

The pipeline shape this serves: "is this URL / fingerprint / test-set
n-gram in a 10^6-10^8-key reference set?" asked once per corpus row
at 100 TB.  A broadcast semi-join against the RAW keys ships the
whole key set to every executor (GBs); the Bloom filter ships
``m/8`` bytes (16 MB at m=2^27) for a tunable false-positive rate
and ZERO false negatives — so ``~maybe`` ("definitely new") is safe
for dedup/decontamination gates, and the FP side only costs a second
exact check on a tiny candidate set.

Spark-first build: the k bit positions derive from ONE pure-JVM md5
per row (Kirsch-Mitzenmacher double hashing over the digest halves —
the same portable-md5 recipe as ``hashutil.md5_long``), exploded
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

__all__ = [
    "bloom_build",
    "bloom_words_df",
    "bloom_contains",
    "bloom_probe_df",
    "bloom_gate",
    "bloom_merge",
    "bloom_merge_words",
]

_MIN64 = -(1 << 63)


def _h1h2(col: Column, seed: int) -> tuple[Column, Column]:
    """The two 15-hex-digit halves of ONE md5 per row, each < 2^60
    (Kirsch & Mitzenmacher 2006 double hashing: positions h1 + i*h2
    preserve the Bloom fp bound).  CALLERS MUST MATERIALIZE these as
    projected columns before fanning out to k positions — Catalyst
    does not CSE the digest across k separate expressions, and a
    re-evaluated md5 per position would multiply the probe's hot-loop
    cost by 2k (measured 3x slower end-to-end)."""
    digest = F.md5(
        F.concat_ws(":", F.lit(str(seed)), col.cast("string"))
    )
    return (
        F.conv(F.substring(digest, 1, 15), 16, 10).cast("long"),
        F.conv(F.substring(digest, 17, 15), 16, 10).cast("long"),
    )


def _positions_from(h1: Column, h2: Column, num_bits: int,
                    num_hashes: int) -> list[Column]:
    """k bit positions from MATERIALIZED h1/h2 columns — pure
    arithmetic (h1 + 6*h2 < 2^63, hence the num_hashes <= 7 guard)."""
    return [
        (h1 + F.lit(i) * h2) % F.lit(num_bits) for i in range(num_hashes)
    ]


def _word_rows(df: DataFrame, col: str, num_bits: int, num_hashes: int,
               seed: int) -> DataFrame:
    h1, h2 = _h1h2(F.col(col), seed)
    hashed = df.filter(F.col(col).isNotNull()).select(
        h1.alias("__h1"), h2.alias("__h2")
    )
    pos = F.explode(
        F.array(
            *_positions_from(
                F.col("__h1"), F.col("__h2"), num_bits, num_hashes
            )
        )
    ).alias("pos")
    rows = (
        hashed.select(pos)
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
    if not 1 <= num_hashes <= 7:
        raise ValueError(
            "bloom: num_hashes must be in [1, 7] (double-hashing "
            "overflow headroom; k > 7 never helps the fp rate anyway)"
        )


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
    # Arrow path, not .collect(): at 2^23+ bits the words table is
    # 10^5-10^6 rows and py4j row-by-row transfer would dominate
    pdf = _word_rows(df, col, num_bits, num_hashes, seed).toPandas()
    for idx, w in zip(pdf["word_idx"].values, pdf["word"].values):
        words[int(idx)] = int(w)
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
    h1, h2 = _h1h2(F.col(col), model["seed"])
    probed = (
        df.withColumn("__bh1", h1)
        .withColumn("__bh2", h2)
        .crossJoin(F.broadcast(words_df))
    )
    cond = F.col(col).isNotNull()
    for p in _positions_from(
        F.col("__bh1"), F.col("__bh2"), model["num_bits"],
        model["num_hashes"],
    ):
        w = F.element_at(F.col("__bloom_words"), (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        cond = cond & (w.bitwiseAND(bit) == bit)
    return (
        probed.withColumn(out_col, cond)
        .drop("__bloom_words", "__bh1", "__bh2")
    )


def bloom_probe_df(
    df: DataFrame,
    col: str,
    words_df: DataFrame,
    num_bits: int,
    num_hashes: int = 5,
    seed: int = 7,
    out_col: str = "maybe",
) -> DataFrame:
    """Probe against a DISTRIBUTED words table (the
    :func:`bloom_words_df` output, typically persisted as the filter's
    landing) — the form for filters too large to ship through the
    driver (10^8+ bits / 10^7+ keys, where the dict model's py4j
    round-trip would dominate).  Plan: k broadcast hash joins of the
    sparse words relation onto the corpus — the words ship once per
    executor JVM-side, the corpus NEVER shuffles, and no Python runs.
    A missing word (never set) probes False, so semantics match
    :func:`bloom_contains` exactly."""
    _validate(num_bits, num_hashes)
    h1, h2 = _h1h2(F.col(col), seed)
    out = df.withColumn("__bh1", h1).withColumn("__bh2", h2)
    cond = F.col(col).isNotNull()
    for i, p in enumerate(
        _positions_from(F.col("__bh1"), F.col("__bh2"), num_bits,
                        num_hashes)
    ):
        w = F.broadcast(
            words_df.select(
                F.col("word_idx").alias(f"__bw_idx{i}"),
                F.col("word").alias(f"__bw_word{i}"),
            )
        )
        out = out.withColumn(
            f"__bw_probe{i}", (p / 64).cast("int")
        ).join(
            w, F.col(f"__bw_probe{i}") == F.col(f"__bw_idx{i}"), "left"
        )
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        cond = cond & (
            F.coalesce(F.col(f"__bw_word{i}"), F.lit(0)).bitwiseAND(bit)
            == bit
        )
    drop = ["__bh1", "__bh2"] + [
        c
        for i in range(num_hashes)
        for c in (f"__bw_probe{i}", f"__bw_idx{i}", f"__bw_word{i}")
    ]
    return out.withColumn(out_col, cond).drop(*drop)


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


def bloom_merge(a: dict, b: dict) -> dict:
    """OR-merge two filters built with identical (num_bits,
    num_hashes, seed) — Bloom filters are mergeable summaries, so the
    daily-crawl loop can build TODAY's filter from today's keys only
    and fold it into the standing one (no rebuild over history)."""
    for f in ("num_bits", "num_hashes", "seed"):
        if a[f] != b[f]:
            raise ValueError(f"bloom_merge: {f} differs ({a[f]} vs {b[f]})")
    return {
        **a,
        "words": [x | y for x, y in zip(a["words"], b["words"])],
    }


def bloom_merge_words(a: DataFrame, b: DataFrame) -> DataFrame:
    """The distributed form of :func:`bloom_merge`: OR-merge two
    sparse words tables (same build params — the caller's contract,
    like any index landing).  One bit_or aggregate over the union;
    output is the same landing shape, so the standing filter updates
    with `merged.write.mode('overwrite')` on a words/ path."""
    return (
        a.unionByName(b)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
