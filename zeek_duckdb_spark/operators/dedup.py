"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale design (the point of this module — these must hold at 100 TB):

- **exact**: one hash-aggregate on a fingerprint column; Spark does
  map-side partial aggregation, so the shuffle carries one row per
  distinct key per partition, not the corpus.
- **minhash_lsh**: signatures are computed with ``xxhash64`` (JVM,
  codegen) — no Python.  Candidate generation explodes to
  (band_hash, doc) and self-joins per band bucket: the shuffle is
  O(docs × bands) small rows, never O(docs²).  Pair verification is
  exact Jaccard on the candidates only.
- **simhash**: 64 conditional sums per doc (one narrow aggregate over
  exploded tokens would shuffle; instead we fold over the token array
  per row — zero shuffle).
- **ngram_jaccard_pairs**: exact algorithm for modest candidate sets;
  the inverted-index join (token -> docs) is the classic
  shuffle-bounded plan; a frequency cap drops stop-shingles to bound
  skew (the classic hot-key guard).
- **embedding near-dup**: see similarity.py; cosine_pairs here reuses
  the LSH bucketer to avoid the quadratic join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zeek_duckdb_spark.operators.textops import fingerprint, tokens

__all__ = [
    "exact_dedup_groups",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_pairs",
    "ngram_jaccard_pairs",
]


def exact_dedup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", key: Column | None = None
) -> DataFrame:
    """Exact duplicate groups by content fingerprint: one row per
    duplicated fingerprint with the representative (min id) and the
    group size.  ``dropDuplicates`` semantics = join back on
    (fp, id == keep_id)."""
    k = key if key is not None else fingerprint(F.col(text_col))
    return (
        df.select(k.alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("group_size"))
        .filter(F.col("group_size") > 1)
    )


def _shingles(text_col: Column, k: int) -> Column:
    """Word k-shingles as an array column (distinct), JVM-side."""
    toks = tokens(F.lower(text_col))
    if k == 1:
        return F.array_distinct(toks)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash signature per document: signature[i] =
    min over shingles of xxhash64(i, shingle).  Pure built-in exprs —
    xxhash64 is seeded per hash index, array_min folds per row; the
    whole signature costs zero shuffle."""
    sh = _shingles(F.col(text_col), shingle_k)
    # One pass per row: transform each shingle to its num_hashes hash
    # values, then fold with an element-wise min.  Crucially the shingle
    # expression appears ONCE in the tree — num_hashes separate
    # array_min(transform(...)) calls would make Catalyst inline (and
    # re-evaluate) the tokenize+slice+distinct pipeline once per hash,
    # a measured ~30x slowdown at 5k docs.
    hash_matrix = F.transform(
        sh, lambda s: F.array(*[F.xxhash64(F.lit(i), s) for i in range(num_hashes)])
    )
    sig = F.aggregate(
        hash_matrix,
        F.array_repeat(F.lit((1 << 63) - 1).cast("long"), num_hashes),
        lambda acc, x: F.zip_with(acc, x, lambda l, r: F.least(l, r)),
    )
    return df.select(F.col(id_col), sh.alias("shingles"), sig.alias("minhash"))


def minhash_lsh_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 8,
    threshold: float = 0.7,
    num_hashes: int = 32,
) -> DataFrame:
    """Banded LSH candidate generation + exact-Jaccard verification.

    Scale shape (what keeps this sane at 100 TB):
    - the band-bucket explode carries ONLY (id, band, bucket) — the
      shingle arrays stay out of the wide shuffle;
    - candidate pairs are deduped across bands *before* verification,
      so each pair pays the set-intersection cost exactly once;
    - verification re-joins the (id -> shingles) side twice, which AQE
      plans as shuffle joins keyed on id — no array ever rides an
      exploded row.

    Output: (id_a, id_b, jaccard) with jaccard >= threshold, id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col("minhash")[b * rows_per_band + r] for r in range(rows_per_band)]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    buckets = sig_df.select(F.col(id_col), F.explode(band_cols).alias("bb")).select(
        id_col, "bb.band", "bb.bucket"
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sh = sig_df.select(F.col(id_col), F.col("shingles"))
    sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select("id_a", "id_b", F.round(inter / union, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document, zero-shuffle: fold token hashes per
    row; bit j of the result is the sign of the sum of ±1 contributions
    from each token's hash bit j."""
    toks = tokens(F.lower(F.col(text_col)))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def contribs(h: Column) -> Column:
        # per-token +-1 contribution vector for all 64 bits
        return F.array(
            *[
                F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                for j in range(64)
            ]
        )

    # single fold: the tokenize+hash pipeline appears once in the tree
    # (64 separate aggregates would re-evaluate it per bit -- measured
    # ~30x slowdown on the analogous minhash shape)
    sums = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(acc, contribs(h), lambda a, c: a + c),
    )
    powers = F.array(
        *[F.lit((1 << j) if j < 63 else -(1 << 63)).cast("long") for j in range(64)]
    )
    bits = F.zip_with(
        sums, powers, lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("long"))
    )
    sim = F.aggregate(bits, F.lit(0).cast("long"), lambda a, x: a + x)
    return df.select(F.col(id_col), sim.alias("simhash"))


def simhash_pairs(
    sim_df: DataFrame, id_col: str = "doc_id", max_hamming: int = 3, blocks: int = 4
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, using the standard
    block-permutation trick: split the 64-bit hash into ``blocks``
    chunks; any pair within ``max_hamming < blocks`` must agree on at
    least one chunk, so join per chunk bucket instead of O(n²)."""
    width = 64 // blocks
    mask = (1 << width) - 1
    chunk_cols = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftright(F.col("simhash"), i * width).bitwiseAND(F.lit(mask)).alias("chunk"),
            )
            for i in range(blocks)
        ]
    )
    e = sim_df.select(id_col, "simhash", F.explode(chunk_cols).alias("c")).select(
        id_col, "simhash", "c.blk", "c.chunk"
    )
    a, b = e.alias("a"), e.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 1,
    threshold: float = 0.8,
    max_token_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs via an inverted-index join
    (token -> posting list), the shuffle-bounded exact plan:
    |pairs sharing a token| rows move, never |docs|².

    ``max_token_freq`` drops tokens appearing in more than that many
    docs (stop-shingle guard) — at 100 TB this is what keeps the
    hottest key from dominating a reducer; None keeps the result exact.
    """
    d = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(_shingles(F.col(text_col), n))).alias("tok"),
    )
    if max_token_freq is not None:
        freq = d.groupBy("tok").count().filter(F.col("count") <= max_token_freq)
        d = d.join(F.broadcast(freq.select("tok")), "tok")
    sizes = d.groupBy("id").agg(F.count("*").alias("n_tok"))
    a, b = d.alias("a"), d.alias("b")
    common = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_tok").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_tok").alias("nb"))
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
