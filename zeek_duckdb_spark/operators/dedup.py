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

    def seeded_hash(i):
        # factory (a 2-arg lambda would receive the element index)
        return lambda s: F.xxhash64(F.lit(i), s)

    sig = F.array(
        *[F.array_min(F.transform(sh, seeded_hash(i))) for i in range(num_hashes)]
    )
    return df.select(F.col(id_col), sh.alias("shingles"), sig.alias("minhash"))


def minhash_lsh_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 8,
    threshold: float = 0.7,
) -> DataFrame:
    """Banded LSH candidate generation + exact-Jaccard verification.

    signature length must divide evenly into ``bands``.  Each band's
    slice hashes to a bucket; docs sharing any (band, bucket) are
    candidates; candidates are verified with exact Jaccard over the
    stored shingle sets.  Output: (id_a, id_b, jaccard) with
    jaccard >= threshold, id_a < id_b.
    """
    n = int(sig_df.select(F.size("minhash")).first()[0])
    rows_per_band = n // bands
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col("minhash")[b * rows_per_band + r] for r in range(rows_per_band)]).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    exploded = sig_df.select(
        F.col(id_col), F.col("shingles"), F.explode(band_cols).alias("bb")
    ).select(id_col, "shingles", "bb.band", "bb.bucket")

    a = exploded.alias("a")
    b = exploded.alias("b")
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
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.select("id_a", "id_b", F.round(inter / union, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document, zero-shuffle: fold token hashes per
    row; bit j of the result is the sign of the sum of ±1 contributions
    from each token's hash bit j."""
    toks = tokens(F.lower(F.col(text_col)))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    def bit_merge(j):
        # factory (extra lambda params would be misinterpreted by pyspark)
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_exprs = []
    for j in range(64):
        contrib = F.aggregate(hashes, F.lit(0).cast("long"), bit_merge(j))
        bit_exprs.append(
            F.when(contrib > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
            * F.lit(2 ** j).cast("long")
            if j < 63
            # avoid 2**63 overflow: use shiftleft for the sign bit
            else F.when(contrib > 0, F.shiftleft(F.lit(1).cast("long"), 63)).otherwise(F.lit(0).cast("long"))
        )
    sim = functools_reduce_add(bit_exprs)
    return df.select(F.col(id_col), sim.alias("simhash"))


def functools_reduce_add(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


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
