"""Trained k-means centroids for IVF ANN — Lloyd's algorithm as a
Spark-first, cross-engine-reproducible operator.

Why a hand-rolled Lloyd instead of ``pyspark.ml.clustering.KMeans``:
the MLlib trainer is RNG-seeded (k-means||), float32, and iteration
counts depend on convergence tolerance — none of which an independent
SQL oracle can restate.  This implementation is bit-deterministic end
to end, so a DuckDB oracle reproduces the *exact* centroids, cell
assignments, and final top-k:

- training runs over int8-QUANTIZED vectors
  (:func:`similarity.quantize_embeddings`): every distributed sum in
  the centroid update is an exact int64 sum (order-independent — THE
  property doubles lack), and mean = CAST(sum AS DOUBLE)/count is one
  correctly-rounded division.  Identical in any engine, any partition
  order, any cluster size;
- init = the ``k`` lowest-id vectors (deterministic, no RNG);
- assignment = argmax cosine over a centroid array LITERAL — a pure
  column expression, zero shuffle (same plan family as
  ``similarity.ivf_assign``); cosine ties break to the HIGHER cell
  (max-struct semantics), mirrored by the oracle's
  ``ORDER BY sim DESC, cell DESC``;
- the only shuffle per iteration carries K×(dim+1) partial-aggregate
  values (map-side combined) — at 100 TB the corpus never moves, only
  centroid statistics do;
- the final re-rank uses exact int64 quantized dot products
  (:func:`similarity.quantized_topk` arithmetic).

All-zero quantized vectors (degenerate after scaling) are excluded up
front — the module-wide degenerate-vector policy of ``similarity``.

Reference scope note: the reference engine (a DuckDB Zeek-scan
extension) has no ANN/clustering surface; this operator is part of the
training-data-pipeline extension suite (SURVEY.md "beyond the
reference" track).
"""

# no `from __future__ import annotations` — keep parity with the other
# operator modules that mix Column lambdas and typing.

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zeek_duckdb_spark.operators.similarity import cosine, quantize_embeddings

__all__ = ["kmeans_fit_quantized", "kmeans_ivf_topk", "ivf_write", "ivf_probe_topk"]


def _argmax_cell(vec: Column, cents: list[tuple[int, list[float]]]) -> Column:
    """Nearest-centroid cell by cosine, as a pure column expression over
    an array-of-structs literal (zero shuffle; ties -> higher cell via
    max-struct lexicographic comparison)."""
    cent_lit = F.array(
        *[
            F.struct(
                F.lit(int(c)).cast("long").alias("cell"),
                F.array(*[F.lit(float(x)) for x in v]).alias("c_vec"),
            )
            for c, v in cents
        ]
    )
    scored = F.transform(
        cent_lit,
        lambda c: F.struct(
            cosine(vec, c["c_vec"]).alias("sim"),
            c["cell"].alias("cell"),
        ),
    )
    return F.array_max(scored)["cell"]


def _nonzero(qvec_col: str) -> Column:
    return F.exists(F.col(qvec_col), lambda v: v != F.lit(0))


def kmeans_fit_quantized(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Fit ``k`` centroids with ``iters`` Lloyd iterations over the
    int8-quantized corpus.  Returns ``[(cell, centroid)]`` with
    ``cell`` in 0..k-1 (init order) — small driver-side state (K·dim
    doubles), the legitimate "model" side of the computation; the
    corpus itself never leaves the executors.

    Exactness contract: centroids are bit-identical across engines and
    partitionings because every component is
    ``exact_int64_sum / count`` (one rounded division).  The int64 sum
    is exact below 2^63; its double cast rounds above 2^53 — at
    127 · 9e15 rows per cell that bound is still far away.
    A cell that captures no rows keeps its previous centroid.
    """
    if k < 1 or iters < 0:
        raise ValueError("kmeans_fit_quantized: need k >= 1, iters >= 0")
    dq = quantize_embeddings(df, id_col, vec_col)
    base = dq.filter(_nonzero("qvec")).select(F.col(id_col), F.col("qvec"))
    init_rows = base.orderBy(F.asc(id_col)).limit(k).collect()
    if len(init_rows) < k:
        raise ValueError(
            f"kmeans_fit_quantized: corpus has {len(init_rows)} usable rows < k={k}"
        )
    cents = [
        (i, [float(v) for v in r["qvec"]]) for i, r in enumerate(init_rows)
    ]
    dim = len(cents[0][1])
    # one generated-SQL agg list (see the F.expr note in
    # minhash_signatures: N Column-API trees cost py4j round-trips)
    sum_exprs = [F.expr(f"sum(qvec[{i}]) AS s{i}") for i in range(dim)]
    for _ in range(iters):
        assigned = base.select(
            F.col(id_col), F.col("qvec"), _argmax_cell(F.col("qvec"), cents).alias("cell")
        )
        stats = assigned.groupBy("cell").agg(
            F.count("*").alias("n"), *sum_exprs
        ).collect()
        means = {
            int(r["cell"]): [r[f"s{i}"] / r["n"] for i in range(dim)]
            for r in stats
        }
        cents = [(c, means.get(c, v)) for c, v in cents]
    return cents


def kmeans_ivf_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN with TRAINED centroids: fit Lloyd centroids, assign the
    corpus (zero-shuffle argmax), probe the query's ``nprobe`` best
    cells, exact re-rank inside probed cells with int64 quantized dot
    products.  Output: (id, cosine_sim) — quantized cosine, 6 dp.

    Probe selection runs driver-side over the K centroids (K doubles of
    state, not data) with the same left-to-right float fold the SQL
    oracle uses — bit-identical.  At scale, write the assigned corpus
    partitioned by cell so a probe reads only its cells' files.
    """
    cents = kmeans_fit_quantized(df, n_centroids, iters, id_col, vec_col)
    dq = quantize_embeddings(df, id_col, vec_col)
    base = dq.filter(_nonzero("qvec")).select(F.col(id_col), F.col("qvec"))
    assigned = base.select(
        F.col(id_col), F.col("qvec"), _argmax_cell(F.col("qvec"), cents).alias("cell")
    )

    q_rows = (
        quantize_embeddings(query, query_id_col, vec_col)
        .select(F.col(query_id_col).alias("q_id"), F.col("qvec"))
        .collect()
    )
    if len(q_rows) != 1:
        raise ValueError(
            f"kmeans_ivf_topk: query must be exactly one row, got {len(q_rows)}"
        )
    q_id, q_qvec = q_rows[0]["q_id"], [int(v) for v in q_rows[0]["qvec"]]

    qd = [float(v) for v in q_qvec]
    probe_scored = sorted(
        ((c, _seq_cosine(qd, v)) for c, v in cents),
        key=lambda t: (-t[1], t[0]),
    )
    probe_cells = [c for c, _ in probe_scored[:nprobe]]

    q_lit = F.array(*[F.lit(v) for v in q_qvec])
    idot = F.aggregate(
        F.zip_with(F.col("qvec"), q_lit, lambda a, b: a.cast("long") * b.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    inorm = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda v: v.cast("long") * v.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    qdenom = F.nullif(
        F.sqrt(inorm(F.col("qvec"))) * F.sqrt(inorm(q_lit)), F.lit(0.0)
    )
    scored = (
        assigned.filter(F.col("cell").isin([int(c) for c in probe_cells]))
        .filter(F.col(id_col) != F.lit(q_id))
        .select(
            F.col(id_col),
            F.round(idot / qdenom, 6).alias("cosine_sim"),
        )
    )
    # post-limit degenerate-row trim — see similarity.topk_neighbors:
    # a pre-sort filter on the aliased score is pushed below the
    # projection and re-evaluates the integer fold per row
    return (
        scored.orderBy(F.desc_nulls_last("cosine_sim"), F.asc(id_col))
        .limit(k)
        .filter(F.col("cosine_sim").isNotNull())
    )


def ivf_write(
    df: DataFrame,
    path: str,
    n_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Materialize the IVF index: fit centroids, assign the corpus, and
    write it PARTITIONED BY CELL (``path/cell=<c>/...parquet``).  This
    is the 100 TB serving layout — a probe then reads only its cells'
    files via partition pruning instead of scanning the corpus (see
    :func:`ivf_probe_topk`, and the plan test asserting the pruned
    scan).  Returns the fitted centroids; persist them next to the
    index (they are K·dim doubles — the "model" is trivially small).

    The write repartitions by cell so each cell lands as one file set
    written by one task — without it every task would open a file per
    cell (small-files explosion at scale).
    """
    cents = kmeans_fit_quantized(df, n_centroids, iters, id_col, vec_col)
    dq = quantize_embeddings(df, id_col, vec_col, keep=(vec_col,))
    base = dq.filter(_nonzero("qvec")).select(
        F.col(id_col), F.col(vec_col), F.col("qvec")
    )
    assigned = base.withColumn("cell", _argmax_cell(F.col("qvec"), cents))
    (
        assigned.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    return cents


def ivf_probe_topk(
    spark,
    path: str,
    cents: list[tuple[int, list[float]]],
    query: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """Probe a materialized IVF index (:func:`ivf_write`): pick the
    query's ``nprobe`` best cells driver-side (K cosines over the tiny
    centroid model), then scan ONLY those cells' files —
    ``cell IN (...)`` is a partition filter, so the other cells' data
    is never read (PartitionFilters in the scan, proven in
    tests/test_plans.py).  Exact quantized re-rank inside the probed
    cells, same scoring as :func:`kmeans_ivf_topk`."""
    q_rows = (
        quantize_embeddings(query, query_id_col, vec_col)
        .select(F.col(query_id_col).alias("q_id"), F.col("qvec"))
        .collect()
    )
    if len(q_rows) != 1:
        raise ValueError(
            f"ivf_probe_topk: query must be exactly one row, got {len(q_rows)}"
        )
    q_id, q_qvec = q_rows[0]["q_id"], [int(v) for v in q_rows[0]["qvec"]]

    qd = [float(v) for v in q_qvec]
    probe_scored = sorted(
        ((c, _seq_cosine(qd, v)) for c, v in cents), key=lambda t: (-t[1], t[0])
    )
    probe_cells = [int(c) for c, _ in probe_scored[:nprobe]]

    idx = spark.read.parquet(path).filter(F.col("cell").isin(probe_cells))
    q_lit = F.array(*[F.lit(v) for v in q_qvec])
    idot = F.aggregate(
        F.zip_with(F.col("qvec"), q_lit, lambda a, b: a.cast("long") * b.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    inorm = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda v: v.cast("long") * v.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    qdenom = F.nullif(
        F.sqrt(inorm(F.col("qvec"))) * F.sqrt(inorm(q_lit)), F.lit(0.0)
    )
    scored = idx.filter(F.col(id_col) != F.lit(q_id)).select(
        F.col(id_col), F.round(idot / qdenom, 6).alias("cosine_sim")
    )
    return (
        scored.orderBy(F.desc_nulls_last("cosine_sim"), F.asc(id_col))
        .limit(k)
        .filter(F.col("cosine_sim").isNotNull())
    )


def _seq_cosine(a: list[float], b: list[float]) -> float:
    """Sequential left-to-right cosine fold — the same IEEE op sequence
    as the SQL oracle restatement (shared by probe selection here and
    in kmeans_ivf_topk)."""
    num = na = nb = 0.0
    for x, y in zip(a, b):
        num += x * y
    for x in a:
        na += x * x
    for y in b:
        nb += y * y
    d = (na ** 0.5) * (nb ** 0.5)
    return num / d if d != 0.0 else float("-inf")
