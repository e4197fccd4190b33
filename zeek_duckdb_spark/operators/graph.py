"""Graph operators for dedup pipelines: connected components over
near-duplicate candidate pairs.

Pair generation (minhash_lsh_pairs / simhash_pairs / cosine_pairs)
yields EDGES; an actual dedup pass needs the transitive closure — one
representative per duplicate CLUSTER.  This module computes it with
iterative min-label propagation, the standard Pregel-style shape:

- state is a (vertex, label) DataFrame, label = min vertex id reached;
- one iteration = join labels to edges + min-aggregate per neighbor +
  elementwise min with the old label: two shuffles on the vertex key;
- iterate until a fixed point.  Labels decrease monotonically, so
  sum(label) is a strictly decreasing convergence metric — one cheap
  scalar action per iteration instead of a change-count join;
- ``localCheckpoint`` after each iteration truncates the lineage (an
  iterative plan would otherwise grow two joins per round and overwhelm
  the optimizer) and materializes the ~|V| label rows on executors.

Scale: every iteration shuffles |E| + |V| narrow rows on vertex keys;
iteration count is the cluster DIAMETER, which for near-dup clusters is
small (a dup cluster is near-clique by construction — most pairs are
direct edges).  For adversarial long-chain graphs the alternating
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14) converges in O(log n) rounds with
the same per-round shuffle shape; min-label propagation is the right
default for dedup workloads and is exactly restatable as a recursive
SQL closure for the oracle.

The fixed point is unique (min reachable id per component), so results
are deterministic regardless of execution order — oracle-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_clusters", "pagerank", "resolve_clusters"]


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(vertex, component) for every vertex appearing in ``pairs``;
    ``component`` = min vertex id in the connected component.

    Raises if the propagation has not converged after ``max_iter``
    rounds (diameter > max_iter — pathological for dedup graphs)."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("v"))
        .distinct()
        .withColumn("component", F.col("v"))
    )
    edges = edges.localCheckpoint(eager=False)
    labels = labels.localCheckpoint(eager=False)
    prev_sum = labels.agg(F.sum("component")).first()[0]
    if prev_sum is None:  # no edges at all
        return labels
    for _ in range(max_iter):
        prop = (
            edges.join(labels, edges.dst == labels.v)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        labels = (
            labels.join(prop, labels.v == prop.src, "left")
            .select(
                labels.v,
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=False)
        )
        new_sum = labels.agg(F.sum("component")).first()[0]
        if new_sum == prev_sum:  # monotone metric -> fixed point
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations "
        "(component diameter too large — raise max_iter)"
    )


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Duplicate clusters from candidate pairs: one row per cluster with
    the representative (min id), member count, and sorted members.
    The `keep` policy for an actual dedup pass is "keep cluster_id,
    drop the rest"."""
    cc = connected_components(pairs, a_col, b_col)
    return (
        cc.groupBy(F.col("component").alias("cluster_id"))
        .agg(
            F.count("*").alias("cluster_size"),
            F.array_sort(F.collect_list("v")).alias("members"),
        )
    )


def resolve_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    score_col: str | None = None,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Apply a near-dup pass to the corpus: keep ONE representative per
    duplicate cluster, chosen by quality instead of accident.

    ``score_col=None`` keeps the min-id member (the policy
    :func:`dedup_clusters` documents); with a ``score_col`` (e.g. the
    textops quality score) each cluster keeps its HIGHEST-scoring
    member — ties and NULL scores fall back to min id, so the choice
    is deterministic either way.  Docs in no pair pass through
    untouched.

    Scale shape: the corpus never rides a window or a wide shuffle —
    the (vertex, component) labels from :func:`connected_components`
    are |clustered docs| rows (≪ corpus after exact dedup), winners
    are picked with one ``max_by`` aggregate over that small frame,
    and the corpus is filtered by a LEFT ANTI join against the
    (cluster members - winners) loser set, which AQE broadcasts in
    the common case.  An all-dup adversarial corpus degrades to one
    extra |corpus|-key shuffle, never a driver collect.
    """
    out_cols = [F.col(c) for c in df.columns]
    cc = connected_components(pairs, a_col, b_col)
    members = cc.withColumnRenamed("v", "__mid")
    if score_col is not None:
        scored = members.join(
            df.select(
                F.col(id_col).alias("__mid"),
                # NULL scores coalesce to -inf: they lose to every real
                # score, and an all-NULL cluster falls back to min id
                F.coalesce(
                    F.col(score_col).cast("double"), F.lit(float("-inf"))
                ).alias("__score"),
            ),
            "__mid",
        )
        # one min_by aggregate: ordering key (-score, id) means best
        # score wins, score ties break to min id — no window, no
        # global sort, deterministic
        winners = scored.groupBy("component").agg(
            F.expr(
                "min_by(__mid, named_struct('negs', -__score, 'id', __mid))"
            ).alias("__keep")
        )
    else:
        winners = members.groupBy("component").agg(F.min("__mid").alias("__keep"))
    losers = members.join(
        winners, members.component == winners.component
    ).filter(F.col("__mid") != F.col("__keep")).select(
        F.col("__mid").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti").select(*out_cols)


def pagerank(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    iters: int = 10,
    damping: float = 0.85,
    directed: bool = False,
) -> DataFrame:
    """(vertex, rank) after ``iters`` power iterations of PageRank over
    the edge list — entity-importance ranking for host graphs (which
    machines does everything talk to?) and citation-style doc graphs.

    Spark shape, same budget as :func:`connected_components`: the state
    is a (vertex, rank) frame; one iteration = join ranks to edges on
    src (shuffle co-partitioned by vertex), aggregate contributions per
    dst, and apply the damping update — two shuffles of |E| + |V|
    narrow rows, lineage truncated per round with ``localCheckpoint``.
    Dangling vertices (no out-edges) keep the teleport term only, the
    standard simplification for analytics use.  Deterministic: ranks
    are sums of products in fixed iteration count; the tiny float
    order-dependence of distributed sums is below any ranking use
    (and the tests compare against an independent driver-side power
    iteration with a tolerance).

    ``directed=False`` (default, right for conn logs where talk is
    mutual evidence) symmetrizes the edge list first.
    """
    if iters < 1:
        raise ValueError("pagerank: iters must be >= 1")
    if not 0 < damping < 1:
        raise ValueError("pagerank: damping must be in (0, 1)")
    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    if not directed:
        edges = edges.union(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
    edges = edges.distinct()
    verts = (
        edges.select(F.col("src").alias("v"))
        .union(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    # out-degree rides WITH the edge list so the per-iteration join is
    # rank -> weighted contribution in one pass (degree never recomputed)
    deg = edges.groupBy("src").agg(F.count("*").alias("__deg"))
    edges = edges.join(deg, "src").localCheckpoint(eager=False)
    n = verts.count()
    if n == 0:
        return verts.withColumn("rank", F.lit(0.0))
    verts = verts.localCheckpoint(eager=False)
    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["v"])
            .select(
                F.col("dst").alias("v"),
                (F.col("rank") / F.col("__deg")).alias("__c"),
            )
            .groupBy("v")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = (
            verts.join(contrib, "v", "left")
            .select(
                "v",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("v", F.round("rank", 8).alias("rank"))
