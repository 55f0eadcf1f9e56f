"""Connected components over similarity pairs — the dedup-cluster
canonicalization step: after MinHash/SimHash emit near-dup PAIRS, the
pipeline must group transitive chains (a~b, b~c ⇒ {a,b,c}) and keep one
canonical representative per cluster.

Iterative min-label propagation, the same driver-loop shape as the
K-Means fit (SURVEY §4.3.1): each round is one join + one map-side-
combined min-aggregate; convergence when no label changes. Rounds
needed = graph diameter (near-dup clusters are tiny chains, so 2–4).
At 100 TB the classic optimization is the large-star/small-star
variant (alternate join directions to cut shuffle volume on skewed
hubs) — the per-round plan here is the small-star half; AQE's skew
split covers hub nodes at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    max_iter: int = 10,
) -> DataFrame:
    """Label every node with the MINIMUM node id reachable through
    ``pairs`` (undirected). Returns (id, component).

    nodes: one column ``id_col``; pairs: columns id_a, id_b.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
    )
    edges.persist()
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("component")
    )
    # labels are monotonically NON-INCREASING under min-propagation, so
    # "no label changed" ⟺ "sum(component) unchanged" — a single
    # map-side-combined aggregate per round instead of a join-with-old
    # + count (halves the per-iteration shuffle work).
    prev_sum = None
    converged = False
    try:
        for i in range(max_iter):
            # every node's candidate label: min over its neighbors' labels
            nbr_min = (
                edges.join(labels, edges.dst == labels.node)
                .groupBy("src")
                .agg(F.min("component").alias("nbr"))
            )
            new_labels = (
                labels.join(nbr_min, labels.node == nbr_min.src, "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("nbr"), F.col("component")),
                    ).alias("component"),
                )
            )
            # truncate lineage every round: localCheckpoint materializes
            # the frame and keeps the driver loop from stacking join plans
            labels = new_labels.localCheckpoint(eager=True)
            cur_sum = labels.agg(F.sum("component")).collect()[0][0]
            if cur_sum == prev_sum:
                converged = True
                break
            prev_sum = cur_sum
    finally:
        edges.unpersist()
    if not converged:
        # min-label propagation needs `diameter` rounds; exiting the loop
        # with the last round still changing labels means the returned
        # components would be silently WRONG (split chains). Fail loudly.
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds (graph diameter exceeds the cap) — raise max_iter, or "
            "switch to large-star/small-star for high-diameter graphs"
        )
    return labels.select(F.col("node").alias(id_col), "component")


def dedup_cluster_representatives(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Canonicalize near-dup clusters: component id IS the minimum
    doc_id, i.e. the kept representative; every other member maps to
    it. Returns (doc_id, rep_id, is_rep) for all docs."""
    comp = connected_components(
        docs.select(id_col), pairs, id_col=id_col
    )
    return comp.select(
        F.col(id_col),
        F.col("component").alias("rep_id"),
        (F.col(id_col) == F.col("component")).alias("is_rep"),
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 10,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list (src, dst) —
    the link-analysis sibling of the K-Means driver loop (SURVEY §4.3.1):
    a fixed number of join + aggregate rounds with localCheckpoint
    lineage truncation.

    Per round: rank mass flows src→dst proportional to 1/out_degree
    (one shuffle join edges⋈ranks on src, one hash aggregate on dst);
    dangling-node mass (no out-edges) is recovered WITHOUT its own
    anti-join pass: every linked node's rank splits fully across its
    out-edges, so sum(contrib) = total linked-rank and dangling =
    sum(ranks) − sum(contrib) — a one-row sum over the already-
    checkpointed contrib frame (tiny-result collect, never data-sized).
    Node count is computed once. At 100 TB: edges partition on src and
    are persisted across rounds; the per-round shuffle is edge-sized,
    ranks are node-sized, and the driver holds only two scalars.

    Returns (node, rank) with sum(rank) == 1 (up to float error).
    """
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # pre-join degree onto edges once so the loop joins a single frame
    flow = e.join(out_deg, "src").select("src", "dst", "deg").persist()
    flow.count()  # materialize before iterating
    ranks = nodes.select("node", (F.lit(1.0) / n).alias("rank"))
    total_rank = 1.0
    try:
        for _ in range(n_iter):
            # checkpointing CONTRIB (edge-agg output, node-sized) both
            # truncates lineage and lets the dangling computation reuse
            # the materialized partitions instead of a second pass
            contrib = (
                flow.join(ranks, flow.src == ranks.node)
                .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("contrib"))
                .localCheckpoint(eager=True)
            )
            linked = contrib.agg(F.sum("contrib")).collect()[0][0] or 0.0
            dangling = max(total_rank - linked, 0.0)
            base = (1.0 - damping) / n + damping * dangling / n
            ranks = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            total_rank = n * base + damping * linked
    finally:
        nodes.unpersist()
        flow.unpersist()
    return ranks
