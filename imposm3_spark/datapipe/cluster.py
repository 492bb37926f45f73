"""Connected-components clustering over near-duplicate pair edges.

Near-dup detection (MinHash/SimHash/embedding-cosine — datapipe.dedup,
datapipe.similarity) emits PAIRS; a dedup pipeline needs CLUSTERS (keep
one representative per component). This is iterative min-label
propagation — the standard large-graph formulation (alternating
small-star/large-star is the published optimization; plain propagation
converges in O(diameter) rounds, and near-dup graphs have tiny
diameters because components are quasi-cliques).

Scale notes: each round is one shuffle (edge ⋈ label + groupBy-min).
Lineage is truncated every round with localCheckpoint so the plan does
not grow unboundedly; convergence is detected with a count of changed
labels (a cheap aggregate, not a collect of the data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (``node_col``, component) where component = min node id
    reachable through the undirected edge set. Singletons keep their own
    id. ``nodes`` must contain every endpoint (extra nodes fine)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = nodes.select(F.col(node_col).alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    labels = labels.localCheckpoint(eager=True)
    sym = sym.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # min label among neighbours, then fold in the node's own label
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("component").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
                (F.col("nmin") < F.col("component")).alias("__changed"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        changed = updated.filter(F.col("__changed")).limit(1).count()
        labels = updated.drop("__changed")
        if changed == 0:
            break
    return labels.select(F.col("node").alias(node_col), "component")


def dedup_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pair_a: str = "a_id",
    pair_b: str = "b_id",
) -> DataFrame:
    """Keep one row per near-dup cluster (the min-id representative):
    components over the pair graph, then a semi filter on id==component."""
    comp = connected_components(
        df.select(id_col), pairs, node_col=id_col, src=pair_a, dst=pair_b
    )
    keep = comp.filter(F.col(id_col) == F.col("component")).select(id_col)
    return df.join(keep, id_col, "left_semi")
