"""Connected-components clustering over near-duplicate pair edges.

Near-dup detection (MinHash/SimHash/embedding-cosine — datapipe.dedup,
datapipe.similarity) emits PAIRS; a dedup pipeline needs CLUSTERS (keep
one representative per component). Algorithm: multi-level partition-local
union-find contraction —

  1. hash-partition the edge list; each partition runs an in-memory
     union-find (path compression + union-by-min) over its edges in ONE
     pass and emits the (node, partition-local root) mapping;
  2. the quotient "root graph" (original edges re-keyed to their
     endpoints' roots) is strictly smaller; recurse on it;
  3. when the edge list fits a single task, one union-find finishes the
     job; labels compose back down the levels with one join per level.

This is O(log_k n) *levels* where k is the per-partition contraction
factor — versus O(diameter) shuffle rounds for plain min-label
propagation. Chains of near-duplicates (doc A ~ B ~ C ... with A !~ C)
make diameter-bound loops pathological; contraction is immune. Each
level is one mapInPandas pass + (for non-final levels) two joins to
re-key edges. Parallelism is sized to the GRAPH (~2M edges per task),
not the session default: the pair graph of a 100 TB corpus is orders of
magnitude smaller than the corpus, and fixed 32-partition stages over a
few thousand edges pay pure scheduler overhead per round.

Only edge ENDPOINTS participate at all: almost every document is a
singleton and a singleton's component is trivially its own id; they are
appended with a single union at the end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# edges a single in-memory union-find task handles comfortably (dict-based
# UF is ~100ns/op; 2M edges ≈ a few hundred ms and a few hundred MB worst
# case — well inside executor memory)
_EDGES_PER_TASK = 2_000_000

# below this many edges the graph is union-found on the DRIVER (one collect
# of a few MB) instead of spinning up the distributed contraction — the
# per-level job overhead dwarfs the work for small graphs
_DRIVER_EDGES = 200_000


def _uf_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Union-find over one partition's (a, b) edges -> (node, root) rows."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    seen: set = set()
    for pdf in batches:
        for a, b in zip(pdf["a"], pdf["b"]):
            seen.add(a)
            seen.add(b)
            ra, rb = find(a), find(b)
            if ra == rb:
                continue
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    nodes = list(seen)
    yield pd.DataFrame({"node": nodes, "root": [find(x) for x in nodes]})


def _cc_on_edges(edges: DataFrame, depth: int = 0) -> DataFrame:
    """(node, component) for every endpoint of the (a, b) edge list.

    Eager: localCheckpoint + count materialize each level immediately (the
    level count decides the next level's partitioning, and checkpointing
    truncates the per-level lineage that would otherwise grow
    exponentially). Callers see Spark jobs run at DataFrame-construction
    time, not at first action."""
    # cache + count first (ONE job decides the path); only the distributed
    # branch pays the lineage-truncating localCheckpoint — checkpointing
    # before counting ran a wasted materialization job per level on graphs
    # that take the driver fast path
    cached = edges.persist()
    n_edges = cached.count()
    if n_edges <= _DRIVER_EDGES:
        edges = cached
        # small-graph fast path: the distributed machinery (Python worker
        # spin-up, repartition, per-level checkpoints) costs seconds of
        # job overhead while the actual union-find is microseconds.
        # Collecting <=200k edges is bounded driver memory (a few MB) —
        # the same bound as the single-task fallback, minus the jobs.
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        seen: set = set()
        for a, b in edges.collect():
            seen.add(a)
            seen.add(b)
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        typ = dict(edges.dtypes)["a"]
        spark = edges.sparkSession
        cached.unpersist()
        if not seen:
            return spark.createDataFrame([], schema=f"node {typ}, component {typ}")
        # Arrow path (pandas) — the row-list createDataFrame pickles each
        # tuple through the JVM (~1 s at 74k labels vs ~0.1 s via Arrow)
        nodes = list(seen)
        pdf = pd.DataFrame({"node": nodes, "component": [find(x) for x in nodes]})
        return spark.createDataFrame(pdf, schema=f"node {typ}, component {typ}")
    # distributed levels: truncate the per-level lineage (reads the cache,
    # so the checkpoint job is a copy, not a recompute), then release the cache
    edges = cached.localCheckpoint(eager=True)
    cached.unpersist()
    # partitions sized to the GRAPH, deliberately not capped at
    # defaultParallelism: per-task edge count must stay <= _EDGES_PER_TASK
    # (the in-memory union-find dict is the bound), and Spark happily runs
    # more partitions than cores by queueing them
    parts = max(1, n_edges // _EDGES_PER_TASK + 1)
    if depth >= 8:
        # contraction stalled (adversarial graph): finishing in ONE task is
        # only safe when the remainder actually fits one union-find
        if n_edges > 4 * _EDGES_PER_TASK:
            raise RuntimeError(
                f"connected_components: contraction stalled at depth {depth} "
                f"with {n_edges} edges — graph too large for the single-task "
                "fallback; raise _EDGES_PER_TASK or partition the input"
            )
        parts = 1  # fallback: bounded depth, finish in one task
    typ = dict(edges.dtypes)["a"]
    mapping = (
        edges.repartition(parts)
        .mapInPandas(_uf_partition, schema=f"node {typ}, root {typ}")
        .localCheckpoint(eager=True)
    )
    if parts == 1:
        return mapping.select("node", F.col("root").alias("component"))
    # quotient graph: re-key each edge to its endpoints' roots. A node seen
    # by several partitions has several mapping rows; the join fans out to
    # all root combinations, which is exactly what keeps the root graph
    # connected across partitions.
    ma = mapping.select(F.col("node").alias("a"), F.col("root").alias("ra"))
    mb = mapping.select(F.col("node").alias("b"), F.col("root").alias("rb"))
    root_edges = (
        edges.join(ma, "a")
        .join(mb, "b")
        .select(F.col("ra").alias("a"), F.col("rb").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    root_labels = _cc_on_edges(root_edges, depth + 1).withColumnsRenamed(
        {"node": "__r", "component": "__c"}
    )
    return (
        mapping.join(root_labels, mapping["root"] == F.col("__r"), "left")
        .select(
            "node", F.coalesce(F.col("__c"), F.col("root")).alias("component")
        )
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


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
    id. Output rows are exactly the distinct ``nodes`` ids: edge endpoints
    absent from ``nodes`` are labeled internally (they still connect
    components) but filtered from the result.

    Eager execution: this runs Spark jobs immediately (per-level
    localCheckpoint/count inside the contraction — see _cc_on_edges), not
    lazily at the caller's first action.

    ``max_iter`` is kept for API compatibility; the contraction scheme's
    depth is bounded internally (8 levels ≫ any real graph)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    labels = _cc_on_edges(e)
    wanted = nodes.select(F.col(node_col).alias("node")).distinct()
    singletons = wanted.join(labels.select("node"), "node", "left_anti").withColumn(
        "component", F.col("node")
    )
    return (
        labels.join(wanted, "node", "left_semi")
        .union(singletons)
        .select(F.col("node").alias(node_col), "component")
    )


def dedup_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pair_a: str = "a_id",
    pair_b: str = "b_id",
) -> DataFrame:
    """Keep one row per near-dup cluster (the min-id representative).

    Shape: components are labeled for edge ENDPOINTS only (_cc_on_edges),
    and the non-representatives among them (node != component) become a
    drop list for ONE anti join. The round-2 formulation went through
    connected_components — a distinct over ALL of df's ids, a left_anti to
    find singletons, a union, then a semi join — three extra shuffles of
    corpus-sized id sets to re-derive the fact that singletons and
    component minima are kept, which the anti join encodes for free.
    Identical output for non-NULL ids: a df row is dropped iff it is a
    labeled endpoint whose component min is some other id (rows absent
    from the label set are singletons, kept by both formulations; pinned
    by test_graph.py/test_curation.py cluster tests). One deliberate
    divergence: a df row whose id is NULL is KEPT here (NULL never
    matches the anti join's drop list), whereas the round-2 semi-join
    formulation dropped it (NULL never matched the keep list either).
    A NULL id carries no dedup identity, so treating it as a degenerate
    singleton is the defensible default; callers that want the old
    behavior filter NULL ids upstream. Pinned by
    test_curation.py::test_dedup_representatives_keeps_null_ids."""
    edges = pairs.select(F.col(pair_a).alias("a"), F.col(pair_b).alias("b"))
    labels = _cc_on_edges(edges)
    drop = labels.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")
