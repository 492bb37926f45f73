"""Graph analytics over event streams: transition-graph extraction and
fixed-point integer PageRank.

Reference parity note: imposm3 has no graph surface beyond relation
membership; this is part of the analytics-engine extension set
(click-path analysis, markov transition ranking).

Why fixed-point integers: distributed float PageRank is not reproducible
— the per-node contribution sum depends on reduction order, which differs
between engines and even between runs of the same engine. Here every
rank is a BIGINT in units of 1/SCALE, every update uses exact integer
multiply + floor division,

    contrib(s->d) = (85 * r_s * cnt) div (100 * out_s)
    r'_d          = (15 * SCALE) div (100 * N) + sum(contribs into d)

and integer sums are order-free, so the result is bit-identical across
engines and cluster sizes. (All operands are positive, so Spark's `div`
truncation == DuckDB's `//` floor.) Dangling-node mass is dropped — the
standard simplification; ranks then sum to <= SCALE.

Scale design (100 TB):

* Edge extraction is one keyed window (lead over the per-key ordering) +
  one (src,dst) aggregation with map-side combine — shuffles on the key
  and on the edge pair, never a global sort.
* The iteration joins edges against the rank table on src — both
  key-partitioned joins; AQE broadcasts the rank side automatically when
  the node set is small (here: event types), and degrades to a
  co-partitioned shuffle join when it is not.
* Per-iteration driver state is ONE scalar (the node count); ranks stay
  distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1_000_000_000


def transition_edges(
    events: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    node_col: str = "event_type",
) -> DataFrame:
    """(src, dst, cnt): counts of consecutive node transitions within each
    key's ordered event sequence."""
    w = Window.partitionBy(key_col).orderBy(*[F.asc(c) for c in order_cols])
    return (
        events.select(
            F.col(node_col).alias("src"),
            F.lead(node_col).over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def pagerank_fixed_point(
    edges: DataFrame, nodes: DataFrame, iterations: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """PageRank (damping damping_pct/100) in SCALE-fixed-point integer
    arithmetic. With damping_pct=100 the base term vanishes and the
    iteration is plain transition-matrix power iteration — the Markov
    stationary-distribution estimator (dangling nodes then leak mass;
    fine for graphs where every node has out-edges, which the caller
    should ensure).

    `edges` carries (src, dst, cnt); `nodes` one `node` row per vertex
    (so isolated vertices keep the base rank). Returns (node, r BIGINT
    fixed-point, rank DOUBLE = r/SCALE rounded to 6).
    """
    # Pin the iteration-invariant inputs: edges joins into EVERY
    # iteration and nodes anchors every ranks rebuild, and Spark performs
    # no cross-iteration subplan reuse — unpinned, a caller like
    # doc_textrank re-tokenizes the whole corpus ~7x (2 reads x 3
    # iterations + the node set). (Values are unchanged: a checkpoint is
    # a materialization barrier, and the arithmetic is exact-integer.)
    #
    # Pin-overhead design (round-10 measured the pins costing more than
    # they saved on the tiny event-type graphs — events_pagerank median
    # 0.46 -> 0.81 s — and an optimizer-size gate cannot tell the graphs
    # apart: post-aggregate estimates rank the 36-edge event-type graph
    # ABOVE the corpus word graph). So keep the pins scale-safe but make
    # them cheap:
    #  * out_cnt is folded into the pinned edges frame with one window
    #    sum over src — one pin instead of two AND one fewer join inside
    #    every iteration (sum(cnt) over (partition by src) == the old
    #    groupBy + join on src, exact-integer).
    #  * the node chain (pin + count) and the edge chain are independent;
    #    each "lazy" localCheckpoint still blocks the driver while AQE
    #    materializes its non-final stages, so run the two chains from
    #    two threads: the pin wall is max(chains), not their sum
    #    (guide §2.6).
    from concurrent.futures import ThreadPoolExecutor

    def _node_chain():
        nd = nodes.localCheckpoint(eager=False)
        return nd, nd.count()  # one bounded scalar on the driver

    def _edge_chain():
        w = Window.partitionBy("src")
        return edges.withColumn(
            "out_cnt", F.sum("cnt").over(w)
        ).localCheckpoint(eager=False)

    with ThreadPoolExecutor(max_workers=2) as pool:
        nodes_f = pool.submit(_node_chain)
        edges_f = pool.submit(_edge_chain)
        nodes, n = nodes_f.result()
        edges = edges_f.result()
    if n == 0:
        return nodes.select(
            "node", F.lit(0).alias("r"), F.lit(0.0).alias("rank")
        )
    ranks = nodes.select("node", F.lit(SCALE // n).cast("long").alias("r"))
    base = ((100 - damping_pct) * SCALE) // (100 * n)

    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .select(
                F.col("dst"),
                F.expr(f"({damping_pct} * r * cnt) div (100 * out_cnt)").alias("c"),
            )
        )
        summed = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(summed, nodes["node"] == summed["dst"], "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("s"), F.lit(0)))
                .cast("long")
                .alias("r"),
            )
        )

    return ranks.select(
        "node",
        "r",
        F.round(F.col("r").cast("double") / F.lit(float(SCALE)), 6).alias("rank"),
    )


def pagerank_oracle(
    edges_sql: str, nodes_sql: str, iterations: int = 3,
    damping_pct: int = 85,
) -> str:
    """DuckDB oracle for pagerank_fixed_point over ANY edge/node SQL:
    `edges_sql` must yield (src, dst, cnt), `nodes_sql` one `node` row
    per vertex. The fixed-point iteration is unrolled identically to the
    Spark loop."""
    parts = [
        f"""
WITH edges AS MATERIALIZED ({edges_sql}
), outs AS MATERIALIZED (
  SELECT src, sum(cnt) AS out_cnt FROM edges GROUP BY 1
), nodes AS MATERIALIZED ({nodes_sql}
), nn AS (SELECT count(*) AS n FROM nodes),
r0 AS MATERIALIZED (
  SELECT node, CAST({SCALE} AS BIGINT) // nn.n AS r FROM nodes CROSS JOIN nn
)"""
    ]
    prev = "r0"
    for it in range(1, iterations + 1):
        parts.append(
            f""", r{it} AS MATERIALIZED (
  SELECT n.node,
         CAST(({100 - damping_pct} * CAST({SCALE} AS BIGINT)) // (100 * nn.n)
              + coalesce(c.s, 0) AS BIGINT) AS r
  FROM nodes n CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS node, sum(({damping_pct} * r.r * e.cnt) // (100 * o.out_cnt)) AS s
    FROM edges e
    JOIN {prev} r ON r.node = e.src
    JOIN outs o ON o.src = e.src
    GROUP BY 1
  ) c ON c.node = n.node
)"""
        )
        prev = f"r{it}"
    parts.append(
        f"""
SELECT node, r, round(CAST(r AS DOUBLE) / {float(SCALE)}, 6) AS rank
FROM {prev}"""
    )
    return "".join(parts)


# The SQL mirror of transition_edges / the distinct node set — ONE
# definition shared by every oracle that walks the event-type transition
# graph (pagerank, markov stationary, transition entropy).
TRANSITION_EDGES_SQL = """
  SELECT src, dst, count(*) AS cnt FROM (
    SELECT event_type AS src,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS dst
    FROM events
  ) WHERE dst IS NOT NULL GROUP BY 1, 2"""

TRANSITION_NODES_SQL = "\n  SELECT DISTINCT event_type AS node FROM events"


def oracle_sql(iterations: int = 3) -> str:
    """DuckDB oracle for events_pagerank: the event-type transition graph
    through the generic pagerank_oracle."""
    return pagerank_oracle(
        TRANSITION_EDGES_SQL, TRANSITION_NODES_SQL, iterations=iterations
    )


def kcore_peel(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 4,
) -> DataFrame:
    """Bounded k-core peeling over an undirected edge list (s, d): each
    round drops every node of degree < k and every edge touching one,
    `rounds` times — the distributed k-core algorithm (each round is one
    degree aggregation + two semi-joins; the classic sequential peel is
    its fixpoint). `rounds` is part of the operator contract so any two
    engines agree regardless of convergence depth; with rounds >= the
    graph's peel depth the result IS the exact k-core.

    Returns (node, degree) for the surviving subgraph — degrees counted
    within the surviving edge set. All exact integers.

    Scale (100 TB): per round, one map-side-combinable degree count and
    two semi-joins keyed on the node — edges shuffle by endpoint, never
    materialize per-node adjacency in memory, no window. Lineage is cut
    with a lazy checkpoint per round so the plan stays rounds-linear.
    """
    e = edges.select("s", "d").distinct().localCheckpoint(eager=False)
    for _ in range(rounds):
        deg = (
            e.select(F.explode(F.array("s", "d")).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        alive = deg.where(F.col("deg") >= k).select("node")
        e = (
            e.join(alive.withColumnRenamed("node", "s"), "s", "left_semi")
            .join(alive.withColumnRenamed("node", "d"), "d", "left_semi")
            .localCheckpoint(eager=False)
        )
    return (
        e.select(F.explode(F.array("s", "d")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def kcore_oracle(edges_sql: str, k: int = 3, rounds: int = 4) -> str:
    """DuckDB oracle for kcore_peel: the identical bounded peel unrolled
    as one CTE triple (degrees, alive, filtered edges) per round."""
    parts = [f"WITH e0 AS MATERIALIZED ({edges_sql})"]
    for r in range(rounds):
        parts.append(
            f""", d{r} AS (
  SELECT node, count(*) AS deg FROM (
    SELECT s AS node FROM e{r} UNION ALL SELECT d AS node FROM e{r}
  ) GROUP BY node
), a{r} AS (SELECT node FROM d{r} WHERE deg >= {k}),
e{r + 1} AS MATERIALIZED (
  SELECT s, d FROM e{r}
  WHERE s IN (SELECT node FROM a{r}) AND d IN (SELECT node FROM a{r})
)"""
        )
    parts.append(
        f"""
SELECT node, count(*) AS degree FROM (
  SELECT s AS node FROM e{rounds} UNION ALL SELECT d AS node FROM e{rounds}
) GROUP BY node"""
    )
    return "".join(parts)
