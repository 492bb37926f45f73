"""Distributed Lloyd's k-means over an embedding column — deterministic
and bit-identical across engines.

Reference parity note: imposm3 has no ML surface; this is the iterative-
algorithm flagship of the analytics-engine extension set (the pattern any
trainable-on-Spark component follows: broadcast model state, scan-assign,
aggregate-update, repeat).

Why it hash-matches a SQL oracle exactly
----------------------------------------

Naive float k-means is not reproducible across engines: centroid means
depend on float summation ORDER, which differs between Spark partial
aggregation and DuckDB. This implementation removes all order dependence:

* Inputs are quantized ONCE to integers: ``q_i = round(e_i * SCALE)`` as
  BIGINT. All centroid state is exact: ``(s = elementwise SUM(q), n)``.
  Integer sums are associative/commutative — shuffle order cannot change
  them.
* The only floats are per-point distance evaluations, computed as ONE
  fixed-order left fold: ``d = (sum_i t_i^2) / n^2`` with
  ``t_i = double(n * q_i - s_i)`` — each term exact in BIGINT first, the
  fold running i = 0..dim-1 in index order in BOTH engines (Spark
  ``aggregate`` == DuckDB ``list_reduce`` over the same square list,
  identical IEEE-754 operation sequence). Note ``d`` is the squared
  distance to the EXACT rational centroid ``s/n``, scaled by SCALE^2 —
  argmin is invariant to the positive scale.
* Ties (equal distance to two centroids) break to the lowest cluster id
  in both engines.
* Init is deterministic: the k lowest-``id_col`` points seed clusters
  0..k-1 in id order. Empty clusters keep their previous centroid.

Scale design (100 TB)
---------------------

* The quantized projection is checkpointed once; every iteration re-reads
  that columnar cache, not the source parquet.
* Centroid state is k rows — collected to the driver (bounded by k, not
  by data) and re-broadcast into the assignment expression as literals,
  so assignment is a pure JVM projection with ZERO join/shuffle; the only
  shuffle per iteration is the k-group centroid aggregation, which
  combines map-side into k partial rows per task.
* No per-row Python: the whole loop is Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def _quantize(emb: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    q = F.transform(
        F.col(vec_col),
        lambda e: F.round(e.cast("double") * F.lit(float(SCALE))).cast("long"),
    )
    return emb.select(F.col(id_col).alias("vec_id"), q.alias("q"))


def _dist(qcol: Column, s: list[int], n: int, dim: int) -> Column:
    """Squared distance (x SCALE^2) to the exact rational centroid s/n as a
    fixed-order fold: sum_i double(n*q_i - s_i)^2 / double(n)^2."""
    s_arr = F.array(*[F.lit(int(v)) for v in s])

    def step(acc: Column, i: Column) -> Column:
        t = (
            F.lit(int(n)) * F.element_at(qcol, i + 1)
            - F.element_at(s_arr, i + 1)
        ).cast("double")
        return acc + t * t

    total = F.aggregate(F.sequence(F.lit(0), F.lit(dim - 1)), F.lit(0.0), step)
    return total / (F.lit(float(n)) * F.lit(float(n)))


def _run_lloyd(
    emb: DataFrame,
    k: int,
    iterations: int,
    vec_col: str,
    id_col: str,
):
    """Shared Lloyd loop: returns (qp, centroids, dim) after `iterations`
    rounds, or None for an empty input."""
    # One source scan; iterations re-read the quantized columnar cache.
    qp = _quantize(emb, vec_col, id_col).localCheckpoint(eager=True)

    # Deterministic seed: k lowest-id points, cluster = rank in id order.
    # The seed rows also carry the dimensionality — one driver job, not two.
    seed = qp.orderBy("vec_id").limit(k).collect()
    if not seed:
        return None
    dim = len(seed[0]["q"])
    centroids: list[tuple[list[int], int]] = [(list(r["q"]), 1) for r in seed]

    def assign(df: DataFrame) -> DataFrame:
        cands = F.array(
            *[
                F.struct(
                    _dist(F.col("q"), s, n, dim).alias("d"),
                    F.lit(j).alias("c"),
                )
                for j, (s, n) in enumerate(centroids)
            ]
        )
        return df.select(
            "vec_id", "q", F.array_min(cands).getField("c").alias("cluster")
        )

    for _ in range(iterations):
        assigned = assign(qp)
        agg = (
            assigned.groupBy("cluster")
            .agg(
                *[
                    F.sum(F.element_at("q", i + 1)).alias(f"s{i}")
                    for i in range(dim)
                ],
                F.count(F.lit(1)).alias("n"),
            )
            .collect()  # k rows — bounded by k, not by data size
        )
        by_cluster = {
            r["cluster"]: ([int(r[f"s{i}"]) for i in range(dim)], int(r["n"]))
            for r in agg
        }
        # Empty clusters keep their previous centroid.
        centroids = [
            by_cluster.get(j, centroids[j]) for j in range(len(centroids))
        ]

    return qp, centroids, dim, assign


def lloyd_kmeans(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Run `iterations` rounds of (assign, centroid-update) from the
    deterministic seed, then return the final assignment against the last
    centroids: (vec_id, cluster)."""
    run = _run_lloyd(emb, k, iterations, vec_col, id_col)
    if run is None:
        return emb.sparkSession.createDataFrame([], "vec_id long, cluster int")
    qp, _, _, assign = run
    return assign(qp).select("vec_id", "cluster")


def kmeans_inertia(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-cluster quality after the Lloyd run: (cluster, n_members,
    inertia) where inertia = sum of squared distances of members to their
    (exact rational) centroid, in ORIGINAL units.

    Exactness: the per-point integer fold sum_i (n*q_i - s_i)^2 exceeds
    BIGINT when summed across members, so the accumulator is
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — both exact, both
    order-free, values equal; ONE final fixed-order division maps to
    inertia = D / (n_c^2 * SCALE^2). This is the decimal-exact analog of
    the integer-sufficient-statistics technique for sums that outgrow
    64 bits."""
    run = _run_lloyd(emb, k, iterations, vec_col, id_col)
    if run is None:
        return emb.sparkSession.createDataFrame(
            [], "cluster int, n_members long, inertia double"
        )
    qp, centroids, dim, assign = run
    assigned = assign(qp)

    def point_d(s: list[int], n: int):
        s_arr = F.array(*[F.lit(int(v)) for v in s])

        def step(acc, i):
            t = (
                F.lit(int(n)) * F.element_at(F.col("q"), i + 1)
                - F.element_at(s_arr, i + 1)
            ).cast("decimal(19,0)")
            # square in DECIMAL: t can reach n_c * QSCALE-ish magnitudes,
            # so t^2 outgrows BIGINT for big clusters — the decimal
            # product is exact with 38 digits of headroom
            return acc + t * t

        return F.aggregate(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            F.lit(0).cast("decimal(38,0)"),
            step,
        )

    d_expr = None
    for j, (s, n) in enumerate(centroids):
        branch = point_d(s, n)
        d_expr = (
            F.when(F.col("cluster") == j, branch)
            if d_expr is None
            else d_expr.when(F.col("cluster") == j, branch)
        )
    per_point = assigned.select("cluster", d_expr.alias("d"))
    agg = per_point.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"), F.sum("d").alias("D")
    )
    n_arr = F.array(*[F.lit(float(n)) for _, n in centroids])
    nc = F.element_at(n_arr, F.col("cluster") + 1)
    return agg.select(
        "cluster",
        "n_members",
        F.round(
            F.col("D").cast("double")
            / (nc * nc * F.lit(float(SCALE) * float(SCALE))),
            6,
        ).alias("inertia"),
    )


def oracle_sql(k: int = 8, iterations: int = 3, dim: int = 64) -> str:
    """Generate the DuckDB oracle: the identical computation unrolled as
    materialized CTE stages (same quantization, same fixed-order fold,
    same tie-break, same empty-cluster coalesce)."""
    dist = (
        "list_reduce(list_transform(range(1, {hi}), i -> "
        "(CAST(c.n * p.q[i] - c.s[i] AS DOUBLE) * "
        "CAST(c.n * p.q[i] - c.s[i] AS DOUBLE))), (a, b) -> a + b) "
        "/ (CAST(c.n AS DOUBLE) * CAST(c.n AS DOUBLE))"
    ).format(hi=dim + 1)
    sums = ", ".join(f"sum(q[{i + 1}])" for i in range(dim))
    parts = [
        f"""
WITH qp AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
           e -> CAST(round(CAST(e AS DOUBLE) * {float(SCALE)}) AS BIGINT)) AS q
  FROM embeddings
), c0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, q AS s,
         CAST(1 AS BIGINT) AS n
  FROM (SELECT vec_id, q FROM qp ORDER BY vec_id LIMIT {k})
)"""
    ]
    prev = "c0"
    for it in range(1, iterations + 1):
        parts.append(
            f""", a{it} AS MATERIALIZED (
  SELECT vec_id, q, cluster FROM (
    SELECT p.vec_id, p.q, c.cluster,
           row_number() OVER (PARTITION BY p.vec_id
                              ORDER BY {dist}, c.cluster) AS rn
    FROM qp p CROSS JOIN {prev} c
  ) WHERE rn = 1
), g{it} AS (
  SELECT cluster, list_value({sums}) AS s, count(*) AS n
  FROM a{it} GROUP BY cluster
), c{it} AS MATERIALIZED (
  SELECT {prev}.cluster, coalesce(g{it}.s, {prev}.s) AS s,
         coalesce(g{it}.n, {prev}.n) AS n
  FROM {prev} LEFT JOIN g{it} USING (cluster)
)"""
        )
        prev = f"c{it}"
    parts.append(
        f"""
SELECT vec_id, CAST(cluster AS INTEGER) AS cluster FROM (
  SELECT p.vec_id, c.cluster,
         row_number() OVER (PARTITION BY p.vec_id
                            ORDER BY {dist}, c.cluster) AS rn
  FROM qp p CROSS JOIN {prev} c
) WHERE rn = 1"""
    )
    return "".join(parts)


def oracle_sql_inertia(k: int = 8, iterations: int = 3, dim: int = 64) -> str:
    """DuckDB oracle for kmeans_inertia: the same Lloyd chain as
    oracle_sql, then per-point exact HUGEINT fold summed per cluster and
    ONE fixed division (values equal to Spark's DECIMAL(38,0) path)."""
    base = oracle_sql(k=k, iterations=iterations, dim=dim)
    # keep everything up to the final-assign SELECT, which we rebuild to
    # retain q for the distance-to-centroid fold
    cut = base.rindex("\nSELECT vec_id, CAST(cluster AS INTEGER)")
    chain = base[:cut]
    pd_fold = (
        "list_reduce(list_transform(range(1, {hi}), i -> "
        "(CAST(c.n * p.q[i] - c.s[i] AS HUGEINT) * "
        "CAST(c.n * p.q[i] - c.s[i] AS HUGEINT))), (a, b) -> a + b)"
    ).format(hi=dim + 1)
    dist = (
        "list_reduce(list_transform(range(1, {hi}), i -> "
        "(CAST(c.n * p.q[i] - c.s[i] AS DOUBLE) * "
        "CAST(c.n * p.q[i] - c.s[i] AS DOUBLE))), (a, b) -> a + b) "
        "/ (CAST(c.n AS DOUBLE) * CAST(c.n AS DOUBLE))"
    ).format(hi=dim + 1)
    last = f"c{iterations}"
    return (
        chain
        + f""", fin AS MATERIALIZED (
  SELECT vec_id, q, cluster FROM (
    SELECT p.vec_id, p.q, c.cluster,
           row_number() OVER (PARTITION BY p.vec_id
                              ORDER BY {dist}, c.cluster) AS rn
    FROM qp p CROSS JOIN {last} c
  ) WHERE rn = 1
), pp AS (
  SELECT p.cluster, {pd_fold} AS d
  FROM fin p JOIN {last} c ON c.cluster = p.cluster
), agg AS (
  SELECT cluster, count(*) AS n_members, sum(d) AS D FROM pp GROUP BY 1
)
SELECT CAST(a.cluster AS INTEGER) AS cluster, a.n_members,
       round(CAST(a.D AS DOUBLE)
             / (CAST(c.n AS DOUBLE) * CAST(c.n AS DOUBLE)
                * 1000000000000.0), 6) AS inertia
FROM agg a JOIN {last} c ON c.cluster = a.cluster"""
    )


def silhouette_worst(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 3,
    topn: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-point SIMPLIFIED silhouette after the Lloyd run — a = distance
    to the own centroid, b = distance to the nearest OTHER centroid,
    s = (b − a)/max(a, b) — reported as the `topn` WORST-clustered points
    (lowest s): the boundary/misassigned shortlist a clustering review
    starts from. Simplified silhouette is the O(n·k) form (distances to
    centroids, not all points) — the only form that scales.

    Exactness: a and b reuse the same fixed-order `_dist` fold the
    assignment uses (bit-identical in the oracle); s is one final float
    expression, and the shortlist tie-breaks on vec_id. Per-point output
    sidesteps the order-dependent float MEAN a per-cluster average would
    need.
    """
    run = _run_lloyd(emb, k, iterations, vec_col, id_col)
    if run is None:
        return emb.sparkSession.createDataFrame(
            [], "vec_id long, cluster int, s double"
        )
    qp, centroids, dim, assign = run
    assigned = assign(qp)
    cands = F.array(
        *[
            F.struct(_dist(F.col("q"), s, n, dim).alias("d"), F.lit(j).alias("c"))
            for j, (s, n) in enumerate(centroids)
        ]
    )
    a = F.element_at(F.filter(cands, lambda x: x["c"] == F.col("cluster")), 1)["d"]
    b = F.array_min(F.filter(cands, lambda x: x["c"] != F.col("cluster")))["d"]
    s_expr = F.when(F.greatest(a, b) == 0.0, F.lit(0.0)).otherwise(
        (b - a) / F.greatest(a, b)
    )
    return (
        assigned.select("vec_id", "cluster", F.round(s_expr, 6).alias("s"))
        .orderBy(F.asc("s"), F.asc("vec_id"))
        .limit(topn)
    )


def oracle_sql_silhouette(
    k: int = 8, iterations: int = 3, dim: int = 64, topn: int = 20
) -> str:
    """DuckDB oracle for silhouette_worst: the Lloyd chain from
    oracle_sql, then per-point a/b from the same double fold and the
    identical s expression."""
    base = oracle_sql(k=k, iterations=iterations, dim=dim)
    cut = base.rindex("\nSELECT vec_id, CAST(cluster AS INTEGER)")
    chain = base[:cut]
    dist = (
        "list_reduce(list_transform(range(1, {hi}), i -> "
        "(CAST(c.n * p.q[i] - c.s[i] AS DOUBLE) * "
        "CAST(c.n * p.q[i] - c.s[i] AS DOUBLE))), (a, b) -> a + b) "
        "/ (CAST(c.n AS DOUBLE) * CAST(c.n AS DOUBLE))"
    ).format(hi=dim + 1)
    last = f"c{iterations}"
    return (
        chain
        + f""", fin AS MATERIALIZED (
  SELECT vec_id, q, cluster FROM (
    SELECT p.vec_id, p.q, c.cluster,
           row_number() OVER (PARTITION BY p.vec_id
                              ORDER BY {dist}, c.cluster) AS rn
    FROM qp p CROSS JOIN {last} c
  ) WHERE rn = 1
), dists AS (
  SELECT p.vec_id, p.cluster,
         min(CASE WHEN c.cluster = p.cluster THEN {dist} END) AS a,
         min(CASE WHEN c.cluster != p.cluster THEN {dist} END) AS b
  FROM fin p CROSS JOIN {last} c
  GROUP BY p.vec_id, p.cluster
)
SELECT vec_id, CAST(cluster AS INTEGER) AS cluster,
       round(CASE WHEN greatest(a, b) = 0.0 THEN 0.0
                  ELSE (b - a) / greatest(a, b) END, 6) AS s
FROM dists ORDER BY s ASC, vec_id LIMIT {topn}"""
    )
