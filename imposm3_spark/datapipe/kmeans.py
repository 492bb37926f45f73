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
  by data) and shipped into the assignment kernel as plain Python values,
  so assignment has ZERO join/shuffle; the only shuffle per iteration is
  the k-group centroid aggregation, which combines map-side into k
  partial rows per task.
* The per-row distance kernel is an Arrow-batched numpy loop
  (`_np_dist_matrix`) that replays the Catalyst fold's exact IEEE-754
  operation sequence — int64 ``t = n*q_i − s_i``, cast to double, square,
  left-to-right accumulation, one final division — so its outputs are
  BIT-IDENTICAL to the `_dist` expression (pinned by
  `test_kmeans.py::test_arrow_kernel_matches_catalyst_fold`) and hence to
  the DuckDB ``list_reduce`` oracle. The interpreted Catalyst fold
  remains in this module as the executable spec (`_assign_fold`); the
  Arrow path exists because evaluating a k×dim higher-order fold per row
  is interpreted (non-codegen) in Spark and ~20× slower than the
  vectorized kernel at identical semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def _quantize(emb: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    # NOT spread (round-11 negative result): repartitioning the pin input
    # to cluster parallelism A/B-measured ~+1 s per kmeans query at sf0.1
    # (emb_kmeans 2.64 -> 3.59 s, emb_cluster_ari 4.46 -> 6.11 s medians).
    # The Lloyd loop is iteration-count x per-task-overhead bound, not
    # compute bound: each iteration's Arrow assign pass pays worker+batch
    # setup per partition, and the 64-column centroid agg adds 32 partial
    # maps — all for a numpy kernel that is sub-ms on the whole table.
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


def _np_dist_matrix(Q, centroids):
    """(B, k) matrix of squared distances (× SCALE²) to the exact rational
    centroids, replaying `_dist`'s fold order element-for-element: each
    D[:, j] is built by left-to-right accumulation over i = 0..dim−1 of
    double(n·q_i − s_i)², starting from 0.0, then ONE division by
    double(n)·double(n) — the identical IEEE-754 op sequence, so every
    value is bit-equal to the Catalyst fold and the DuckDB list_reduce."""
    import numpy as np

    B = Q.shape[0]
    D = np.empty((B, len(centroids)), dtype=np.float64)
    for j, (s, n) in enumerate(centroids):
        s_arr = np.asarray(s, dtype=np.int64)
        acc = np.zeros(B, dtype=np.float64)
        for i in range(Q.shape[1]):
            t = (np.int64(n) * Q[:, i] - s_arr[i]).astype(np.float64)
            acc = acc + t * t
        D[:, j] = acc / (float(n) * float(n))
    return D


def _stack_quantized(qs):
    import numpy as np

    return np.stack(qs.to_numpy()).astype(np.int64, copy=False)


def _assign_udf(centroids):
    """Arrow-batched assignment: argmin over `_np_dist_matrix` columns.
    numpy argmin returns the FIRST minimum — the lowest cluster id —
    matching array_min's (d, c) struct tie-break."""
    import pandas as pd

    @F.pandas_udf("int")
    def au(qs):
        if len(qs) == 0:
            return pd.Series([], dtype="int32")
        D = _np_dist_matrix(_stack_quantized(qs), centroids)
        return pd.Series(D.argmin(axis=1).astype("int32"))

    return au


def _assign_fold(df: DataFrame, centroids, dim: int) -> DataFrame:
    """The executable spec: assignment as the pure-Catalyst candidate
    array + fixed-order fold + array_min tie-break. Kept for the
    bit-equality cross-check against the Arrow kernel."""
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


def quantize_pinned(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """The quantized projection, materialized once. Callers running
    SEVERAL Lloyd configurations over the same embeddings (e.g. the
    seed-stability ARI pair) pass this as `qp` so the source scan +
    quantize + checkpoint happens once instead of per run — the frame is
    identical to what `_run_lloyd` builds internally."""
    return _quantize(emb, vec_col, id_col).localCheckpoint(eager=True)


def _run_lloyd(
    emb: DataFrame,
    k: int,
    iterations: int,
    vec_col: str,
    id_col: str,
    seed_skip: int = 0,
    qp: DataFrame | None = None,
):
    """Shared Lloyd loop: returns (qp, centroids, dim) after `iterations`
    rounds, or None for an empty input. `seed_skip` offsets the
    deterministic seed window (ranks seed_skip..seed_skip+k-1 in id
    order) — the second-run knob for seed-stability evaluation."""
    # One source scan; iterations re-read the quantized columnar cache.
    if qp is None:
        qp = quantize_pinned(emb, vec_col, id_col)

    # Deterministic seed: k lowest-id points (after the skip), cluster =
    # rank in id order. Seed rows also carry the dimensionality.
    seed = qp.orderBy("vec_id").limit(k + seed_skip).collect()[seed_skip:]
    if not seed:
        return None
    dim = len(seed[0]["q"])
    centroids: list[tuple[list[int], int]] = [(list(r["q"]), 1) for r in seed]

    def assign(df: DataFrame) -> DataFrame:
        return df.select(
            "vec_id", "q", _assign_udf(centroids)("q").alias("cluster")
        )

    # The centroid-update aggregate list depends only on `dim` — build the
    # Column objects ONCE, not per iteration: each element_at/sum/alias is
    # a py4j round trip, and dim x iterations of them (~0.45 s per
    # iteration at dim=64) was pure driver-side construction overhead.
    sum_cols = [
        F.sum(F.element_at("q", i + 1)).alias(f"s{i}") for i in range(dim)
    ]
    cnt_col = F.count(F.lit(1)).alias("n")

    for _ in range(iterations):
        assigned = assign(qp)
        agg = (
            assigned.groupBy("cluster")
            .agg(*sum_cols, cnt_col)
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
    seed_skip: int = 0,
    qp: DataFrame | None = None,
) -> DataFrame:
    """Run `iterations` rounds of (assign, centroid-update) from the
    deterministic seed, then return the final assignment against the last
    centroids: (vec_id, cluster). `qp` optionally supplies a pre-pinned
    quantized projection (see quantize_pinned)."""
    run = _run_lloyd(emb, k, iterations, vec_col, id_col, seed_skip=seed_skip, qp=qp)
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

    import pandas as pd

    @F.pandas_udf("cluster int, d decimal(38,0)")
    def point_d(qs):
        """Assignment + exact integer Σ(n·q_i − s_i)² per point, in
        arbitrary-precision Python ints (the Arrow analog of the
        DECIMAL(38,0) fold — t² outgrows BIGINT for big clusters, so the
        square must be exact beyond 64 bits; values equal the oracle's
        HUGEINT fold)."""
        from decimal import Decimal

        import numpy as np

        if len(qs) == 0:
            return pd.DataFrame(
                {"cluster": pd.Series([], dtype="int32"), "d": []}
            )
        Q = _stack_quantized(qs)
        D = _np_dist_matrix(Q, centroids)
        cl = D.argmin(axis=1)
        ds = []
        for r in range(Q.shape[0]):
            s, n = centroids[int(cl[r])]
            nn = int(n)
            tot = 0
            qr = Q[r]
            for i in range(len(s)):
                t = nn * int(qr[i]) - int(s[i])
                tot += t * t
            ds.append(Decimal(tot))
        return pd.DataFrame({"cluster": cl.astype("int32"), "d": ds})

    per_point = qp.select(point_d("q").alias("st")).select(
        F.col("st.cluster").alias("cluster"), F.col("st.d").alias("d")
    )
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


def oracle_sql(
    k: int = 8, iterations: int = 3, dim: int = 64, seed_skip: int = 0
) -> str:
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
  FROM (SELECT vec_id, q FROM qp ORDER BY vec_id LIMIT {k} OFFSET {seed_skip})
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

    import pandas as pd

    @F.pandas_udf("cluster int, a double, b double")
    def sil(qs):
        import numpy as np

        if len(qs) == 0:
            return pd.DataFrame(
                {"cluster": pd.Series([], dtype="int32"), "a": [], "b": []}
            )
        D = _np_dist_matrix(_stack_quantized(qs), centroids)
        rows = np.arange(D.shape[0])
        cl = D.argmin(axis=1)
        a = D[rows, cl]
        other = D.copy()
        other[rows, cl] = np.inf
        b = other.min(axis=1)
        return pd.DataFrame({"cluster": cl.astype("int32"), "a": a, "b": b})

    st = qp.select("vec_id", sil("q").alias("st"))
    a, b = F.col("st.a"), F.col("st.b")
    # the s expression and rounding stay in Catalyst, unchanged — a and b
    # are bit-identical to the fold values, so s is too
    s_expr = F.when(F.greatest(a, b) == 0.0, F.lit(0.0)).otherwise(
        (b - a) / F.greatest(a, b)
    )
    return (
        st.select(
            "vec_id", F.col("st.cluster").alias("cluster"), F.round(s_expr, 6).alias("s")
        )
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


# Adjusted Rand Index from exact pair-count sums: with idx = sum_ij
# C(n_ij,2), aa = sum_i C(a_i,2), bb = sum_j C(b_j,2), tt = C(n,2),
# ARI = (idx - aa*bb/tt) / ((aa+bb)/2 - aa*bb/tt). One shared string.
ARI = (
    "round((CAST(idx AS DOUBLE) - CAST(aa AS DOUBLE)*CAST(bb AS DOUBLE)/CAST(tt AS DOUBLE))"
    " / ((CAST(aa AS DOUBLE) + CAST(bb AS DOUBLE))/2.0"
    " - CAST(aa AS DOUBLE)*CAST(bb AS DOUBLE)/CAST(tt AS DOUBLE)), 6)"
)


def adjusted_rand_index(
    a1: DataFrame, a2: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Exact Adjusted Rand Index between two (id, cluster) assignments —
    the seed-stability / reproducibility readout for any clustering
    (ARI 1 = identical partitions up to relabeling, ~0 = chance
    agreement; Hubert & Arabie '85).

    Exactness: every term is a pair count C(m,2) = m(m-1) div 2 from the
    k x k contingency table — exact integers accumulated in
    DECIMAL(38,0)/HUGEINT; the ARI is the ONE shared expression (ARI).
    Degenerate partitions (both trivial, expected == max) are excluded
    by an exact integer predicate.

    Scale: one id-keyed equi-join, one k*k-group aggregation, two
    marginal rollups — all map-side combinable; nothing driver-sized.
    """
    j = a1.select(F.col(id_col).alias("i"), F.col("cluster").alias("c1")).join(
        a2.select(F.col(id_col).alias("i"), F.col("cluster").alias("c2")), "i"
    )
    ct = j.groupBy("c1", "c2").agg(F.count(F.lit(1)).alias("m")).localCheckpoint(
        eager=False
    )
    dec = "decimal(38,0)"
    pairs = lambda c: (F.col(c).cast(dec) * (F.col(c) - 1) / 2).cast(dec)  # noqa: E731
    idx = ct.agg(
        F.sum(pairs("m")).alias("idx"), F.sum("m").alias("n")
    )
    aa = (
        ct.groupBy("c1").agg(F.sum("m").alias("a"))
        .agg(F.sum(pairs("a")).alias("aa"))
    )
    bb = (
        ct.groupBy("c2").agg(F.sum("m").alias("b"))
        .agg(F.sum(pairs("b")).alias("bb"))
    )
    g = idx.crossJoin(F.broadcast(aa)).crossJoin(F.broadcast(bb)).select(
        "n",
        "idx",
        "aa",
        "bb",
        (F.col("n").cast(dec) * (F.col("n") - 1) / 2).cast(dec).alias("tt"),
    )
    # exclude the degenerate case max == expected (2*aa*bb == tt*(aa+bb))
    keep = (
        F.col("tt").cast(dec) * (F.col("aa") + F.col("bb"))
        != F.lit(2).cast(dec) * F.col("aa") * F.col("bb")
    )
    return g.where(F.col("n") > 1).where(keep).select(
        "n", F.expr(ARI).alias("ari")
    )
