"""Distributed PCA: top principal direction of an embedding column via
power iteration on the exact integer Gram matrix — bit-identical across
engines and cluster sizes.

Reference parity note: imposm3 has no linear-algebra surface; this is
the distributed-linear-algebra flagship of the analytics-engine
extension set (the pattern spectral methods follow on Spark: exact
sufficient statistics distributed, bounded model state iterated).

Why it hash-matches a SQL oracle exactly
----------------------------------------

* Inputs quantize ONCE to integers ``q_i = round(e_i * QSCALE)``; the
  Gram matrix ``G[i,j] = sum_rows q_i * q_j`` is an exact BIGINT
  aggregate — order-free, so partitioning cannot change it. Each task
  accumulates its partial Gram with ONE int64 numpy matmul and emits
  dim^2 rows; the global sum is a (i,j)-keyed aggregation.
* The power iteration stays in integers: ``u = G @ v`` (exact products,
  order-free sums), then L-infinity normalization with integer division
  ``v' = u div (max|u| div VSCALE)`` — divide-by-quotient instead of
  multiply-then-divide so no intermediate exceeds |u| (BIGINT-safe), no
  sqrt, no floats; Spark's ``div`` truncation matches DuckDB's ``//``
  for negatives too (both truncate toward zero; verified).
* Start vector all-ones fixes the sign deterministically.

Scale design (100 TB)
---------------------

* ONE corpus pass builds the Gram (map-side numpy matmul per Arrow
  batch, dim^2 partial rows per task — bounded by dim, not rows).
* Iterations run on the dim^2-row Gram against the dim-row vector —
  broadcast-sized joins, zero driver collects in the loop.
* Overflow headroom is row-count-INDEPENDENT: the summed Gram is
  divided by n (exact integer division — the mean outer product, same
  eigenvectors) before iterating, so |G'| <= QSCALE^2 and each matvec
  term <= dim * QSCALE^2 * VSCALE ~ 6e13 regardless of corpus size.
  Only the raw Gram sum itself grows with n (BIGINT-safe to ~9e12 rows
  at QSCALE=1e3; the oracle's HUGEINT is wider still).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QSCALE = 1_000
VSCALE = 1_000_000


def gram_matrix(
    emb: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """Exact integer Gram matrix of the quantized vectors: (i, j, g) with
    1-based dimension indices."""
    import numpy as np
    import pandas as pd

    if dim is None:
        head = emb.select(F.size(F.col(vec_col)).alias("d")).head()
        if head is None:
            raise ValueError("empty embedding table")
        dim = int(head["d"])

    q = F.transform(
        F.col(vec_col),
        lambda e: F.round(e.cast("double") * F.lit(float(QSCALE))).cast("long"),
    )
    src = emb.select(q.alias("q"))
    d = dim

    def partial(batches):
        acc = np.zeros((d, d), dtype=np.int64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            X = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["q"]])
            acc += X.T @ X
        if seen:
            ii, jj = np.meshgrid(np.arange(1, d + 1), np.arange(1, d + 1), indexing="ij")
            yield pd.DataFrame(
                {"i": ii.ravel().astype("int32"), "j": jj.ravel().astype("int32"),
                 "g": acc.ravel()}
            )

    parts = src.mapInPandas(partial, "i int, j int, g long")
    return parts.groupBy("i", "j").agg(F.sum("g").alias("g"))


def top_component(
    emb: DataFrame,
    vec_col: str = "embedding",
    iterations: int = 3,
    dim: int | None = None,
) -> DataFrame:
    """Top principal direction after `iterations` integer power steps:
    (i, loading) with loading = v_i / VSCALE as one fixed division."""
    if dim is None:
        head = emb.select(F.size(F.col(vec_col)).alias("d")).head()
        if head is None:
            raise ValueError("empty embedding table")
        dim = int(head["d"])

    spark = emb.sparkSession
    n = emb.count()  # one bounded scalar: the Gram normalizer
    # ONE corpus pass, materialized: every iteration re-reads the dim^2
    # Gram cache, never the source (without this the lazy lineage would
    # re-derive the Gram — and re-scan the corpus — per iteration).
    G = (
        gram_matrix(emb, vec_col=vec_col, dim=dim)
        .select("i", "j", F.expr(f"g div {max(n, 1)}").alias("g"))
        .localCheckpoint(eager=True)
    )
    v = spark.createDataFrame(
        [(i, VSCALE) for i in range(1, dim + 1)], "i int, v long"
    )
    for _ in range(iterations):
        u = (
            G.join(F.broadcast(v.withColumnRenamed("i", "j")), on="j")
            .groupBy("i")
            .agg(F.sum(F.col("g") * F.col("v")).alias("u"))
            # dim rows; materialize so the max-abs branch and the update
            # branch share one computation
            .localCheckpoint(eager=True)
        )
        mx = u.agg(F.max(F.abs(F.col("u"))).alias("m"))
        v = u.join(F.broadcast(mx)).select(
            "i",
            F.expr(
                f"u div (CASE WHEN (m div {VSCALE}) = 0 THEN 1 "
                f"ELSE m div {VSCALE} END)"
            ).alias("v"),
        )
    return v.select(
        "i",
        F.round(F.col("v").cast("double") / F.lit(float(VSCALE)), 6).alias(
            "loading"
        ),
    )


def oracle_sql(iterations: int = 3, dim: int = 64) -> str:
    """DuckDB oracle: identical quantization, Gram, and integer power
    steps unrolled (HUGEINT intermediates are exact, values equal)."""
    parts = [
        f"""
WITH qp AS MATERIALIZED (
  SELECT list_transform(embedding,
           e -> CAST(round(CAST(e AS DOUBLE) * {float(QSCALE)}) AS BIGINT)) AS q
  FROM embeddings
), dims AS (SELECT unnest(range(1, {dim + 1})) AS i),
gram AS MATERIALIZED (
  SELECT i, j, g // (SELECT count(*) FROM qp) AS g FROM (
    SELECT di.i AS i, dj.i AS j, sum(q[di.i] * q[dj.i]) AS g
    FROM qp CROSS JOIN dims di CROSS JOIN dims dj
    GROUP BY 1, 2
  )
), v0 AS (SELECT i, CAST({VSCALE} AS BIGINT) AS v FROM dims)"""
    ]
    prev = "v0"
    for it in range(1, iterations + 1):
        parts.append(
            f""", u{it} AS MATERIALIZED (
  SELECT g.i, sum(g.g * v.v) AS u FROM gram g JOIN {prev} v ON v.i = g.j
  GROUP BY 1
), m{it} AS (SELECT max(abs(u)) AS m FROM u{it}),
v{it} AS MATERIALIZED (
  SELECT i, u // (CASE WHEN (m // {VSCALE}) = 0 THEN 1
                  ELSE m // {VSCALE} END) AS v
  FROM u{it} CROSS JOIN m{it}
)"""
        )
        prev = f"v{it}"
    parts.append(
        f"""
SELECT i, round(CAST(v AS DOUBLE) / {float(VSCALE)}, 6) AS loading FROM {prev}"""
    )
    return "".join(parts)
