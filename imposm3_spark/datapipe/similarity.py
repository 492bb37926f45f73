"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k. The dot product is a higher-order
  F.aggregate over zip_with — JVM expressions, no Python. Query side is
  broadcast (it's small by construction); the big side streams at scan
  speed: the only shuffle is the final per-query top-k (tiny).
- lsh_topk: the scale path — random-hyperplane LSH buckets computed as
  expressions; candidates come from a bucket equi-join, then exact rerank.
  At 100 TB the bucket join replaces the cross product; recall is tunable
  via bits/tables.
- cosine_neardup_pairs: embedding-cosine near-duplicate detection —
  all (a, b) pairs with cosine >= threshold. Exact and fully distributed:
  block-pair cogroup where each task matmuls two hash-blocks (no driver
  collect, no whole-corpus broadcast); lsh_neardup_pairs is the
  sub-quadratic approximate scale path (multi-table bucket join + exact
  verify).
- ivf_topk: IVF approximate NN — deterministic k-means coarse quantizer,
  candidates from the nprobe nearest centroid cells, exact rerank.
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


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rows_per_block: int = 8192,
    nblocks: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a_id, b_id, sim) with
    a_id < b_id and round(cosine, 6) >= threshold.

    Exact, fully distributed block-matmul design (no driver collect, no
    whole-corpus broadcast): ids hash into `nblocks` blocks; the small
    (bi <= bj) block-pair grid is broadcast-joined to replicate each row
    to the ~nblocks+1 block pairs it participates in; a cogroup
    `applyInPandas` then scores each (block_i, block_j) pair with ONE
    BLAS matmul. Each task holds two blocks (2 * rows_per_block * dim
    doubles), so memory is bounded regardless of corpus size; shuffle
    volume is n * (nblocks + 1) vector rows — the unavoidable cost
    structure of an exact all-pairs scan, spread evenly across the
    cluster. Every unordered pair lands in exactly one grid cell
    (diagonal cells emit a_id < b_id; off-diagonal blocks are disjoint),
    so no dedup pass is needed. For sub-quadratic cost at true 100 TB
    scale, use lsh_neardup_pairs (approximate) instead.
    """
    spark = embeddings.sparkSession
    base = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    if nblocks is None:
        n = base.count()
        nblocks = max(1, -(-n // rows_per_block))
    keyed = base.withColumn(
        "blk", F.pmod(F.xxhash64(F.col("id")), F.lit(nblocks)).cast("int")
    )
    grid = spark.createDataFrame(
        [(i, j) for i in range(nblocks) for j in range(i, nblocks)], "bi int, bj int"
    )
    # role 0 = the row acts as block bi of the pair; role 1 = block bj.
    # Diagonal cells (bi == bj) ship each row once (role 0 only) and the
    # kernel self-matmuls, so replication is exactly nblocks per row.
    left = keyed.join(F.broadcast(grid), F.col("blk") == F.col("bi")).select(
        "bi", "bj", "id", "vec", F.lit(0).alias("role")
    )
    right = (
        keyed.join(
            F.broadcast(grid.filter(F.col("bi") < F.col("bj"))),
            F.col("blk") == F.col("bj"),
        ).select("bi", "bj", "id", "vec", F.lit(1).alias("role"))
    )
    tagged = left.unionByName(right)

    def score(key, pdf):
        bi, bj = key
        a_pdf = pdf[pdf["role"] == 0]
        b_pdf = a_pdf if bi == bj else pdf[pdf["role"] == 1]
        if len(a_pdf) == 0 or len(b_pdf) == 0:
            return pd.DataFrame(
                {
                    "a_id": pd.Series([], dtype="int64"),
                    "b_id": pd.Series([], dtype="int64"),
                    "sim": pd.Series([], dtype="float64"),
                }
            )
        A = np.stack([np.asarray(v, dtype=np.float64) for v in a_pdf["vec"]])
        A /= np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-300)
        aids = a_pdf["id"].to_numpy(dtype=np.int64)
        if bi == bj:
            B, bids = A, aids
        else:
            B = np.stack([np.asarray(v, dtype=np.float64) for v in b_pdf["vec"]])
            B /= np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-300)
            bids = b_pdf["id"].to_numpy(dtype=np.int64)
        sims = np.round(A @ B.T, 6)
        keep = sims >= threshold
        if bi == bj:  # same block both sides: emit each unordered pair once
            keep &= aids[:, None] < bids[None, :]
        ai, bix = np.nonzero(keep)
        x, y = aids[ai], bids[bix]
        return pd.DataFrame(
            {"a_id": np.minimum(x, y), "b_id": np.maximum(x, y), "sim": sims[ai, bix]}
        )

    return tagged.groupby("bi", "bj").applyInPandas(
        score, "a_id bigint, b_id bigint, sim double"
    )


def lsh_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    bits: int = 8,
    tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Scale path for cosine near-dup: candidates from `tables` independent
    random-hyperplane bucket joins (union, dedup), then exact cosine verify.

    No broadcast of the corpus — the bucket equi-joins shuffle on bucket
    keys, so this works when both sides are 100 TB-class. Recall < 1 by
    design (a pair is found iff it collides in at least one table); raise
    `tables`/lower `bits` to trade cost for recall. `max_bucket_size`
    drops degenerate hot buckets (e.g. a near-zero-vector cluster) before
    the quadratic self-join — same rationale as minhash_lsh_pairs.
    """
    base = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    cands = None
    for t in range(tables):
        planes = [_hyperplane(1000 * (t + 1) + i, dim) for i in range(bits)]
        keyed = base.select("id", "vec", lsh_bucket(F.col("vec"), planes).alias("bucket"))
        if max_bucket_size is not None:
            counts = keyed.groupBy("bucket").count()
            keyed = keyed.join(
                F.broadcast(counts.filter(F.col("count") <= max_bucket_size)), "bucket"
            ).drop("count")
        a = keyed.select(
            F.col("id").alias("a_id"), F.col("vec").alias("avec"), "bucket"
        )
        b = keyed.select(
            F.col("id").alias("b_id"), F.col("vec").alias("bvec"), "bucket"
        )
        pairs = a.join(b, "bucket").filter(F.col("a_id") < F.col("b_id")).drop("bucket")
        cands = pairs if cands is None else cands.unionByName(pairs)
    deduped = cands.dropDuplicates(["a_id", "b_id"])
    return (
        deduped.withColumn("sim", F.round(cosine(F.col("avec"), F.col("bvec")), 6))
        .filter(F.col("sim") >= threshold)
        .select("a_id", "b_id", "sim")
    )


def _kmeans_centroids(
    M: np.ndarray, k: int, iters: int = 5, seed: int = 7
) -> np.ndarray:
    """Deterministic Lloyd k-means on L2-normalized rows (LCG-seeded init,
    driver-side — the quantizer is tiny; training it distributed would be
    groupBy(assign).avg() with the same math)."""
    n = len(M)
    state = seed
    idx = []
    while len(idx) < k:
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**64)
        i = state % n
        if i not in idx:
            idx.append(i)
    C = M[np.asarray(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(M @ C.T, axis=1)
        for j in range(k):
            members = M[assign == j]
            if len(members):
                c = members.sum(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-300)
    return C


def _train_coarse_quantizer(
    embeddings: DataFrame, ncentroids: int, vec_col: str, id_col: str
) -> np.ndarray:
    """Coarse IVF quantizer: deterministic k-means over a BOUNDED sample
    (TakeOrdered of 4096 rows — cheap at scale, fixed driver memory)."""
    train = embeddings.orderBy(id_col).limit(4096).select(vec_col).toPandas()
    M = np.stack([np.asarray(v, dtype=np.float64) for v in train[vec_col]])
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
    return _kmeans_centroids(M, min(ncentroids, len(M)))


def _cell_assigner(C: np.ndarray):
    """n_cells-nearest-centroid assignment UDF factory: one matmul per
    Arrow batch against the broadcast centroid matrix."""
    CT = C.T

    def assign_cells(n_cells: int):
        @pandas_udf("array<int>")
        def cells(v: pd.Series) -> pd.Series:
            if len(v) == 0:
                return pd.Series([], dtype="object")
            Q = np.stack([np.asarray(x, dtype=np.float64) for x in v])
            Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
            sims = Q @ CT
            top = np.argsort(-sims, axis=1)[:, :n_cells]
            return pd.Series([row.astype("int32").tolist() for row in top])

        return cells

    return assign_cells


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    ncentroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: a coarse k-means quantizer partitions the
    corpus into cells; each query exactly reranks only the `nprobe`
    nearest cells. Returns (query_id, vec_id, rank, sim).

    Spark shape: cell assignment is a vectorized pandas UDF (one matmul
    per Arrow batch against the broadcast centroid matrix); the
    candidate-generation is a cell-id equi-join (shuffle on ~ncentroids
    keys — at scale use sqrt(n) centroids so cells stay executor-sized);
    rerank is the same expression-side cosine + window as lsh_topk."""
    C = _train_coarse_quantizer(embeddings, ncentroids, vec_col, id_col)
    assign_cells = _cell_assigner(C)

    emb_cells = embeddings.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cvec"),
        assign_cells(1)(F.col(vec_col))[0].alias("cell"),
    )
    q_cells = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(assign_cells(nprobe)(F.col(vec_col))).alias("cell"),
    )
    scored = (
        q_cells.join(emb_cells, "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("sim", F.round(cosine(F.col("qvec"), F.col("cvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("cand_id").alias("vec_id"), "rank", "sim")
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.4,
    bits: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the corpus, then
    within each cluster drop every vector whose cosine similarity to a
    LOWER-id cluster member reaches `threshold` (the lowest id of each
    near-dup group survives as the representative). Returns the kept rows
    as (id_col, cluster) — callers semi-join the corpus on id to apply it.

    Clustering here is the deterministic random-hyperplane signature
    (2^bits cells) rather than trained k-means: the semantics are
    identical (dedup within a semantic cell), every centroid-free cell id
    is bit-reproducible in the SQL oracle, and at 100 TB the assignment is
    a scan-speed matmul with no training pass. Swap `lsh_bucket` for
    `_cell_assigner(_train_coarse_quantizer(...))` to get k-means cells —
    the downstream pair scan is unchanged.

    Scale: one bucket equi-join keyed on 2^bits cells (use more bits so
    cells stay executor-sized), pair scan is within-cell only —
    sub-quadratic like lsh_neardup_pairs; the survivors anti-join is on
    ids. No broadcast of the corpus, no global sort.
    """
    planes = [_hyperplane(5000 + i, dim) for i in range(bits)]
    keyed = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(F.col(vec_col), planes).alias("cluster"),
    )
    a = keyed.select(F.col("id").alias("a_id"), F.col("vec").alias("avec"), "cluster")
    b = keyed.select(F.col("id").alias("b_id"), F.col("vec").alias("bvec"), "cluster")
    dominated = (
        a.join(b, "cluster")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(F.round(cosine(F.col("avec"), F.col("bvec")), 6) >= threshold)
        .select(F.col("b_id").alias("id"))
        .distinct()
    )
    return keyed.join(dominated, "id", "left_anti").select(
        F.col("id").alias(id_col), "cluster"
    )


def quantize_int8(vec: Column) -> tuple[Column, Column]:
    """Symmetric int8 quantization of a float vector: scale = 127/max|v|,
    q_i = floor(v_i * scale + 0.5) (explicit half-up — identical in every
    engine, unlike round()'s dialect-dependent tie behavior). Returns
    (quantized array<int>, scale as double). Zero vectors quantize to all
    zeros with scale 0. Pure expression — at 100 TB this runs at scan
    speed with no shuffle; it is the storage-side half of a quantized ANN
    index (the query side rescales by 1/scale)."""
    v = F.transform(vec, lambda x: x.cast("double"))
    m = F.array_max(F.transform(v, F.abs))
    scale = F.when(m > 0, F.lit(127.0) / m).otherwise(F.lit(0.0))
    q = F.transform(v, lambda x: F.floor(x * scale + F.lit(0.5)).cast("int"))
    return q, scale


# ---------------------------------------------------------------------------
# Product quantization (PQ): fixed LCG codebooks, ADC distance scan
# ---------------------------------------------------------------------------

_PQ_SEED_BASE = 7000


def _pq_codebook(m_sub: int, ncodes: int, d_sub: int) -> np.ndarray:
    """(m_sub, ncodes, d_sub) codebook from the repo's 64-bit LCG, scaled to
    [-0.5, 0.5] (the synthetic embeddings' value range). Fixed codebooks
    trade recall vs trained k-means for full determinism: every centroid
    value is reproducible in ANY engine (the DuckDB oracle rebuilds the
    codebook bit-for-bit via a HUGEINT recursive CTE), so PQ encode, ADC
    distances, and top-k are all value-checkable. Swapping in a trained
    codebook (e.g. _kmeans_centroids per subspace) changes only this
    function."""
    cb = np.empty((m_sub, ncodes, d_sub), dtype=np.float64)
    for m in range(m_sub):
        for j in range(ncodes):
            seed = _PQ_SEED_BASE + m * ncodes + j
            state = (seed * 6364136223846793005 + 1442695040888963407) % (2**64)
            for d in range(d_sub):
                state = (state * 6364136223846793005 + 1442695040888963407) % (2**64)
                cb[m, j, d] = (((state >> 11) / 2**53) * 2.0 - 1.0) * 0.5
    return cb


def pq_codes(
    embeddings: DataFrame,
    m_sub: int = 8,
    ncodes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """(id, codes array<int>): PQ encoding — split each vector into m_sub
    subvectors and store, per subspace, the index of the nearest codebook
    centroid (L2, ties to the lowest index). 64 floats -> m_sub bytes:
    the compression that makes billion-scale ANN fit in memory.

    Scale: scan-speed pandas UDF (one batched numpy distance computation
    per Arrow chunk, codebook is a closure constant), zero shuffle."""
    d_sub = dim // m_sub
    assert d_sub * m_sub == dim
    C = _pq_codebook(m_sub, ncodes, d_sub)  # (m, K, d)
    return embeddings.select(
        F.col(id_col), _pq_encoder(C, m_sub, d_sub, ncodes)(F.col(vec_col)).alias("codes")
    )


def _pq_encoder(C: np.ndarray, m_sub: int, d_sub: int, ncodes: int):
    """Nearest-centroid-per-subspace encode UDF (shared by pq_codes and
    ivfpq_topk)."""

    @pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        X = np.stack([np.asarray(x, dtype=np.float64) for x in v])  # (B, dim)
        Xs = X.reshape(len(X), m_sub, d_sub)
        # accumulate the squared distance SEQUENTIALLY over d: bit-identical
        # to the oracle's left-to-right list sum (numpy's pairwise .sum()
        # associates differently and can flip argmin near-ties)
        d2 = np.zeros((len(X), m_sub, ncodes))
        for d in range(d_sub):
            diff = Xs[:, :, None, d] - C[None, :, :, d]
            d2 += diff * diff
        codes = d2.argmin(axis=-1).astype(np.int32)  # ties -> lowest index
        return pd.Series(list(codes))

    return encode


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    m_sub: int = 8,
    ncodes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ top-k: candidates are scanned via their
    m_sub-byte codes only — the approximate distance is the sum over
    subspaces of ||q_m - codebook[m][code_m]||^2, the standard IVF-PQ
    rerank kernel. Returns (query_id, vec_id, rank, adc), rank by
    (adc asc, id asc), self-matches excluded; adc rounds to 6 decimals.

    Scale shape: the corpus side carries ONLY (id, codes) — m_sub bytes a
    row instead of dim floats — and the query side broadcasts; the scan is
    one vectorized numpy gather+sum per Arrow batch. The final top-k is a
    per-query window (partitioned on query_id, never a global sort)."""
    d_sub = dim // m_sub
    C = _pq_codebook(m_sub, ncodes, d_sub)
    codes = pq_codes(embeddings, m_sub, ncodes, id_col, vec_col, dim)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    cand = (
        F.broadcast(q)
        .crossJoin(codes.withColumnRenamed(id_col, "cand_id"))
        .filter(F.col("query_id") != F.col("cand_id"))
    )

    scored = cand.withColumn(
        "adc", F.round(_adc_udf(C, m_sub, d_sub)(F.col("qvec"), F.col("codes")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("cand_id").alias("vec_id"), "rank", "adc")
    )


def _adc_udf(C: np.ndarray, m_sub: int, d_sub: int):
    """Asymmetric-distance kernel: ||q_m - codebook[m][code_m]||^2 summed
    over subspaces. Accumulates SEQUENTIALLY (d inside m) so it associates
    exactly like the oracle's ordered list sums — the rounded adc compares
    bit-equal across engines."""

    @pandas_udf("double")
    def adc(qv: pd.Series, cs: pd.Series) -> pd.Series:
        if len(qv) == 0:
            return pd.Series([], dtype="float64")
        Q = np.stack([np.asarray(x, dtype=np.float64) for x in qv]).reshape(
            -1, m_sub, d_sub
        )
        codes_m = np.stack([np.asarray(c, dtype=np.int64) for c in cs])  # (B, m)
        cent = C[np.arange(m_sub)[None, :], codes_m]  # (B, m, d)
        total = np.zeros(len(Q))
        for m in range(m_sub):
            s = np.zeros(len(Q))
            for d in range(d_sub):
                diff = Q[:, m, d] - cent[:, m, d]
                s = s + diff * diff
            total = total + s
        return pd.Series(total)

    return adc


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    ncentroids: int = 16,
    nprobe: int = 16,
    m_sub: int = 8,
    ncodes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """IVF-PQ (the standard billion-scale ANN layout): a coarse k-means
    quantizer routes each candidate to ONE cell; queries probe their
    `nprobe` nearest cells and rerank candidates by PQ asymmetric distance
    over the m_sub-byte codes — no raw candidate vector is ever read after
    encode. Returns (query_id, vec_id, rank, adc).

    Value-check design: with nprobe == ncentroids the cell routing prunes
    nothing, so the result must equal plain `pq_topk` exactly — which makes
    the composed machinery (quantizer, cell equi-join, per-cell ADC,
    cross-cell merge) verifiable against the PQ oracle even though the
    trained k-means quantizer itself is not SQL-reproducible.

    Scale: candidate shuffle is one cell equi-join keyed on ~sqrt(n)
    cells; each candidate row carries m_sub bytes of codes; the top-k is a
    per-query-partitioned window."""
    d_sub = dim // m_sub
    Ccoarse = _train_coarse_quantizer(embeddings, ncentroids, vec_col, id_col)
    assign_cells = _cell_assigner(Ccoarse)
    Cpq = _pq_codebook(m_sub, ncodes, d_sub)

    # ONE corpus scan produces both the cell id and the codes — no
    # self-join of two corpus derivations
    cand = embeddings.select(
        F.col(id_col).alias("cand_id"),
        assign_cells(1)(F.col(vec_col))[0].alias("cell"),
        _pq_encoder(Cpq, m_sub, d_sub, ncodes)(F.col(vec_col)).alias("codes"),
    )
    q_cells = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(assign_cells(min(nprobe, ncentroids))(F.col(vec_col))).alias("cell"),
    )
    scored = (
        q_cells.join(cand, "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn(
            "adc",
            F.round(_adc_udf(Cpq, m_sub, d_sub)(F.col("qvec"), F.col("codes")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("cand_id").alias("vec_id"), "rank", "adc")
    )


def _blocked_topk_candidates(
    embeddings: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    rows_per_block: int,
) -> DataFrame:
    """Directed per-src top-k CANDIDATES from the block-pair matmul grid:
    (src, dst, sim) with each (src, dst) emitted at most once, and for
    every src its true global top-k guaranteed present.

    Same grid/replication shape as cosine_neardup_pairs, but the per-src
    top-k is pushed INTO the score kernel (classic distributed top-k:
    partial top-k per block pair, global top-k downstream). This bounds a
    task's OUTPUT at (|A|+|B|) * k rows instead of |A|*|B| — the round-10
    sf1 soak caught the unbounded variant (threshold=-1 keep-all-pairs)
    allocating a ~1 GB Arrow batch per diagonal block at just 10x data:
    output volume, not block input, was the scale cliff. Correctness: a
    src's global top-k items each live in exactly one grid cell, and an
    item displaced by >= k better items within its own cell (same
    (sim desc, dst asc) order as the global window) cannot be in the
    global top-k.

    Kernel tie-break parity: ids are sorted ascending per side and the
    per-row argsort on -sim is STABLE, so equal sims rank by dst asc —
    bit-identical to the downstream window (and the DuckDB oracle)."""
    spark = embeddings.sparkSession
    base = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    n = base.count()
    nblocks = max(1, -(-n // rows_per_block))
    keyed = base.withColumn(
        "blk", F.pmod(F.xxhash64(F.col("id")), F.lit(nblocks)).cast("int")
    )
    grid = spark.createDataFrame(
        [(i, j) for i in range(nblocks) for j in range(i, nblocks)], "bi int, bj int"
    )
    left = keyed.join(F.broadcast(grid), F.col("blk") == F.col("bi")).select(
        "bi", "bj", "id", "vec", F.lit(0).alias("role")
    )
    right = keyed.join(
        F.broadcast(grid.filter(F.col("bi") < F.col("bj"))),
        F.col("blk") == F.col("bj"),
    ).select("bi", "bj", "id", "vec", F.lit(1).alias("role"))
    tagged = left.unionByName(right)

    def _norm_sorted(pdf):
        order = np.argsort(pdf["id"].to_numpy(dtype=np.int64), kind="stable")
        ids = pdf["id"].to_numpy(dtype=np.int64)[order]
        M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])[order]
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
        return ids, M

    def _row_topk(sims, src_ids, dst_ids, out):
        kk = min(k, sims.shape[1])
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(np.arange(sims.shape[0]), kk)
        cols = idx.ravel()
        s = sims[rows, cols]
        keep = np.isfinite(s)
        out.append((src_ids[rows[keep]], dst_ids[cols[keep]], s[keep]))

    def score(key, pdf):
        bi, bj = key
        a_pdf = pdf[pdf["role"] == 0]
        b_pdf = a_pdf if bi == bj else pdf[pdf["role"] == 1]
        empty = pd.DataFrame(
            {
                "src": pd.Series([], dtype="int64"),
                "dst": pd.Series([], dtype="int64"),
                "sim": pd.Series([], dtype="float64"),
            }
        )
        if len(a_pdf) == 0 or len(b_pdf) == 0:
            return empty
        aids, A = _norm_sorted(a_pdf)
        if bi == bj:
            bids, B = aids, A
        else:
            bids, B = _norm_sorted(b_pdf)
        sims = np.round(A @ B.T, 6)
        if bi == bj:
            np.fill_diagonal(sims, -np.inf)  # self-pairs excluded
        out: list = []
        _row_topk(sims, aids, bids, out)
        if bi != bj:  # reverse direction: srcs in B, dsts in A
            _row_topk(sims.T.copy(), bids, aids, out)
        src = np.concatenate([o[0] for o in out])
        dst = np.concatenate([o[1] for o in out])
        sim = np.concatenate([o[2] for o in out])
        return pd.DataFrame({"src": src, "dst": dst, "sim": sim})

    return tagged.groupby("bi", "bj").applyInPandas(
        score, "src bigint, dst bigint, sim double"
    )


def knn_graph(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rows_per_block: int = 8192,
) -> DataFrame:
    """Exact symmetric k-NN graph: for EVERY point, its k nearest
    neighbours by cosine — (src, dst, sim, rk). The building block for
    kNN-graph clustering / label propagation / graph-based dedup.

    Built on the distributed block-pair matmul grid with the per-src
    top-k pushed into the score kernel (_blocked_topk_candidates): each
    unordered pair scored exactly once, task INPUT bounded by two blocks
    and task OUTPUT bounded by (|A|+|B|)*k candidate rows, then one
    per-src top-k window over <= k*(nblocks+1) candidates per src (keyed
    exchange, no global sort). Exact all-pairs scoring is the O(n^2)
    BASELINE — at true corpus scale the sub-quadratic path is lsh_topk /
    ivf_topk; this operator is their recall oracle.
    """
    cand = _blocked_topk_candidates(
        embeddings, k=k, id_col=id_col, vec_col=vec_col, rows_per_block=rows_per_block
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("src", "dst", "sim", "rk")
    )


def hard_negatives(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query, the
    top-k most-similar corpus vectors with a DIFFERENT label — the
    highest-loss negatives a triplet/InfoNCE sampler wants. Returns
    (query_id, neg_id, rank, sim, neg_label).

    Scale: identical shape to brute_force_topk (broadcast query side, one
    corpus scan, per-query heap) with the label inequality folded into
    the scan filter — the pruning happens before the sort, so a label
    covering 90% of the corpus only shrinks the candidate stream. For
    corpus-scale query sets swap the broadcast for the block-pair matmul
    backbone (knn_graph)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col(label_col).alias("qlabel"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neg_id"),
        F.col(vec_col).alias("cvec"),
        F.col(label_col).alias("neg_label"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("qlabel") != F.col("neg_label"))
        .withColumn("sim", F.round(cosine(F.col("qvec"), F.col("cvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neg_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neg_id", "rank", "sim", "neg_label")
    )


def centroid_drift(
    emb_a: DataFrame,
    emb_b: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 1 << 20,
) -> DataFrame:
    """Distribution-drift monitor: per label, the L2 distance between the
    mean embedding of slice A and slice B — the production check that a
    new data batch still looks like the reference distribution before it
    enters training.

    Exactness (the quantize-then-integer-statistics design of
    emb_kmeans): components quantize ONCE to BIGINT at `scale`; per-dim
    sums are exact; the cross-multiplied difference numerator
    ``da*nb - db*na`` stays in BIGINT and its squares accumulate in
    DECIMAL(38,0) (HUGEINT in the oracle) — so the only float math is
    one final sqrt/divide expression, bit-identical everywhere.

    Scale: one scan per slice into a (label, dim)-keyed partial sum —
    dim-sized rows per task, never vectors — then a dim-sized join and a
    label-sized aggregate. Adding slices or labels never adds passes.
    """
    q = lambda c: F.round(c.cast("double") * scale).cast("bigint")  # noqa: E731

    def dimsums(df, tag):
        e = df.select(
            F.col(label_col).alias("label"), F.posexplode(F.col(vec_col)).alias("pos", "x")
        )
        return e.groupBy("label", "pos").agg(
            F.sum(q(F.col("x"))).alias(f"s_{tag}"), F.count("*").alias(f"n_{tag}")
        )

    a = dimsums(emb_a, "a")
    b = dimsums(emb_b, "b")
    j = a.join(b, ["label", "pos"])
    # widen BEFORE squaring: diff fits BIGINT but diff^2 does not (ANSI
    # mode would throw on the overflow, not wrap)
    diff = (F.col("s_a") * F.col("n_b") - F.col("s_b") * F.col("n_a")).cast(
        "decimal(38,0)"
    )
    per_label = j.groupBy("label").agg(
        F.max("n_a").alias("na"),
        F.max("n_b").alias("nb"),
        F.sum(diff * diff).alias("ss"),
    )
    shift = (
        F.sqrt(F.col("ss").cast("double"))
        / (F.col("na").cast("double") * F.col("nb").cast("double"))
        / F.lit(float(scale))
    )
    return per_label.select(
        "label", "na", "nb", F.round(shift, 6).alias("l2_shift")
    )


def ood_scores(
    embeddings: DataFrame,
    topn: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 1 << 20,
) -> DataFrame:
    """Label-conditional out-of-distribution scores: each vector's L2
    distance to its OWN label's centroid, largest first — the mislabeled
    / outlier shortlist a data-cleaning pass reviews (the SemDeDup-era
    "prototypicality" signal, inverted).

    Exactness (the centroid_drift design): quantize once to BIGINT, the
    per-dim deviation numerator ``q_i*n - s_i`` stays integer, squares
    accumulate in DECIMAL(38,0), and the distance is ONE final
    sqrt/divide — bit-identical to the HUGEINT oracle.

    Scale: one scan to (label, pos) sums, one broadcast of that
    dim-sized table back onto the exploded corpus, one vec-keyed
    aggregation, TakeOrdered top-n. No vector ever crosses the shuffle.
    """
    q = F.round(F.col("x").cast("double") * scale).cast("bigint")
    e = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    ).select("vid", "label", "pos", q.alias("q"))
    sums = e.groupBy("label", "pos").agg(
        F.sum("q").alias("s"), F.count("*").alias("n")
    )
    diff = (F.col("q") * F.col("n") - F.col("s")).cast("decimal(38,0)")
    per_vec = (
        e.join(F.broadcast(sums), ["label", "pos"])
        .groupBy("vid", "label")
        .agg(F.sum(diff * diff).alias("ss"), F.max("n").alias("n"))
    )
    dist = (
        F.sqrt(F.col("ss").cast("double"))
        / F.col("n").cast("double")
        / F.lit(float(scale))
    )
    return (
        per_vec.select(
            F.col("vid").alias(id_col), "label", F.round(dist, 6).alias("ood_dist")
        )
        .orderBy(F.desc("ood_dist"), F.asc(id_col))
        .limit(topn)
    )


def mmr_select(
    embeddings: DataFrame,
    queries: DataFrame,
    n_candidates: int = 10,
    n_select: int = 3,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): from each query's top-`n_candidates` cosine candidates,
    greedily pick `n_select` items maximizing
    ``lam*sim(q,c) - (1-lam)*max_{s in picked} sim(c,s)`` — relevance
    minus redundancy, the diversity-aware retrieval head RAG rerankers
    use. Returns (query_id, pick_order, vec_id, mmr_score).

    The greedy recursion is inherently sequential in `n_select`, so the
    plan chains `n_select` DataFrame stages (each a candidate-sized join
    + rank window) — NO driver collect, no per-row Python; candidate
    sets are bounded by construction so every stage is tiny regardless
    of corpus size. All similarities round to 6dp before comparison
    (deterministic, oracle-parity) with vec_id tie-breaks.
    """
    cand = brute_force_topk(embeddings, queries, k=n_candidates, id_col=id_col, vec_col=vec_col)
    vecs = embeddings.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
    cand = (
        cand.join(vecs, cand["vec_id"] == vecs["_vid"])
        .select("query_id", "vec_id", "sim", F.col("_v").alias("cvec"))
        .localCheckpoint(eager=False)
    )
    picked = None  # (query_id, pick_order, vec_id, mmr_score, pvec)
    out = []
    for step in range(1, n_select + 1):
        if picked is None:
            w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
            sel = (
                cand.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select(
                    "query_id",
                    F.lit(1).alias("pick_order"),
                    "vec_id",
                    F.col("sim").alias("mmr_score"),
                    F.col("cvec").alias("pvec"),
                )
            )
        else:
            pv = picked.select(
                F.col("query_id").alias("_q"), F.col("vec_id").alias("_pid"), "pvec"
            )
            rem = cand.join(
                picked.select(F.col("query_id").alias("_q2"), F.col("vec_id").alias("_pid2")),
                (cand["query_id"] == F.col("_q2")) & (cand["vec_id"] == F.col("_pid2")),
                "left_anti",
            )
            pen = (
                rem.join(pv, rem["query_id"] == pv["_q"])
                .withColumn("psim", F.round(cosine(F.col("cvec"), F.col("pvec")), 6))
                .groupBy("query_id", "vec_id", "sim")
                .agg(F.max("psim").alias("maxp"), F.first("cvec").alias("cvec"))
            )
            score = F.round(
                F.lit(lam) * F.col("sim") - F.lit(1.0 - lam) * F.col("maxp"), 6
            )
            w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
            sel = (
                pen.withColumn("score", score)
                .withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select(
                    "query_id",
                    F.lit(step).alias("pick_order"),
                    "vec_id",
                    F.col("score").alias("mmr_score"),
                    F.col("cvec").alias("pvec"),
                )
            )
        sel = sel.localCheckpoint(eager=False)
        out.append(sel.select("query_id", "pick_order", "vec_id", "mmr_score"))
        picked = sel if picked is None else picked.unionByName(sel)
    result = out[0]
    for df in out[1:]:
        result = result.unionByName(df)
    return result
