"""Diversity coreset selection: greedy k-center (farthest-point
traversal) over an embedding column.

Gonzalez's greedy 2-approximation for the k-center problem (Gonzalez,
"Clustering to minimize the maximum intercluster distance", TCS'85) is
THE standard diversity-sampling / coreset step of data-curation
pipelines (active learning, dataset distillation, prompt selection):
seed with one point, then k-1 times pick the point farthest from the
selected set. The selection radius sequence is also the k-center cost
curve — how much coverage each extra exemplar buys.

Why it hash-matches a SQL oracle exactly
----------------------------------------
Everything is INTEGER arithmetic: inputs quantize to q_i = round(e_i *
SCALE) BIGINTs (the kmeans discipline), centers are actual data points,
and the squared L2 distance Σ(q_i − c_i)² stays inside int64 while
dim · (2·max|e|·SCALE)² < 2^63 — i.e. max|e| <= ~190 at SCALE 1e6 and
dim 64 (the synthetic embeddings are unit-scale, ~190x inside the
envelope; for larger coordinate ranges lower SCALE). Integer sums are
order-free — numpy, Catalyst and DuckDB all agree without any float
discipline. Ties (equal farthest distance) break to the lowest vec_id;
the seed is the lowest vec_id.

Scale design (100 TB)
---------------------
* The quantized projection is checkpointed once; each of the k
  iterations is one Arrow-batched scan computing the distance to the
  SINGLE newest center and folding it into the running min — O(k·n·dim)
  total work, the same as the sequential algorithm, fully parallel per
  iteration.
* The argmax per iteration is a TakeOrdered(1) — bounded driver state
  (k rows total), never a data-sized collect.
* The running min-distance column is carried in the checkpointed frame
  (one lazy localCheckpoint per iteration keeps lineage O(1)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from imposm3_spark.datapipe.kmeans import SCALE, _quantize


def _dist_to_center_udf(center: list[int]):
    import pandas as pd

    @F.pandas_udf("long")
    def du(qs):
        import numpy as np

        if len(qs) == 0:
            return pd.Series([], dtype="int64")
        Q = np.stack(qs.to_numpy()).astype(np.int64, copy=False)
        c = np.asarray(center, dtype=np.int64)
        d = Q - c
        # integer sums are order-free: no fold-order discipline needed
        return pd.Series((d * d).sum(axis=1))

    return du


def kcenter_greedy(
    emb: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Greedy k-center selection: returns the k exemplars as
    (sel_rank, vec_id, radius_sq) where radius_sq is the selected
    point's exact integer squared distance (× SCALE²) to the previously
    selected set — the k-center cost curve (0 for the seed)."""
    qp = _quantize(emb, vec_col, id_col).localCheckpoint(eager=True)
    seed = qp.orderBy("vec_id").limit(1).collect()
    if not seed:
        return emb.sparkSession.createDataFrame(
            [], "sel_rank int, vec_id long, radius_sq long"
        )
    picked = [(0, int(seed[0]["vec_id"]), 0)]
    center = list(seed[0]["q"])
    cur = qp.withColumn("mind", _dist_to_center_udf(center)(F.col("q")))
    for rank in range(1, k):
        cur = cur.localCheckpoint(eager=False)
        far = (
            cur.orderBy(F.desc("mind"), F.asc("vec_id"))
            .limit(1)
            .select("vec_id", "q", "mind")
            .collect()
        )
        if not far or int(far[0]["mind"]) == 0:
            break  # fewer than k distinct points
        row = far[0]
        picked.append((rank, int(row["vec_id"]), int(row["mind"])))
        cur = cur.withColumn(
            "mind",
            F.least(
                F.col("mind"), _dist_to_center_udf(list(row["q"]))(F.col("q"))
            ),
        )
    return emb.sparkSession.createDataFrame(
        picked, "sel_rank int, vec_id long, radius_sq long"
    )


def kcenter_oracle(k: int = 8, dim: int = 64) -> str:
    """DuckDB oracle: the greedy traversal unrolled — one (selection,
    min-fold) CTE pair per rank, HUGEINT-safe integer distances."""
    # cast BEFORE the multiply: a BIGINT product of two large diffs would
    # overflow before the HUGEINT cast could save it
    dist = (
        "list_reduce(list_transform(range(1, {hi}), i -> "
        "CAST(p.q[i] - c.q[i] AS HUGEINT) * (p.q[i] - c.q[i])), "
        "(a, b) -> a + b)"
    ).format(hi=dim + 1)
    parts = [
        f"""
WITH qp AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
           e -> CAST(round(CAST(e AS DOUBLE) * {float(SCALE)}) AS BIGINT)) AS q
  FROM embeddings
), s0 AS MATERIALIZED (
  SELECT vec_id, q FROM qp ORDER BY vec_id LIMIT 1
), m0 AS MATERIALIZED (
  SELECT p.vec_id, p.q, {dist} AS mind
  FROM qp p CROSS JOIN s0 c
)"""
    ]
    prev = "m0"
    sel = ["SELECT 0 AS sel_rank, vec_id, CAST(0 AS BIGINT) AS radius_sq FROM s0"]
    for r in range(1, k):
        parts.append(
            f""", s{r} AS MATERIALIZED (
  SELECT vec_id, q, mind FROM {prev}
  ORDER BY mind DESC, vec_id LIMIT 1
), m{r} AS MATERIALIZED (
  SELECT p.vec_id, p.q, least(p.mind, {dist}) AS mind
  FROM {prev} p CROSS JOIN s{r} c
)"""
        )
        sel.append(
            f"SELECT {r} AS sel_rank, vec_id, CAST(mind AS BIGINT) AS radius_sq"
            f" FROM s{r} WHERE mind > 0"
        )
        prev = f"m{r}"
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(sel)
