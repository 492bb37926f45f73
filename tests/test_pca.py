"""Integer power-iteration PCA: recovers a planted dominant direction,
gram matrix matches numpy exactly, and the result is partition-invariant
(the bit-identical-across-cluster-sizes claim)."""

from __future__ import annotations

import numpy as np

from imposm3_spark.datapipe.pca import QSCALE, gram_matrix, top_component


def _df(spark, X, partitions=None):
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<float>",
    )
    return df.repartition(partitions) if partitions else df


def test_gram_matches_numpy(spark):
    rng = np.random.RandomState(2)
    X = rng.randn(50, 4).astype("float32")
    got = {(r.i, r.j): r.g for r in gram_matrix(_df(spark, X)).collect()}
    Q = np.round(X.astype("float64") * QSCALE).astype("int64")
    G = Q.T @ Q
    assert got == {
        (i + 1, j + 1): int(G[i, j]) for i in range(4) for j in range(4)
    }


def test_recovers_planted_direction(spark):
    rng = np.random.RandomState(7)
    direction = np.array([0.8, 0.6, 0.0, 0.0])
    X = (
        rng.randn(200, 1) * direction[None, :] * 0.9
        + rng.randn(200, 4) * 0.05
    ).astype("float32")
    out = {r.i: r.loading for r in top_component(_df(spark, X), iterations=5).collect()}
    v = np.array([out[i + 1] for i in range(4)])
    v = v / np.linalg.norm(v)
    cos = abs(float(v @ direction / np.linalg.norm(direction)))
    assert cos > 0.99


def test_partition_invariant(spark):
    rng = np.random.RandomState(3)
    X = rng.randn(120, 6).astype("float32")
    a = sorted(top_component(_df(spark, X), iterations=3).collect())
    b = sorted(top_component(_df(spark, X, partitions=11), iterations=3).collect())
    assert a == b
