"""Lloyd k-means: exact match against a pure-python reference that uses
the same integer-quantized arithmetic, plus clustering-quality sanity on
well-separated synthetic blobs."""

from __future__ import annotations

from imposm3_spark.datapipe.kmeans import SCALE, lloyd_kmeans


def _ref_kmeans(points, k, iterations):
    """Pure-python mirror: quantize, seed with k lowest ids, iterate."""
    q = {i: [round(v * SCALE) for v in vec] for i, vec in points}
    ids = sorted(q)
    cents = [(list(q[i]), 1) for i in ids[:k]]

    def assign():
        out = {}
        for i in ids:
            best = None
            for j, (s, n) in enumerate(cents):
                d = sum(float(n * x - si) ** 2 for x, si in zip(q[i], s)) / (
                    float(n) * float(n)
                )
                if best is None or (d, j) < best:
                    best = (d, j)
                    out[i] = j
        return out

    for _ in range(iterations):
        a = assign()
        new = {}
        for i, j in a.items():
            s, n = new.get(j, ([0] * len(q[i]), 0))
            new[j] = ([a_ + b_ for a_, b_ in zip(s, q[i])], n + 1)
        cents = [new.get(j, cents[j]) for j in range(k)]
    return assign()


def test_matches_pure_python_reference(spark):
    import random

    rng = random.Random(7)
    pts = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(60)]
    df = spark.createDataFrame(
        [(i, [float(v) for v in vec]) for i, vec in pts],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r.cluster for r in lloyd_kmeans(df, k=4, iterations=3).collect()}
    # reference quantizes from the FLOAT-rounded values the DF stored
    stored = [(r.vec_id, r.embedding) for r in df.collect()]
    assert got == _ref_kmeans(stored, 4, 3)


def test_separated_blobs_recovered(spark):
    """Three tight, well-separated blobs must land in three distinct
    clusters with no blob split across clusters."""
    import random

    rng = random.Random(3)
    pts = []
    for b, center in enumerate([(-5.0, -5.0), (0.0, 5.0), (5.0, -5.0)]):
        for i in range(20):
            pts.append(
                (
                    b * 100 + i,
                    [center[0] + rng.uniform(-0.1, 0.1), center[1] + rng.uniform(-0.1, 0.1)],
                )
            )
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    rows = lloyd_kmeans(df, k=3, iterations=4).collect()
    blob_clusters = {}
    for r in rows:
        blob_clusters.setdefault(r.vec_id // 100, set()).add(r.cluster)
    assert all(len(c) == 1 for c in blob_clusters.values())
    assert len({next(iter(c)) for c in blob_clusters.values()}) == 3


def test_empty_cluster_keeps_seed(spark):
    """k larger than the number of distinct locations: surplus clusters
    stay on their seed centroid and the run still terminates."""
    pts = [(i, [float(i % 2), 0.0]) for i in range(10)]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    rows = lloyd_kmeans(df, k=4, iterations=3).collect()
    assert len(rows) == 10
    assert {r.cluster for r in rows} <= {0, 1, 2, 3}


def test_inertia_matches_reference(spark):
    import random

    from imposm3_spark.datapipe.kmeans import SCALE, kmeans_inertia

    rng = random.Random(9)
    pts = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(40)]
    df = spark.createDataFrame(
        [(i, [float(v) for v in vec]) for i, vec in pts],
        "vec_id long, embedding array<float>",
    )
    stored = [(r.vec_id, r.embedding) for r in df.collect()]
    # mirror: run the pure-python loop, then accumulate exact D per cluster
    q = {i: [round(v * SCALE) for v in vec] for i, vec in stored}
    ids = sorted(q)
    cents = [(list(q[i]), 1) for i in ids[:3]]

    def assign():
        out = {}
        for i in ids:
            best = None
            for j, (s, n) in enumerate(cents):
                d = sum(float(n * x - si) ** 2 for x, si in zip(q[i], s)) / (
                    float(n) * float(n)
                )
                if best is None or (d, j) < best:
                    best = (d, j)
                    out[i] = j
        return out

    for _ in range(2):
        a = assign()
        new = {}
        for i, j in a.items():
            s, n = new.get(j, ([0] * 4, 0))
            new[j] = ([x + y for x, y in zip(s, q[i])], n + 1)
        cents = [new.get(j, cents[j]) for j in range(3)]
    a = assign()
    expect = {}
    for i, j in a.items():
        s, n = cents[j]
        D = sum((n * x - si) ** 2 for x, si in zip(q[i], s))  # exact int
        cnt, acc = expect.get(j, (0, 0))
        expect[j] = (cnt + 1, acc + D)
    expect = {
        j: (cnt, round(D / (cents[j][1] ** 2 * SCALE * SCALE), 6))
        for j, (cnt, D) in expect.items()
    }
    got = {
        r.cluster: (r.n_members, r.inertia)
        for r in kmeans_inertia(df, k=3, iterations=2).collect()
    }
    assert got == expect


def test_silhouette_worst_flags_boundary_point(spark):
    """Two tight clusters + one point midway: the midway point has the
    lowest simplified silhouette."""
    from imposm3_spark.datapipe.kmeans import silhouette_worst

    rows = []
    for i in range(6):
        rows.append((i, [0.0 + 0.001 * i, 0.0], 0))
    for i in range(6):
        rows.append((10 + i, [10.0 + 0.001 * i, 0.0], 0))
    rows.append((99, [5.0, 0.0], 0))  # midway
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = silhouette_worst(df, k=2, iterations=3, topn=3).collect()
    assert got[0].vec_id == 99
    assert got[0].s < 0.5
    # everyone else clusters cleanly
    assert all(r.s > 0.9 for r in got[1:])


def test_silhouette_deterministic(spark):
    from imposm3_spark.datapipe.kmeans import silhouette_worst

    rows = [(i, [float((i * 37) % 11), float((i * 13) % 7)], 0) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    a = [(r.vec_id, r.s) for r in silhouette_worst(df, k=4, iterations=2).collect()]
    b = [(r.vec_id, r.s) for r in silhouette_worst(df, k=4, iterations=2).collect()]
    assert a == b


def test_arrow_kernel_matches_catalyst_fold(spark):
    """The Arrow-batched distance kernel must be BIT-identical to the
    interpreted Catalyst fold it replaced — same int64 t, same double
    cast, same left-to-right accumulation — on awkward values (large
    coords, near-ties, non-trivial centroid counts n > 1)."""
    from imposm3_spark.datapipe.kmeans import (
        _assign_fold,
        _np_dist_matrix,
        _quantize,
        _run_lloyd,
    )

    rows = [
        (i, [((i * 7919 + d * 104729) % 2003 - 1001) / 1001.0 for d in range(16)], 0)
        for i in range(120)
    ]
    # near-duplicates to force close distance races
    rows += [(1000 + i, list(rows[i][1]), 0) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    run = _run_lloyd(df, k=5, iterations=3, vec_col="embedding", id_col="vec_id")
    qp, centroids, dim, assign = run
    fast = {r.vec_id: r.cluster for r in assign(qp).collect()}
    spec = {r.vec_id: r.cluster for r in _assign_fold(qp, centroids, dim).collect()}
    assert fast == spec

    # distance VALUES bit-equal, not just the argmin: compare the numpy
    # matrix against the Catalyst fold per (point, centroid)
    import numpy as np
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe.kmeans import _dist

    pts = qp.orderBy("vec_id").collect()
    Q = np.stack([np.asarray(r.q, dtype=np.int64) for r in pts])
    D = _np_dist_matrix(Q, centroids)
    fold = qp.select(
        "vec_id",
        *[
            _dist(F.col("q"), s, n, dim).alias(f"d{j}")
            for j, (s, n) in enumerate(centroids)
        ],
    ).orderBy("vec_id").collect()
    for ri, r in enumerate(fold):
        for j in range(len(centroids)):
            assert D[ri, j] == r[f"d{j}"], (r.vec_id, j)


def test_adjusted_rand_index_hand_values(spark):
    from imposm3_spark.datapipe.kmeans import adjusted_rand_index

    # identical partitions -> ARI 1
    a = spark.createDataFrame([(i, i % 3) for i in range(12)], "vec_id long, cluster int")
    r = adjusted_rand_index(a, a).collect()[0]
    assert r.ari == 1.0 and r.n == 12
    # relabeled identical partition -> still 1 (label-invariance)
    b = spark.createDataFrame([(i, (i % 3 + 1) % 3) for i in range(12)], "vec_id long, cluster int")
    assert adjusted_rand_index(a, b).collect()[0].ari == 1.0
    # known textbook case: [0,0,1,1] vs [0,1,0,1] -> idx=0, aa=bb=2, tt=6
    # ARI = (0 - 4/6) / (2 - 4/6) = -0.5
    x = spark.createDataFrame([(0, 0), (1, 0), (2, 1), (3, 1)], "vec_id long, cluster int")
    y = spark.createDataFrame([(0, 0), (1, 1), (2, 0), (3, 1)], "vec_id long, cluster int")
    assert adjusted_rand_index(x, y).collect()[0].ari == -0.5


def test_seed_skip_changes_seed_only(spark):
    """seed_skip shifts the deterministic seed window; the quantized data
    and the iteration machinery are shared, so both runs cluster the
    same separated blobs identically (ARI 1 on clean data)."""
    from imposm3_spark.datapipe.kmeans import adjusted_rand_index, lloyd_kmeans

    pts = []
    for c in range(3):
        for i in range(12):
            pts.append((c * 100 + i, [c * 50.0 + 0.01 * i, 0.0]))
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    a1 = lloyd_kmeans(df, k=3, iterations=4)
    a2 = lloyd_kmeans(df, k=3, iterations=4, seed_skip=3)
    r = adjusted_rand_index(a1, a2).collect()[0]
    assert r.ari == 1.0
