"""Round-4 batch 18 operators: k-center coreset, dispersion index,
burstiness, weighted transition entropy."""

from __future__ import annotations

import math
from datetime import datetime, timedelta


def test_kcenter_picks_farthest_points(spark):
    from imposm3_spark.datapipe.coreset import kcenter_greedy

    # three tight clusters far apart + the seed: greedy must visit each
    # cluster before refining within one
    pts = (
        [(0, [0.0, 0.0])]
        + [(10 + i, [100.0 + 0.001 * i, 0.0]) for i in range(3)]
        + [(20 + i, [0.0, 60.0 + 0.001 * i]) for i in range(3)]
    )
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    got = kcenter_greedy(df, k=3).collect()
    assert [r.sel_rank for r in got] == [0, 1, 2]
    assert got[0].vec_id == 0 and got[0].radius_sq == 0
    assert got[1].vec_id == 12  # farthest point of the farthest cluster
    assert got[2].vec_id == 22  # then the remaining cluster's farthest
    # radii are exact integers in quantized units and non-increasing
    assert got[1].radius_sq >= got[2].radius_sq > 0


def test_kcenter_python_reference_parity(spark):
    from imposm3_spark.datapipe.coreset import kcenter_greedy
    from imposm3_spark.datapipe.kmeans import SCALE

    pts = [
        (i, [((i * 37 + d * 17) % 19 - 9) / 9.0 for d in range(4)])
        for i in range(30)
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    got = [(r.sel_rank, r.vec_id, r.radius_sq) for r in kcenter_greedy(df, k=5).collect()]

    q = {i: [round(v * SCALE) for v in vec] for i, vec in pts}

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    sel = [min(q)]
    mind = {i: d2(q[i], q[sel[0]]) for i in q}
    expect = [(0, sel[0], 0)]
    for r in range(1, 5):
        far = max(mind.items(), key=lambda kv: (kv[1], -kv[0]))
        best = min(i for i, v in mind.items() if v == far[1])
        expect.append((r, best, mind[best]))
        for i in q:
            mind[i] = min(mind[i], d2(q[i], q[best]))
    assert got == expect


def test_dispersion_regular_vs_bursty(spark):
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe.stats import dispersion_index

    t0 = datetime(2001, 1, 1)
    rows = []
    # regular: exactly 3/day for 10 days -> variance 0 -> dispersion 0
    for d in range(10):
        rows += [("reg", t0 + timedelta(days=d, hours=h)) for h in range(3)]
    # bursty: 20 on one day, 1 on each of 9 others
    rows += [("burst", t0 + timedelta(hours=h)) for h in range(20)]
    rows += [("burst", t0 + timedelta(days=d)) for d in range(1, 10)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {
        r.event_type: r.dispersion
        for r in dispersion_index(df, "event_type", F.col("ts").cast("date")).collect()
    }
    assert got["reg"] == 0.0
    # hand value: counts [20,1*9], n=10, sc=29, scc=409
    var = (10 * 409 - 29 * 29) / (10 * 9)
    assert got["burst"] == round(var / (29 / 10), 6)
    assert got["burst"] > 10


def test_burstiness_clockwork_vs_bursty(spark):
    from imposm3_spark.datapipe.stats import burstiness_by_key

    t0 = datetime(2001, 1, 1)
    rows = [(1, t0 + timedelta(days=i), i) for i in range(6)]  # perfectly regular
    # bursty: gaps 1s,1s,1s then 30 days
    rows += [(2, t0 + timedelta(seconds=s), 100 + s) for s in (0, 1, 2, 3)]
    rows += [(2, t0 + timedelta(days=30), 200)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, id long")
    got = {r.k: r.burstiness for r in burstiness_by_key(df, "k", "ts", "id").collect()}
    assert got[1] == -1.0  # zero variance gaps -> perfectly regular
    assert got[2] > 0.25  # near the n=4 burstiness ceiling (sqrt(3)-1)/(sqrt(3)+1)
    # hand-check key 2: gaps 1,1,1,2591997
    g = [1, 1, 1, 2592000 - 3]
    n, s, ss = len(g), sum(g), sum(x * x for x in g)
    b = (math.sqrt(n * ss - s * s) - s) / (math.sqrt(n * ss - s * s) + s)
    assert got[2] == round(b, 6)


def test_weighted_entropy_matches_row_level(spark):
    """categorical_entropy on a pre-aggregated count table must equal the
    row-level computation."""
    from imposm3_spark.datapipe.stats import categorical_entropy

    rows = [("k1", "a")] * 3 + [("k1", "b")] * 1 + [("k2", "a")] * 2 + [("k2", "b")] * 2
    df = spark.createDataFrame(rows, "k string, c string")
    row_level = {
        (r.k, r.n): r.entropy
        for r in categorical_entropy(df, "k", "c", ["a", "b"]).collect()
    }
    agg = df.groupBy("k", "c").count().withColumnRenamed("count", "w")
    weighted = {
        (r.k, r.n): r.entropy
        for r in categorical_entropy(agg, "k", "c", ["a", "b"], weight_col="w").collect()
    }
    assert row_level == weighted
    assert weighted[("k2", 4)] == round(math.log(2), 6)
