"""Round-4 batch 4: time-bound funnel step semantics, rolling active
users vs a python reference, and centroid drift exactness."""

from __future__ import annotations

import datetime as dt

import numpy as np

from imposm3_spark.datapipe.mining import funnel_timebound
from imposm3_spark.datapipe.similarity import centroid_drift
from imposm3_spark.datapipe.stats import rolling_active_users

EV_SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
T0 = dt.datetime(2001, 3, 1, 0, 0, 0)


def _ev(rows):
    return [
        (eid, T0 + dt.timedelta(hours=h), uid, et, 1.0, "{}")
        for (eid, uid, et, h) in rows
    ]


def test_funnel_window_enforces_deadline_and_order(spark):
    rows = [
        # user 1: full funnel inside the windows
        (1, 1, "signup", 0), (2, 1, "click", 2), (3, 1, "purchase", 3),
        # user 2: click arrives 30h after signup -> stage stops at 1
        (4, 2, "signup", 0), (5, 2, "click", 30), (6, 2, "purchase", 31),
        # user 3: click BEFORE signup doesn't count; the later click does
        (7, 3, "click", 0), (8, 3, "signup", 1), (9, 3, "click", 5),
        # user 4: purchase within 24h of signup but NO click -> stage 1
        (10, 4, "signup", 0), (11, 4, "purchase", 1),
        # user 5: never signed up -> absent
        (12, 5, "click", 0), (13, 5, "purchase", 1),
    ]
    df = spark.createDataFrame(_ev(rows), EV_SCHEMA)
    got = {r.user_id: (r.stage, r.convert_s) for r in funnel_timebound(df).collect()}
    assert got == {
        1: (3, 3 * 3600),
        2: (1, None),
        3: (2, None),
        4: (1, None),
    }


def test_funnel_window_deadline_chains_from_each_step(spark):
    # click at +20h (inside), purchase at +42h: 22h after click (inside
    # click's window) though 42h after signup -> still stage 3
    rows = [(1, 1, "signup", 0), (2, 1, "click", 20), (3, 1, "purchase", 42)]
    df = spark.createDataFrame(_ev(rows), EV_SCHEMA)
    got = funnel_timebound(df).collect()[0]
    assert got.stage == 3 and got.convert_s == 42 * 3600


def test_rolling_active_users_vs_python(spark):
    rows = []
    eid = 0
    activity = {  # day -> users active
        0: {1, 2}, 1: {2}, 3: {1, 3}, 9: {4}, 10: {1, 2, 3},
    }
    for day, users in activity.items():
        for u in users:
            rows.append((eid, u, "click", day * 24))
            eid += 1
            # a second event same day must not double count
            rows.append((eid, u, "view", day * 24 + 1))
            eid += 1
    df = spark.createDataFrame(_ev(rows), EV_SCHEMA)
    got = {r.day: (r.dau, r.wau) for r in rolling_active_users(df).collect()}
    base = T0.date()
    expect = {}
    maxd = max(activity)
    for g in range(maxd + 1):
        wau = set()
        for d in range(max(0, g - 6), g + 1):
            wau |= activity.get(d, set())
        if wau:
            expect[base + dt.timedelta(days=g)] = (len(activity.get(g, set())), len(wau))
    assert got == expect


def test_centroid_drift_zero_for_identical_slices(spark):
    rows = [(i, [0.5, -0.25, 0.125], i % 3) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = centroid_drift(df, df).collect()
    assert all(r.l2_shift == 0.0 for r in got)
    assert {r.label for r in got} == {0, 1, 2}


def test_centroid_drift_matches_numpy(spark):
    rng = np.random.default_rng(3)
    a = [(i, [float(x) for x in rng.normal(0, 1, 8)], 0) for i in range(50)]
    b = [(1000 + i, [float(x) for x in rng.normal(0.3, 1, 8)], 0) for i in range(40)]
    df_a = spark.createDataFrame(a, "vec_id long, embedding array<float>, label int")
    df_b = spark.createDataFrame(b, "vec_id long, embedding array<float>, label int")
    got = centroid_drift(df_a, df_b).collect()[0]
    # numpy reference on float32-truncated inputs (the array<float> cast)
    ma = np.mean([np.array(v, dtype=np.float32) for (_, v, _) in a], axis=0)
    mb = np.mean([np.array(v, dtype=np.float32) for (_, v, _) in b], axis=0)
    ref = float(np.linalg.norm(ma - mb))
    assert got.na == 50 and got.nb == 40
    assert abs(got.l2_shift - ref) < 1e-4


def test_pareto_curve_monotone_and_exact(spark):
    from imposm3_spark.datapipe.stats import pareto_curve
    from pyspark.sql import functions as F

    rows = [(i, (i + 1) * 100) for i in range(25)]  # revenues 100..2500
    df = spark.createDataFrame(rows, "k long, cents long")
    got = sorted(pareto_curve(df, "k", "cents", buckets=5).collect(),
                 key=lambda r: r.bucket)
    # 25 keys / 5 buckets -> 5 each; bucket 1 holds the TOP revenues
    assert [r.customers for r in got] == [5] * 5
    total = sum(c for (_, c) in rows)
    top5 = sum(sorted((c for (_, c) in rows), reverse=True)[:5])
    assert got[0].cum_share == round(top5 / total, 6)
    assert got[-1].cum_share == 1.0
    shares = [r.cum_share for r in got]
    assert shares == sorted(shares)
    assert abs(sum(r.revenue for r in got) - total / 100.0) < 1e-6
