"""Round-4 batch 19 operators: exact two-sample KS, Wilson conversion
CI, Markov stationary distribution, and the global-cumsum primitive."""

from __future__ import annotations

import math


def test_global_cumsums_across_partitions(spark):
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe.sampling import with_global_cumsums

    rows = [(i, 1, i % 3) for i in range(500)]
    df = spark.createDataFrame(rows, "v long, one long, w long").repartition(13)
    out = with_global_cumsums(df, ["v"], ["one", "w"], num_partitions=7)
    got = {r.v: (r.cum_one, r.cum_w) for r in out.collect()}
    acc1 = accw = 0
    for v in range(500):
        acc1 += 1
        accw += v % 3
        assert got[v] == (acc1, accw), v


def test_ks_identical_and_disjoint(spark):
    from imposm3_spark.datapipe.stats import ks_two_sample

    # identical distributions -> D = 0
    rows = [("a", float(v)) for v in (1, 2, 3, 4)] * 5
    rows += [("b", float(v)) for v in (1, 2, 3, 4)] * 5
    df = spark.createDataFrame(rows, "g string, value double")
    r = ks_two_sample(df, "g", "value", "a", "b").collect()[0]
    assert r.d_stat == 0.0 and r.n_a == 20 and r.n_b == 20

    # fully separated -> D = 1 at the boundary of the lower sample
    rows2 = [("a", float(v)) for v in (1, 2, 3)]
    rows2 += [("b", float(v)) for v in (10, 11, 12)]
    df2 = spark.createDataFrame(rows2, "g string, value double")
    r2 = ks_two_sample(df2, "g", "value", "a", "b").collect()[0]
    assert r2.d_stat == 1.0
    assert r2.at_value == 3.0  # the gap is maximal (and first) at a's max


def test_ks_hand_value(spark):
    from imposm3_spark.datapipe.stats import ks_two_sample

    # a: [1,1,2,3]  b: [2,3,3,4]
    rows = [("a", v) for v in (1.0, 1.0, 2.0, 3.0)]
    rows += [("b", v) for v in (2.0, 3.0, 3.0, 4.0)]
    df = spark.createDataFrame(rows, "g string, value double")
    r = ks_two_sample(df, "g", "value", "a", "b").collect()[0]
    # CDFs at 1: 0.5 vs 0 -> gap 0.5 (max, earliest)
    assert r.d_stat == 0.5 and r.at_value == 1.0


def test_wilson_ci_hand_value(spark):
    from imposm3_spark.datapipe.stats import conversion_wilson

    # one key: 3 of 4 'from' users convert
    rows = [("d1", u, "view") for u in (1, 2, 3, 4)]
    rows += [("d1", u, "purchase") for u in (1, 2, 3)]
    rows += [("d1", 99, "purchase")]  # converter without a view: not a trial
    df = spark.createDataFrame(rows, "k string, user_id long, event_type string")
    r = conversion_wilson(df, "k", "user_id", "event_type", "view", "purchase").collect()[0]
    assert (r.n_trials, r.n_conv, r.rate) == (4, 3, 0.75)
    z = 1.96
    k, n = 3.0, 4.0
    center = (k + z * z / 2) / (n + z * z)
    half = z * math.sqrt(k * (n - k) / n + z * z / 4) / (n + z * z)
    assert r.ci_lo == round(center - half, 6)
    assert r.ci_hi == round(center + half, 6)
    assert 0.0 < r.ci_lo < 0.75 < r.ci_hi < 1.0


def test_markov_stationary_prefers_absorbing_hub(spark):
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe.graph import SCALE, pagerank_fixed_point

    # two nodes: a -> b always, b -> b mostly: stationary mass piles on b
    edges = spark.createDataFrame(
        [("a", "b", 10), ("b", "b", 9), ("b", "a", 1)], "src string, dst string, cnt long"
    )
    nodes = spark.createDataFrame([("a",), ("b",)], "node string")
    got = {
        r.node: r.r
        for r in pagerank_fixed_point(edges, nodes, iterations=6, damping_pct=100).collect()
    }
    assert got["b"] > 4 * got["a"]
    # no damping base: total mass stays within SCALE (floor-div leakage only)
    assert got["a"] + got["b"] <= SCALE
    _ = F


def test_churn_labels_leakage_safe(spark):
    """Features never see past the cutoff; the label never sees before
    it; customers without pre-cutoff history are absent."""
    from imposm3_spark.datapipe.labels import churn_labels

    rows = [
        # c1: two orders before cutoff, returns in window -> label 1
        (1, "2000-12-01", 10.0), (1, "2000-06-01", 20.0), (1, "2001-02-01", 99.0),
        # c2: one order before, next outside the 90d horizon -> label 0
        (2, "2000-11-15", 5.0), (2, "2001-07-01", 7.0),
        # c3: only post-cutoff orders -> no row at all
        (3, "2001-03-01", 50.0),
    ]
    df = spark.createDataFrame(
        [(k, f"{d} 00:00:00", v) for k, d, v in rows],
        "o_custkey long, o_orderdate string, o_totalprice double",
    ).selectExpr("o_custkey", "CAST(o_orderdate AS TIMESTAMP) o_orderdate", "o_totalprice")
    got = {r.o_custkey: r for r in churn_labels(df, "2001-01-01", 90).collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    # post-cutoff 99.0 must NOT leak into the spend feature
    assert (r1.n_orders, r1.total_cents, r1.will_return) == (2, 3000, 1)
    assert r1.recency_days == 31  # 2000-12-01 -> 2001-01-01
    assert r1.tenure_days == 183  # 2000-06-01 -> 2000-12-01
    r2 = got[2]
    assert (r2.n_orders, r2.will_return) == (1, 0)


def test_kendall_tau_b_vs_bruteforce(spark):
    """tau-b must equal the O(n^2) brute-force pair count, including the
    tie corrections, on awkward tied data."""
    import itertools

    from imposm3_spark.datapipe.stats import kendall_tau_b

    pts = [(1, 0), (1, 1), (2, 0), (2, 2), (3, 1), (3, 2), (5, 3), (5, 3), (4, 0), (9, 3)]
    df = spark.createDataFrame(pts, "x long, y long")
    r = kendall_tau_b(df, "x", "y", n_y=4).collect()[0]

    C = D = 0
    for (xa, ya), (xb, yb) in itertools.combinations(pts, 2):
        s = (xa - xb) * (ya - yb)
        if s > 0:
            C += 1
        elif s < 0:
            D += 1
    n = len(pts)
    n0 = n * (n - 1) // 2
    tx: dict = {}
    ty: dict = {}
    for x, y in pts:
        tx[x] = tx.get(x, 0) + 1
        ty[y] = ty.get(y, 0) + 1
    n1 = sum(t * (t - 1) // 2 for t in tx.values())
    n2 = sum(t * (t - 1) // 2 for t in ty.values())
    tau = (C - D) / math.sqrt((n0 - n1) * (n0 - n2))
    assert (r.concordant, r.discordant) == (float(C), float(D))
    assert r.tau_b == round(tau, 6)


def test_kendall_tau_perfect_orders(spark):
    from imposm3_spark.datapipe.stats import kendall_tau_b

    up = spark.createDataFrame([(i, i % 4) for i in range(8)], "x long, y long")
    # x strictly increasing, y cycling: not perfect; use aligned data
    aligned = spark.createDataFrame(
        [(i, min(i, 3)) for i in range(8)], "x long, y long"
    )
    r = kendall_tau_b(aligned, "x", "y", n_y=4).collect()[0]
    assert r.discordant == 0.0 and r.tau_b > 0.7  # tie correction caps it below 1
    rev = spark.createDataFrame(
        [(i, min(7 - i, 3)) for i in range(8)], "x long, y long"
    )
    r2 = kendall_tau_b(rev, "x", "y", n_y=4).collect()[0]
    assert r2.concordant == 0.0 and r2.tau_b < -0.7
    _ = up


def test_did_recovers_planted_effect(spark):
    """Plant a trend shared by both groups plus a +5.00 treatment-only
    post-period lift: DiD must recover exactly +5.00 while the naive
    post-pre difference of the treated group reads trend + lift."""
    from datetime import datetime, timedelta

    from imposm3_spark.datapipe.stats import diff_in_diff

    t0 = datetime(2001, 6, 1)
    rows = []
    for day in range(30):
        ts = t0 + timedelta(days=day)
        post = day >= 15
        base = 10.0 + (2.0 if post else 0.0)  # shared time trend +2
        for u in range(1, 5):  # users 1,3 treated; 2,4 control
            lift = 5.0 if (post and u % 2 == 1) else 0.0
            rows.append((u, ts, "x", base + lift))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, value double")
    r = diff_in_diff(df, "user_id", "ts", "value", "2001-06-15", group_col="event_type").collect()[0]
    assert r.did_effect == 5.0
    assert r.nt_pre == r.nc_pre == 30 and r.nt_post == r.nc_post == 30


def test_eta_squared_extremes(spark):
    """Category fully determines the value -> eta2 = 1; category
    irrelevant (same values in every category) -> eta2 = 0."""
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe.stats import eta_squared_by_group

    det = [("d", c, 100 * (c + 1)) for c in (0, 1, 2) for _ in range(4)]
    irr = [("i", c, v) for c in (0, 1, 2) for v in (10, 20, 30)]
    df = spark.createDataFrame(det + irr, "g string, cat int, v long")
    got = {
        r.g: r.eta_sq
        for r in eta_squared_by_group(df, "g", "cat", F.col("v"), [0, 1, 2]).collect()
    }
    assert got["d"] == 1.0
    assert got["i"] == 0.0


def test_eta_squared_hand_value(spark):
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe.stats import eta_squared_by_group

    # groups: cat0 = [1, 3], cat1 = [5, 7]
    rows = [("k", 0, 1), ("k", 0, 3), ("k", 1, 5), ("k", 1, 7)]
    df = spark.createDataFrame(rows, "g string, cat int, v long")
    r = eta_squared_by_group(df, "g", "cat", F.col("v"), [0, 1]).collect()[0]
    # ss_between = 2*(2-4)^2 + 2*(6-4)^2 = 16; ss_total = 9+1+1+9 = 20
    assert r.eta_sq == round(16 / 20, 6)


def test_runs_test_clumped_vs_alternating(spark):
    """Perfectly alternating above/below -> max runs, z > 0; perfectly
    clumped -> 2 runs, z < 0; both match the textbook z by hand."""
    from datetime import datetime, timedelta

    from imposm3_spark.datapipe.stats import runs_test_by_group

    t0 = datetime(2001, 1, 1)

    def seq(g, vals, base):
        return [
            (g, t0 + timedelta(minutes=i), base + i, float(v))
            for i, v in enumerate(vals)
        ]

    # values 1 and 3 around median 1 (lower median of {1,3} repeated);
    # ties with the median drop, so use 1,3,5: median=3 over odd counts.
    alt = seq("alt", [1, 5] * 8, 0)      # median in {1,5}: lower med 1 -> drops 1s?
    clump = seq("clump", [1] * 8 + [5] * 8, 100)
    df = spark.createDataFrame(alt + clump, "event_type string, ts timestamp, event_id long, value double")
    got = {r.event_type: r for r in runs_test_by_group(df, "event_type", "ts", "event_id", "value").collect()}

    import math

    def z(r, n1, n2):
        mu = 2 * n1 * n2 / (n1 + n2) + 1
        var = 2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) / ((n1 + n2) ** 2 * (n1 + n2 - 1))
        return round((r - mu) / math.sqrt(var), 6)

    # 'alt': 16 rows of 1,5 -> lower median = 1 -> the eight 1s drop (== med),
    # leaving eight 5s: one-sided -> excluded entirely
    assert "alt" not in got
    # 'clump': median = 1 -> 1s drop, only 5s left -> also excluded; make a
    # three-level clumped series instead
    assert "clump" not in got

    tri = seq("tri", [1] * 6 + [9] * 6 + [5], 200)  # median 5 drops one row
    alt3 = seq("alt3", [1, 9] * 6 + [5], 300)
    df2 = spark.createDataFrame(tri + alt3, "event_type string, ts timestamp, event_id long, value double")
    got2 = {r.event_type: r for r in runs_test_by_group(df2, "event_type", "ts", "event_id", "value").collect()}
    rt = got2["tri"]
    assert (rt.n_runs, rt.n1, rt.n2) == (2, 6, 6)
    assert rt.z == z(2, 6, 6) and rt.z < -2
    ra = got2["alt3"]
    assert (ra.n_runs, ra.n1, ra.n2) == (12, 6, 6)
    assert ra.z == z(12, 6, 6) and ra.z > 2


def test_palma_hand_value(spark):
    from imposm3_spark.datapipe.stats import palma_ratio

    # 10 keys, values 1..9 and 100: bottom-40% = ranks 1-4 (1+2+3+4=10),
    # top-10% = rank 10 (100)
    rows = [(k, v) for k, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 100])]
    df = spark.createDataFrame(rows, "k long, v long")
    r = palma_ratio(df, "k", "v").collect()[0]
    assert (r.n_keys, r.s_top, r.s_bot) == (10, 100, 10)
    sv = 145
    assert r.palma == round((100 / sv) / (10 / sv), 6) == 10.0


def test_group_deciles_exact(spark):
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe.stats import group_deciles

    # 1..10: lower decile q is the smallest v with cum >= q
    rows = [("a", v) for v in range(1, 11)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r.q: r.v for r in group_deciles(df, "g", F.col("v")).collect()}
    assert got == {q: q for q in range(1, 10)}
    # with ties the covering value repeats
    rows2 = [("b", v) for v in [1, 1, 1, 1, 1, 9, 9, 9, 9, 9]]
    df2 = spark.createDataFrame(rows2, "g string, v long")
    got2 = {r.q: r.v for r in group_deciles(df2, "g", F.col("v")).collect()}
    assert got2 == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 9, 7: 9, 8: 9, 9: 9}
