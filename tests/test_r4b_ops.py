"""Round-4 batch 15 operators: k-anonymity audit, exact Gini, Benford
screen, tie-averaged Spearman, bounded k-core peeling."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_k_anonymity_classes(spark):
    from imposm3_spark.datapipe.privacy import k_anonymity_report

    rows = (
        [("a", 1, u) for u in (1, 1, 2)]  # class size 3, l=2
        + [("a", 2, 7)]  # singleton, l=1 — at risk
        + [("b", 1, u) for u in (1, 2, 3, 4, 5)]  # size 5, l=5
        + [("b", 2, 9), ("b", 2, 9)]  # size 2, l=1 — at risk
    )
    df = spark.createDataFrame(rows, "qa string, qb int, sensitive int")
    got = {
        r.class_size: (r.n_classes, r.n_rows, r.min_l, r.at_risk)
        for r in k_anonymity_report(df, ["qa", "qb"], "sensitive", k=5).collect()
    }
    assert got == {
        1: (1, 1, 1, True),
        2: (1, 2, 1, True),
        3: (1, 3, 2, True),
        5: (1, 5, 5, False),
    }


def test_gini_extremes(spark):
    from imposm3_spark.datapipe.stats import gini_coefficient

    # perfectly equal -> 0
    eq = spark.createDataFrame([(k, 100) for k in range(8)], "k long, v long")
    assert gini_coefficient(eq, "k", "v").collect()[0].gini == 0.0
    # one key holds everything -> (n-1)/n
    one = spark.createDataFrame(
        [(0, 1000)] + [(k, 0) for k in range(1, 10)], "k long, v long"
    )
    assert gini_coefficient(one, "k", "v").collect()[0].gini == round(9 / 10, 6)
    # hand case: values 1,2,3,4 -> G = (2*(1+4+9+16) - 5*10) / (4*10) = 0.25
    h = spark.createDataFrame([(k, k + 1) for k in range(4)], "k long, v long")
    assert gini_coefficient(h, "k", "v").collect()[0].gini == 0.25


def test_benford_counts_and_chi(spark):
    from imposm3_spark.datapipe.stats import benford_digits

    # cents: 100, 1100, 1200, 250, 990000 -> first digits 1,1,1,2,9
    vals = [1.0, 11.0, 12.0, 2.5, 9900.0]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = {r.digit: r for r in benford_digits(df, "value").collect()}
    assert [got[d].obs for d in range(1, 10)] == [3, 1, 0, 0, 0, 0, 0, 0, 1]
    assert got[1].share == 0.6
    p1 = math.log10(2.0)
    chi1 = (3 - 5 * p1) ** 2 / (5 * p1)
    assert got[1].chi_term == round(chi1, 6)
    # zero-count digits still appear with their expected share
    assert got[3].obs == 0 and got[3].expected == round(math.log10(4 / 3), 6)


def test_spearman_monotone_and_ties(spark):
    from imposm3_spark.datapipe.stats import spearman_by_group

    rows = [("up", i, i * 10) for i in range(6)]
    rows += [("down", i, 100 - i) for i in range(6)]
    # ties case: x = [1,1,2], y = [3,5,4] -> ranks x (1.5,1.5,3), y (1,3,2)
    rows += [("tie", 1, 3), ("tie", 1, 5), ("tie", 2, 4)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: r.spearman_rho for r in spearman_by_group(df, "g", "x", "y").collect()}
    assert got["up"] == 1.0
    assert got["down"] == -1.0
    # hand Spearman with average ranks: rho = 0.5 for the tie case
    ax, ay = [1.5, 1.5, 3.0], [1.0, 3.0, 2.0]
    n = 3
    sab = sum(a * b for a, b in zip(ax, ay))
    sa, sb = sum(ax), sum(ay)
    saa, sbb = sum(a * a for a in ax), sum(b * b for b in ay)
    rho = (n * sab - sa * sb) / math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
    assert got["tie"] == round(rho, 6)


def test_spearman_skips_zero_variance(spark):
    from imposm3_spark.datapipe.stats import spearman_by_group

    rows = [("flat", 5, i) for i in range(4)]  # x constant -> no rho
    rows += [("ok", i, i) for i in range(4)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g for r in spearman_by_group(df, "g", "x", "y").collect()}
    assert got == {"ok"}


def test_kcore_peels_to_clique(spark):
    from imposm3_spark.datapipe.graph import kcore_peel

    # K4 (a,b,c,d) + pendant chain d-e-f: the 3-core is exactly K4.
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    chain = [("d", "e"), ("e", "f")]
    df = spark.createDataFrame(k4 + chain, "s string, d string")
    got = {r.node: r.degree for r in kcore_peel(df, k=3, rounds=4).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_kcore_cascading_peel_needs_recount(spark):
    from imposm3_spark.datapipe.graph import kcore_peel

    # path graph: every interior node has degree 2, but the 2-core of a
    # path is EMPTY — each peel exposes new low-degree endpoints, which
    # is exactly what a one-shot degree threshold gets wrong.
    path = [(f"n{i}", f"n{i+1}") for i in range(8)]
    df = spark.createDataFrame(path, "s string, d string")
    assert kcore_peel(df, k=2, rounds=8).count() == 0
    # a cycle survives k=2 intact
    cyc = [(f"c{i}", f"c{(i+1) % 5}") for i in range(5)]
    dfc = spark.createDataFrame(cyc, "s string, d string")
    got = {r.node: r.degree for r in kcore_peel(dfc, k=2, rounds=8).collect()}
    assert got == {f"c{i}": 2 for i in range(5)}
