"""ROC AUC: sklearn-free exact reference (trapezoid over the Mann-Whitney
identity), tie handling, degenerate classes, and partition invariance."""

from __future__ import annotations

from imposm3_spark.datapipe.evaluation import roc_auc


def _ref_auc(pairs):
    """Mann-Whitney with 0.5 tie credit, O(n^2) reference."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if not pos or not neg:
        return None
    wins = 0.0
    for p in pos:
        for n in neg:
            wins += 1.0 if p > n else (0.5 if p == n else 0.0)
    return round(wins / (len(pos) * len(neg)), 6)


def _run(spark, pairs, partitions=None):
    df = spark.createDataFrame(pairs, "score double, pos long")
    if partitions:
        df = df.repartition(partitions)
    row = roc_auc(df, "score", "pos").collect()[0]
    return row.pos_cnt, row.neg_cnt, row.auc


def test_perfect_and_inverted(spark):
    perfect = [(float(i), 1 if i >= 5 else 0) for i in range(10)]
    assert _run(spark, perfect) == (5, 5, 1.0)
    inverted = [(float(-i), 1 if i >= 5 else 0) for i in range(10)]
    assert _run(spark, inverted) == (5, 5, 0.0)


def test_ties_half_credit(spark):
    pairs = [(1.0, 1), (1.0, 0), (2.0, 1), (0.0, 0)]
    assert _run(spark, pairs) == (2, 2, _ref_auc(pairs))


def test_random_matches_reference_any_partitioning(spark):
    import random

    rng = random.Random(5)
    pairs = [
        (round(rng.uniform(0, 1), 2), rng.randint(0, 1)) for _ in range(300)
    ]
    expect = _ref_auc(pairs)
    assert _run(spark, pairs)[2] == expect
    assert _run(spark, pairs, partitions=7)[2] == expect  # partition-invariant


def test_degenerate_single_class(spark):
    pairs = [(1.0, 1), (2.0, 1)]
    assert _run(spark, pairs) == (2, 0, None)
