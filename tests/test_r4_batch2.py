"""Round-4 batch 2: hard-negative mining semantics, n-gram diversity
bounds, and interval-overlap join vs a naive reference."""

from __future__ import annotations

import datetime as dt
from itertools import combinations

from pyspark.sql import functions as F

from imposm3_spark.datapipe.similarity import hard_negatives
from imposm3_spark.datapipe.temporal import interval_overlap_join
from imposm3_spark.datapipe.text import ngram_diversity


def test_hard_negatives_excludes_same_label(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.1], 0),   # same label as query 0 — must not appear
        (2, [0.9, 0.2], 1),
        (3, [0.5, 0.5], 1),
        (4, [-1.0, 0.0], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = hard_negatives(df, df.filter(F.col("vec_id") == 0), k=2).collect()
    ids = [(r.rank, r.neg_id) for r in sorted(got, key=lambda r: r.rank)]
    assert ids == [(1, 2), (2, 3)]
    assert all(r.neg_label != 0 for r in got)


def test_hard_negatives_rank_is_dense_per_query(spark):
    rows = [(i, [float(i), 1.0], i % 2) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = hard_negatives(df, df, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_ngram_diversity_bounds_and_repetition(spark):
    rows = [
        (0, "a a a a a a a a", "low", "x", 1),
        (1, "one two three four five six seven eight", "high", "x", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    got = {r.source: r for r in ngram_diversity(df, group_col="source").collect()}
    assert got["low"].distinct1_ratio == round(1 / 8, 6)
    assert got["low"].distinct2_ratio == round(1 / 7, 6)
    assert got["high"].distinct1_ratio == 1.0
    assert got["high"].distinct2_ratio == 1.0
    assert got["low"].tokens_total == 8 and got["high"].n_docs == 1


def _iv_rows(spans):
    t0 = dt.datetime(2001, 1, 1)
    return [
        (k, name, t0 + dt.timedelta(days=a), t0 + dt.timedelta(days=b))
        for (k, name, a, b) in spans
    ]


def test_interval_overlap_matches_naive(spark):
    spans = [
        (1, "a", 0, 10),
        (1, "b", 5, 15),     # overlaps a by 5 days
        (1, "c", 20, 30),    # disjoint from both
        (1, "d", 0, 100),    # spans several months — multi-granule dedup
        (2, "a", 0, 10),     # different key: never pairs with key 1
    ]
    left = spark.createDataFrame(
        _iv_rows(spans), "k int, name string, f timestamp_ntz, t timestamp_ntz"
    ).selectExpr("k", "name as l_name", "f as l_from", "t as l_to")
    right = spark.createDataFrame(
        _iv_rows(spans), "k int, name string, f timestamp_ntz, t timestamp_ntz"
    ).selectExpr("k", "name as r_name", "f as r_from", "t as r_to")
    got = {
        (r.k, r.l_name, r.r_name): r.overlap_s
        for r in interval_overlap_join(left, right, key="k").collect()
        if r.l_name < r.r_name
    }
    expect = {}
    for (ka, na, fa, ta), (kb, nb, fb, tb) in combinations(spans, 2):
        if ka == kb and fa < tb and fb < ta and na < nb:
            expect[(ka, na, nb)] = (min(ta, tb) - max(fa, fb)) * 86400
    assert got == expect


def test_interval_overlap_no_duplicate_pairs_across_months(spark):
    # both intervals cover 4 months -> 4 granule matches, ONE output row
    left = spark.createDataFrame(
        _iv_rows([(1, "x", 0, 120)]), "k int, l_name string, l_from timestamp_ntz, l_to timestamp_ntz"
    )
    right = spark.createDataFrame(
        _iv_rows([(1, "y", 1, 119)]), "k int, r_name string, r_from timestamp_ntz, r_to timestamp_ntz"
    )
    out = interval_overlap_join(left, right, key="k").collect()
    assert len(out) == 1
    assert out[0].overlap_s == 118 * 86400
