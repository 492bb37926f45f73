"""Market-basket pair mining: exact reference check + pair-dedup
semantics (duplicate lines of the same part in one order count once)."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

from pyspark.sql import functions as F

from imposm3_spark.datapipe.mining import frequent_item_pairs


def _reference(baskets, min_support):
    """Pure-python Apriori pair step over (basket, item) tuples."""
    by_basket: dict[int, set[int]] = {}
    for b, i in baskets:
        by_basket.setdefault(b, set()).add(i)
    pair_counts: Counter = Counter()
    item_counts: Counter = Counter()
    for items in by_basket.values():
        for i in items:
            item_counts[i] += 1
        for a, b in combinations(sorted(items), 2):
            pair_counts[(a, b)] += 1
    n = len(by_basket)
    out = {}
    for (a, b), c in pair_counts.items():
        if c >= min_support:
            lift = round(
                (float(c) * float(n)) / (float(item_counts[a]) * float(item_counts[b])),
                6,
            )
            out[(a, b)] = (c, item_counts[a], item_counts[b], lift)
    return out


def test_pairs_match_reference(spark):
    rows = [
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20),
        (3, 10), (3, 20), (3, 40),
        (4, 30), (4, 40),
        (5, 10), (5, 10),  # duplicate line: counts once
        (5, 20),
    ]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = {
        (r.item_a, r.item_b): (r.pair_count, r.count_a, r.count_b, r.lift)
        for r in frequent_item_pairs(df, min_support=2).collect()
    }
    assert got == _reference(rows, 2)


def test_min_support_filters(spark):
    rows = [(1, 1), (1, 2), (2, 1), (2, 2), (3, 5), (3, 6)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = frequent_item_pairs(df, min_support=2).collect()
    assert len(got) == 1 and (got[0].item_a, got[0].item_b) == (1, 2)
    # support-1 pair (5,6) appears when the threshold drops
    all_pairs = frequent_item_pairs(df, min_support=1)
    assert all_pairs.where((F.col("item_a") == 5) & (F.col("item_b") == 6)).count() == 1


def test_rfm_scores_and_rollup(spark):
    import datetime as dt

    from imposm3_spark.datapipe.mining import rfm_segments

    # 4 customers with strictly ordered R, F, M so quartile scores are
    # fully determined: cust i has (i+1) orders, last order i days before
    # ref, each order worth 100*(i+1) dollars.
    rows = []
    ok = 0
    for i in range(4):
        for j in range(i + 1):
            ok += 1
            rows.append(
                (
                    ok,
                    i + 1,
                    "O",
                    100.0 * (i + 1),
                    dt.datetime(1998, 12, 31 - i) - dt.timedelta(days=30 * j),
                    "1-URGENT",
                )
            )
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    )
    out = {
        (r.r_score, r.f_score, r.m_score): (r.n_customers, r.total_monetary)
        for r in rfm_segments(df, ref_date="1999-01-01").collect()
    }
    # cust 0: most recent (r=4), fewest orders (f=1), least money (m=1)
    assert out[(4, 1, 1)] == (1, 100.0)
    # cust 3: least recent (r=1), most orders (f=4), most money (m=4)
    assert out[(1, 4, 4)] == (1, 1600.0)
    assert sum(n for n, _ in out.values()) == 4


def test_fuzzy_pairs_full_recall_all_edit_types(spark):
    from imposm3_spark.datapipe.mining import fuzzy_pairs_edit1

    names = [
        (1, "abcdef"),
        (2, "abcdxf"),   # substitution of 1
        (3, "abcde"),    # deletion from 1
        (4, "abcdeff"),  # insertion into 1
        (5, "abcdef"),   # exact duplicate of 1
        (6, "zzzzzz"),   # unrelated
        (7, "abXdXf"),   # distance 2 from 1: must NOT match 1
    ]
    df = spark.createDataFrame(names, "id long, name string")
    got = {(r.a_id, r.b_id): r.dist for r in fuzzy_pairs_edit1(df, "id", "name").collect()}
    # brute-force reference
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    expect = {
        (i, j): lev(a, b)
        for (i, a) in names
        for (j, b) in names
        if i < j and lev(a, b) <= 1
    }
    assert got == expect
