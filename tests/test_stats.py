"""Unit tests for datapipe.stats (rolling z-score, count-min sketch,
approx-distinct bound) and the round-3 dedup/quality additions
(semantic_dedup, contamination_score, gopher_rules)."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

from imposm3_spark.datapipe import stats as st
from imposm3_spark.datapipe.dedup import contamination_score
from imposm3_spark.datapipe.similarity import semantic_dedup
from imposm3_spark.datapipe.text import gopher_rules


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2001, 1, 1) + datetime.timedelta(minutes=i), u, v)
            for i, (u, v) in enumerate(rows)
        ],
        "event_id bigint, ts timestamp, user_id bigint, value double",
    )


class TestRollingZscore:
    def test_matches_hand_computation(self, spark):
        # user 1: eight 10.00s then one 50.00 — the spike must flag
        rows = [(1, 10.0)] * 8 + [(1, 50.0)]
        out = st.rolling_zscore(
            _events(spark, rows), min_periods=8
        ).collect()
        # constant history has zero variance -> B == 0 -> no row for the
        # spike; perturb instead
        assert out == []

    def test_spike_flags(self, spark):
        base = [(1, 10.0 + 0.1 * (i % 2)) for i in range(8)]
        rows = base + [(1, 50.0)]
        out = st.anomalies(_events(spark, rows), min_periods=8).collect()
        assert len(out) == 1
        r = out[0]
        assert r.event_id == 8 and r.n == 8
        # hand-compute: cents history alternates 1000/1010, spike 5000
        cents = [1000, 1010] * 4
        n, s, ss = 8, sum(cents), sum(c * c for c in cents)
        A = 5000 * n - s
        B = n * ss - s * s
        z = A / math.sqrt(B * n / (n - 1))
        assert abs(r.z - round(z, 4)) < 1e-9

    def test_window_is_per_user(self, spark):
        # user 2's events must not contribute to user 1's window
        rows = [(1, 10.0), (2, 99.0)] * 8 + [(1, 10.1)]
        out = st.rolling_zscore(_events(spark, rows), min_periods=8).collect()
        for r in out:
            assert r.user_id in (1, 2)
        # user 1's window at its 9th event has 8 rows all ~10
        u1 = [r for r in out if r.user_id == 1]
        assert all(r.n <= 8 for r in u1)


class TestCountMin:
    def test_never_undercounts(self, spark):
        df = spark.createDataFrame(
            [(i, f"k{i % 7}") for i in range(1000)], "id bigint, key string"
        )
        out = st.count_min_estimates(df, "key", width=4, depth=2).collect()
        assert len(out) == 7
        for r in out:
            assert r.est >= r.exact
            assert r.overcount == r.est - r.exact
            assert r.overcount >= 0

    def test_exact_when_no_collisions(self, spark):
        df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "id bigint, key string")
        out = {r.key: r for r in st.count_min_estimates(df, "key", width=4096, depth=3).collect()}
        assert out["a"].est == out["a"].exact == 2
        assert out["b"].est == out["b"].exact == 1


class TestApproxDistinct:
    def test_within_bound(self, spark):
        df = spark.createDataFrame(
            [(f"t{i % 3}", i % 500) for i in range(5000)], "grp string, uid bigint"
        )
        out = st.approx_distinct_check(df, "grp", "uid").collect()
        assert len(out) == 3
        for r in out:
            assert r.within_bound
            assert r.exact_distinct > 0


class TestSemanticDedup:
    def test_identical_vectors_dedup_to_min_id(self, spark):
        v = [1.0] + [0.0] * 63
        w = [0.0, 1.0] + [0.0] * 62
        df = spark.createDataFrame(
            [(1, v), (2, v), (3, w)], "vec_id bigint, embedding array<float>"
        )
        kept = {r.vec_id for r in semantic_dedup(df, threshold=0.99).collect()}
        # 1 and 2 are identical -> same bucket, cosine 1 -> 2 dropped
        assert 1 in kept and 2 not in kept and 3 in kept

    def test_threshold_respected(self, spark):
        v = [1.0] + [0.0] * 63
        u = [1.0, 1.0] + [0.0] * 62  # cosine ~0.707 to v
        df = spark.createDataFrame(
            [(1, v), (2, u)], "vec_id bigint, embedding array<float>"
        )
        kept_loose = {r.vec_id for r in semantic_dedup(df, threshold=0.9).collect()}
        assert kept_loose == {1, 2}

    def test_cluster_column_is_bucket(self, spark):
        v = [0.5] * 64
        df = spark.createDataFrame([(7, v)], "vec_id bigint, embedding array<float>")
        rows = semantic_dedup(df).collect()
        assert len(rows) == 1 and 0 <= rows[0].cluster < 64


class TestContaminationScore:
    def test_exact_fraction(self, spark):
        corpus = spark.createDataFrame(
            [(1, "a b c d"), (2, "x y z w")], "doc_id bigint, text string"
        )
        bench = spark.createDataFrame([(9, "a b c")], "doc_id bigint, text string")
        out = {r.doc_id: r for r in contamination_score(corpus, bench).collect()}
        # doc 1 shingles: {a b c, b c d}; bench: {a b c} -> 1/2
        assert out[1].n_shingles == 2 and out[1].n_shared == 1
        assert abs(out[1].overlap_frac - 0.5) < 1e-12
        assert out[2].n_shared == 0 and out[2].overlap_frac == 0.0


class TestGopherRules:
    def test_rules(self, spark):
        good = "the cat and the dog of a house in that is town " * 2  # 24 toks
        short = "the and"
        symbols = "the ?? !! ## $$ %% ^^ && ** (( )) and of to a in is that x y"
        df = spark.createDataFrame(
            [(1, good), (2, short), (3, symbols)], "doc_id bigint, text string"
        )
        out = {r.doc_id: r for r in gopher_rules(df).collect()}
        assert out[1].passes
        assert not out[2].r_word_count and not out[2].passes
        assert not out[3].r_symbol_ratio and not out[3].passes
        assert out[3].r_stopwords  # plenty of distinct stopwords present


class TestBigramNLL:
    def test_predictable_text_scores_lower(self, spark):
        from imposm3_spark.datapipe.text import bigram_nll

        df = spark.createDataFrame(
            [
                (1, "a b a b a b a b a b a b"),  # perfectly predictable bigrams
                (2, "q w e r t y u i o p z x"),  # every bigram unique
                (3, ""),  # empty doc drops out
            ],
            "doc_id bigint, text string",
        )
        out = {r.doc_id: r for r in bigram_nll(df).collect()}
        assert set(out) == {1, 2}
        assert out[1].n_tokens == 12 and out[2].n_tokens == 12
        assert out[1].nll < out[2].nll


class TestHLLMerge:
    def test_merged_estimate_within_bound(self, spark):
        import datetime

        rows = [
            (
                i,
                datetime.datetime(2001, 1, 1 + i % 5),
                f"g{i % 2}",
                i % 300,
            )
            for i in range(3000)
        ]
        df = spark.createDataFrame(
            rows, "id bigint, ts timestamp, grp string, uid bigint"
        )
        out = st.hll_merge_check(df, "grp", "ts", "uid").collect()
        assert len(out) == 2
        for r in out:
            assert r.merged_within_bound and r.n_days == 5
            assert r.exact_distinct == 150


class TestWeightedSample:
    def test_weight_proportional_and_deterministic(self, spark):
        from imposm3_spark.datapipe.sampling import weighted_sample

        # 200 light rows (w=1) + 200 heavy rows (w=50): the heavy half
        # must dominate a k=40 sample
        df = spark.createDataFrame(
            [(i, 1 if i < 200 else 50) for i in range(400)], "doc_id bigint, w bigint"
        )
        s1 = weighted_sample(df, "w", 40, id_col="doc_id").collect()
        s2 = weighted_sample(df, "w", 40, id_col="doc_id").collect()
        assert [r.doc_id for r in s1] == [r.doc_id for r in s2]  # deterministic
        heavy = sum(1 for r in s1 if r.doc_id >= 200)
        assert heavy >= 35  # inclusion ∝ weight

    def test_subset_nesting(self, spark):
        from imposm3_spark.datapipe.sampling import weighted_sample

        df = spark.createDataFrame(
            [(i, i + 1) for i in range(100)], "doc_id bigint, w bigint"
        )
        top10 = {r.doc_id for r in weighted_sample(df, "w", 10).collect()}
        top30 = {r.doc_id for r in weighted_sample(df, "w", 30).collect()}
        assert top10 <= top30  # A-Res keys are fixed; top-k nests


class TestOLSTrend:
    def test_exact_slope(self, spark):
        import datetime

        # user 1: value rises exactly 1.00/minute -> 144000 cents/day
        rows = [
            (i, datetime.datetime(2001, 1, 1) + datetime.timedelta(minutes=i), 1, 10.0 + i)
            for i in range(10)
        ]
        # user 2: constant -> zero slope; user 3: single point -> dropped
        rows += [
            (100 + i, datetime.datetime(2001, 1, 1) + datetime.timedelta(minutes=i), 2, 5.0)
            for i in range(5)
        ]
        rows += [(999, datetime.datetime(2001, 1, 1), 3, 7.0)]
        df = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, value double"
        )
        out = {r.user_id: r for r in st.group_ols_trend(df).collect()}
        assert set(out) == {1, 2}
        assert abs(out[1].trend_per_day - 144000.0) < 1e-6  # 100 cents/min
        assert out[2].trend_per_day == 0.0


def test_hll_intersect_estimate(spark):
    from imposm3_spark.datapipe.stats import hll_intersect_estimate

    # users 0-99 click, 50-149 view -> intersection 50-99 (50 users)
    rows = []
    eid = 0
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    for u in range(100):
        eid += 1
        rows.append((eid, t0, u, "click", 1.0, "{}"))
    for u in range(50, 150):
        eid += 1
        rows.append((eid, t0, u, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    row = hll_intersect_estimate(df, "event_type", "click", "view", "user_id").collect()[0]
    assert (row.exact_a, row.exact_b, row.exact_both) == (100, 100, 50)
    assert row.approx_both_ok
