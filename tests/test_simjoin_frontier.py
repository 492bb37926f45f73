"""Unit tests for the batch-13 exact operators: prefix-filtered
set-similarity join, duplicated-substring spans, temporal
point-in-interval join, skyline frontier, and CUSUM changepoint."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from imposm3_spark.datapipe import frontier as fr
from imposm3_spark.datapipe import simjoin as sj
from imposm3_spark.datapipe import temporal as tp
from imposm3_spark.datapipe import timeseries as ts_


# ---------------------------------------------------------------- ppjoin


def _jaccard(a: str, b: str, k: int = 3) -> float:
    def sh(t):
        toks = t.lower().split()
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    A, B = sh(a), sh(b)
    return len(A & B) / len(A | B) if A | B else 0.0


def test_ppjoin_matches_naive_all_pairs(spark):
    texts = [
        "a b c d e f g h",
        "a b c d e f g x",  # near-dup of 0
        "q w e r t y u i",
        "z z z unrelated words here now ok",
        "a b c d e f g h",  # exact dup of 0
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        (r.id_a, r.id_b): (r.inter, r.uni)
        for r in sj.ppjoin_pairs(docs, threshold=0.5).collect()
    }
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            jac = _jaccard(texts[i], texts[j])
            if jac >= 0.5:
                want[(i, j)] = jac
    assert set(got) == set(want)
    for (i, j), (inter, uni) in got.items():
        assert inter / uni == want[(i, j)]


def test_ppjoin_empty_and_tiny_docs(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=0, text=""), Row(doc_id=1, text="one two"),
         Row(doc_id=2, text="x y z"), Row(doc_id=3, text="x y z")]
    )
    pairs = sj.ppjoin_pairs(docs, threshold=0.5).collect()
    # only the two identical 1-shingle docs can pair
    assert [(r.id_a, r.id_b, r.jaccard) for r in pairs] == [(2, 3, 1.0)]


# ------------------------------------------------------ substring spans


def test_substring_spans_merge_and_bounds(spark):
    # 10-char grams; doc 0 and 1 share a 25-char region -> one merged
    # span covering the region in both docs.
    shared = "ABCDEFGHIJKLMNOPQRSTUVWXY"  # 25 chars
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="000" + shared + "111zzzz"),
            Row(doc_id=1, text=shared + "qqqqqq"),
            Row(doc_id=2, text="totally-different-text!!"),
        ]
    )
    spans = {
        r.doc_id: (r.span_start, r.span_len, r.n_grams)
        for r in sj.duplicated_substring_spans(docs, gram_len=10).collect()
    }
    # doc 0: shared starts at char 4 (1-based), 16 gram positions
    assert spans[0] == (4, 25, 16)
    assert spans[1] == (1, 25, 16)
    assert 2 not in spans


def test_substring_spans_split_islands(spark):
    # two duplicated regions separated by unique filler -> two spans
    a, b = "AAAAAAAAAA", "BBBBBBBBBB"  # 10-char repeated blocks
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=a + "xxyyzzwwvv1234567890" + b),
            Row(doc_id=1, text=a + "ppqqrrsstt0987654321" + b),
        ]
    )
    out = (
        sj.duplicated_substring_spans(docs, gram_len=10)
        .orderBy("doc_id", "span_start")
        .collect()
    )
    assert [(r.doc_id, r.span_start, r.span_len) for r in out] == [
        (0, 1, 10), (0, 31, 10), (1, 1, 10), (1, 31, 10),
    ]


# ------------------------------------------------- interval point join


def _ts(day: int, hour: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, day, hour)


def test_interval_point_join_resolves_correct_interval(spark):
    iv = spark.createDataFrame(
        [
            Row(user_id=1, regime=10, valid_from=_ts(1), valid_to=_ts(10)),
            Row(user_id=1, regime=20, valid_from=_ts(10), valid_to=None),
            Row(user_id=2, regime=30, valid_from=_ts(5), valid_to=None),
        ]
    )
    pts = spark.createDataFrame(
        [
            Row(event_id=100, user_id=1, ts=_ts(3)),     # -> 10
            Row(event_id=101, user_id=1, ts=_ts(10)),    # boundary -> 20
            Row(event_id=102, user_id=1, ts=_ts(25)),    # open -> 20
            Row(event_id=103, user_id=2, ts=_ts(1)),     # before dim -> drop
            Row(event_id=104, user_id=3, ts=_ts(1)),     # unknown key -> drop
        ]
    )
    out = {
        r.event_id: r.regime
        for r in tp.interval_point_join(
            pts, iv, point_key="user_id", point_ts="ts"
        ).collect()
    }
    assert out == {100: 10, 101: 20, 102: 20}


def test_interval_point_join_across_months(spark):
    # interval spanning several months must match points in every month
    iv = spark.createDataFrame(
        [(1, 7, datetime.datetime(2023, 11, 15), None)],
        "user_id bigint, regime bigint, valid_from timestamp, valid_to timestamp",
    )
    pts = spark.createDataFrame(
        [Row(event_id=i, user_id=1, ts=datetime.datetime(2024, m, 2))
         for i, m in enumerate([1, 2, 3])]
    )
    out = tp.interval_point_join(pts, iv, point_key="user_id", point_ts="ts")
    assert out.count() == 3


# -------------------------------------------------------------- skyline


def test_skyline_exact_vs_naive(spark):
    import random

    rng = random.Random(7)
    rows = [
        Row(id=i, qty=rng.randrange(0, 50), price=rng.randrange(0, 50))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows)
    got = {r.id for r in fr.skyline_max_min(df, "id", "qty", "price").collect()}
    want = set()
    for a in rows:
        dominated = any(
            b.qty >= a.qty and b.price <= a.price
            and (b.qty > a.qty or b.price < a.price)
            for b in rows
        )
        if not dominated:
            want.add(a.id)
    assert got == want


def test_skyline_keeps_coordinate_ties(spark):
    df = spark.createDataFrame(
        [Row(id=1, q=5, p=1), Row(id=2, q=5, p=1), Row(id=3, q=4, p=2)]
    )
    got = {r.id for r in fr.skyline_max_min(df, "id", "q", "p").collect()}
    assert got == {1, 2}


# ---------------------------------------------------------------- cusum


def test_cusum_finds_planted_mean_shift(spark):
    # 20 points at 1.00 then 20 points at 5.00 -> |S| peaks exactly at
    # the shift boundary (position 20)
    rows = [
        Row(event_type="a", ts=_ts(1, 0) + datetime.timedelta(minutes=i),
            event_id=i, value=1.0 if i < 20 else 5.0)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    out = ts_.cusum_changepoint(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r.cp_index == 20
    assert r.n == 40
    # D_20 = n*cs_20 - 20*s = 40*2000 - 20*12000 = -160000
    # cusum = -160000 / (40*100) = -40.0
    assert r.cusum == -40.0


def test_cusum_tie_breaks_to_earliest(spark):
    # constant series: every D_i = 0 -> earliest position wins
    rows = [
        Row(event_type="c", ts=_ts(1) + datetime.timedelta(minutes=i),
            event_id=i, value=2.0)
        for i in range(5)
    ]
    out = ts_.cusum_changepoint(spark.createDataFrame(rows)).collect()
    assert out[0].cp_index == 1 and out[0].cusum == 0.0


# -------------------------------------------------------- cosine pairs


def test_cosine_pairs_exact_vs_naive(spark):
    import math
    from collections import Counter

    texts = [
        "a a b c",
        "a a b d",        # high cosine with 0
        "x y z w q",
        "a a a a b b c",  # same direction-ish as 0
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        (r.id_a, r.id_b): (r.dot, r.cosine)
        for r in sj.cosine_pairs(docs, threshold=0.7, k=1).collect()
    }
    want = {}
    vecs = [Counter(t.lower().split()) for t in texts]
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = vecs[i], vecs[j]
            dot = sum(a[t] * b[t] for t in a)
            na = sum(v * v for v in a.values())
            nb = sum(v * v for v in b.values())
            cos = dot / math.sqrt(na * nb)
            if cos >= 0.7:
                want[(i, j)] = dot
    assert {k: v[0] for k, v in got.items()} == want
    for (i, j), (dot, cos) in got.items():
        a, b = vecs[i], vecs[j]
        na = sum(v * v for v in a.values())
        nb = sum(v * v for v in b.values())
        assert cos == round(dot / math.sqrt(na * nb), 6)


def test_cosine_pairs_shingle_terms(spark):
    import math
    from collections import Counter

    texts = [
        "w1 w2 w3 w4 w5 w6 w7 w8",
        "w1 w2 w3 w4 w5 w6 w7 w9",   # shares 5 of 6 shingles
        "a b c d e f g h",
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in sj.cosine_pairs(docs, threshold=0.5, k=3).collect()
    }

    def shingle_vec(t):
        toks = t.lower().split()
        return Counter(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        )

    a, b = shingle_vec(texts[0]), shingle_vec(texts[1])
    dot = sum(a[s] * b[s] for s in a)
    na = sum(v * v for v in a.values())
    nb = sum(v * v for v in b.values())
    assert got == {(0, 1): round(dot / math.sqrt(na * nb), 6)}


# ------------------------------------------------------------ winnowing


def test_winnow_shared_substring_guarantee(spark):
    # docs share a substring of length k + w - 1 = 27 -> must share >= 1
    # fingerprint (the winnowing guarantee)
    shared = "SHAREDSUBSTRINGABCDEFGHIJKL"  # 27 chars
    assert len(shared) == 27
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="prefix-000 " + shared + " suffix-000"),
            Row(doc_id=1, text="other-111 " + shared + " tail-111"),
        ]
    )
    fps = sj.winnow_fingerprints(docs, k=20, w=8)
    a = {r.fp for r in fps.where(F.col("doc_id") == 0).collect()}
    b = {r.fp for r in fps.where(F.col("doc_id") == 1).collect()}
    assert a & b


def test_winnow_density(spark):
    # selections must appear at least once per window of w consecutive
    # gram positions (coverage property of winnowing)
    import random

    rng = random.Random(3)
    text = "".join(rng.choice("abcdefgh") for _ in range(400))
    docs = spark.createDataFrame([Row(doc_id=0, text=text)])
    rows = sj.winnow_fingerprints(docs, k=20, w=8).collect()
    positions = sorted(r.pos for r in rows)
    n_grams = len(text) - 19
    assert positions[0] <= 8
    for p, q in zip(positions, positions[1:]):
        assert q - p <= 8, (p, q)
    assert positions[-1] >= n_grams - 8


# -------------------------------------------------------------- entropy


def test_categorical_entropy_matches_math(spark):
    import math

    from imposm3_spark.datapipe import stats as st

    rows = (
        [Row(u=1, c="a")] * 3 + [Row(u=1, c="b")] * 1
        + [Row(u=2, c="a")] * 4          # pure -> H = 0
        + [Row(u=3, c="a"), Row(u=3, c="b"), Row(u=3, c="c"), Row(u=3, c="d")]
    )
    df = spark.createDataFrame(rows)
    got = {
        r.u: (r.n, r.entropy)
        for r in st.categorical_entropy(df, "u", "c", ["a", "b", "c", "d"]).collect()
    }
    def h(counts):
        n = sum(counts)
        return round(math.log(n) - sum(c * math.log(c) for c in counts if c) / n, 6)
    assert got[1] == (4, h([3, 1]))
    assert got[2] == (4, 0.0)
    assert got[3] == (4, round(math.log(4), 6))


# ------------------------------------------------------------- autocorr


def test_autocorr_perfect_alternation(spark):
    # series 10, 20, 10, 20, ... -> lag-1 r = -1
    rows = [
        Row(event_type="a", ts=_ts(1, 0) + datetime.timedelta(hours=i),
            event_id=i, value=10.0 if i % 2 == 0 else 20.0)
        for i in range(24)
    ]
    out = ts_.hourly_lag_autocorr(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    assert out[0].r == -1.0 and out[0].n == 23


def test_autocorr_drops_constant_series(spark):
    rows = [
        Row(event_type="c", ts=_ts(1, 0) + datetime.timedelta(hours=i),
            event_id=i, value=5.0)
        for i in range(10)
    ]
    assert ts_.hourly_lag_autocorr(spark.createDataFrame(rows)).count() == 0


def test_cosine_pairs_threshold_ratio_matches_float(spark):
    """The exact-integer threshold path (p/q) must select the same pairs
    as the float-threshold path at the same cutoff, and its (dot, nrm_a,
    nrm_b) must reproduce the float path's cosine exactly."""
    import math

    texts = [
        "a a b c",
        "a a b d",
        "x y z w q",
        "a a a a b b c",
        "a a b c",  # exact duplicate of 0: cosine 1.0 boundary
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    flo = {
        (r.id_a, r.id_b): r.cosine
        for r in sj.cosine_pairs(docs, threshold=0.7, k=1).collect()
    }
    exact = {
        (r.id_a, r.id_b): (r.dot, r.nrm_a, r.nrm_b)
        for r in sj.cosine_pairs(docs, k=1, threshold_ratio=(7, 10)).collect()
    }
    assert set(flo) == set(exact)
    for key, (dot, na, nb) in exact.items():
        assert flo[key] == round(dot / math.sqrt(na * nb), 6)
        # integer predicate itself: q^2 dot^2 >= p^2 na nb
        assert 100 * dot * dot >= 49 * na * nb


def test_cosine_pairs_threshold_ratio_validation(spark):
    import pytest

    docs = spark.createDataFrame([Row(doc_id=0, text="a b")])
    with pytest.raises(ValueError):
        sj.cosine_pairs(docs, k=1, threshold_ratio=(-1, 10))
    with pytest.raises(ValueError):
        sj.cosine_pairs(docs, k=1, threshold_ratio=(1, 0))
