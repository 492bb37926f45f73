"""Property-based tests: the distributed stats/BPE operators agree with
straightforward pure-Python references on randomized inputs.

Strategy sizes are kept small (Spark job per example is the cost), with
`max_examples` tuned so the whole module stays in tens of seconds while
still exploring boundary shapes (empty groups, constant histories,
single-token words, repeated symbols)."""

from __future__ import annotations

import datetime
import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st_

from imposm3_spark.datapipe import stats as st
from imposm3_spark.datapipe.bpe import bpe_learn

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ref_zscores(rows, window=20, min_periods=8):
    """Pure-python rolling z reference (same integer-cents math)."""
    by_user: dict[int, list[tuple]] = {}
    for i, (u, v) in enumerate(rows):
        by_user.setdefault(u, []).append((i, v))
    out = {}
    for u, evs in by_user.items():
        hist: list[int] = []
        for i, v in evs:  # already in ts order (ts == index)
            c = int(round(v * 100))
            n = len(hist)
            if n >= min_periods:
                s = sum(hist)
                ss = sum(h * h for h in hist)
                a, b = c * n - s, n * ss - s * s
                if b > 0:
                    out[i] = (n, round(a / math.sqrt(b * n / (n - 1)), 4))
            hist.append(c)
            hist = hist[-window:]
    return out


@given(
    rows=st_.lists(
        st_.tuples(
            st_.integers(min_value=1, max_value=3),
            st_.decimals(
                min_value="0.01", max_value="99.99", places=2
            ).map(float),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_rolling_zscore_matches_reference(spark, rows):
    df = spark.createDataFrame(
        [
            (i, datetime.datetime(2001, 1, 1) + datetime.timedelta(minutes=i), u, v)
            for i, (u, v) in enumerate(rows)
        ],
        "event_id bigint, ts timestamp, user_id bigint, value double",
    )
    got = {r.event_id: (r.n, r.z) for r in st.rolling_zscore(df).collect()}
    assert got == _ref_zscores(rows)


@given(
    keys=st_.lists(
        st_.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=60
    )
)
@settings(**SETTINGS)
def test_cms_bounds(spark, keys):
    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], "id bigint, key string"
    )
    exact = Counter(keys)
    out = st.count_min_estimates(df, "key", width=8, depth=2).collect()
    assert {r.key for r in out} == set(exact)
    total = len(keys)
    for r in out:
        assert r.exact == exact[r.key]
        assert r.exact <= r.est <= total  # never undercounts, cell <= N


def _ref_bpe(word_counts: Counter, num_merges: int):
    """Pure-python classic BPE reference (symbol-tuple vocab)."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((best[0], best[1], pairs[best]))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


@given(
    words=st_.lists(
        st_.text(alphabet="abc", min_size=1, max_size=5), min_size=1, max_size=15
    )
)
@settings(**SETTINGS)
def test_bpe_matches_reference(spark, words):
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id bigint, text string")
    got = [
        (r.left, r.right, r.pair_count)
        for r in bpe_learn(df, num_merges=3).collect()
    ]
    assert got == _ref_bpe(Counter(words), 3)


# ---------------------------------------------------------------------------
# round-3 batch 6-8 exact operators vs pure-python mirrors


def _ref_ewma(rows):
    """rows: list of (user, value) in order; returns {index: ewma}."""
    state: dict[int, int] = {}
    out = {}
    for i, (u, v) in enumerate(rows):
        c = int(round(v * 100))
        e = c if u not in state else (3 * state[u] + c) // 4
        state[u] = e
        out[i] = round(e / 100.0, 4)
    return out


@given(
    st_.lists(
        st_.tuples(
            st_.integers(min_value=1, max_value=3),
            st_.floats(min_value=0.0, max_value=999.99, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_ewma_matches_reference(spark, rows):
    from imposm3_spark.datapipe.timeseries import ewma_fixed_point

    t0 = datetime.datetime(2024, 1, 1)
    data = [
        (i, t0 + datetime.timedelta(seconds=i), u, "t", round(v, 2), "{}")
        for i, (u, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    got = {r.id: r.ewma for r in ewma_fixed_point(df).collect()}
    expect = _ref_ewma([(u, round(v, 2)) for u, v in rows])
    assert got == expect


def _ref_auc(pairs):
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if not pos or not neg:
        return None
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    )
    return round(wins / (len(pos) * len(neg)), 6)


@given(
    st_.lists(
        st_.tuples(
            st_.integers(min_value=0, max_value=8),  # few distinct scores: ties
            st_.integers(min_value=0, max_value=1),
        ),
        min_size=2,
        max_size=60,
    )
)
@settings(**SETTINGS)
def test_auc_matches_reference(spark, pairs):
    from imposm3_spark.datapipe.evaluation import roc_auc

    df = spark.createDataFrame(
        [(float(s), y) for s, y in pairs], "score double, pos long"
    )
    row = roc_auc(df, "score", "pos").collect()[0]
    assert row.auc == _ref_auc([(float(s), y) for s, y in pairs])


@given(
    st_.lists(
        st_.tuples(
            st_.integers(min_value=0, max_value=4),
            st_.integers(min_value=0, max_value=4),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_pagerank_matches_reference(spark, raw_edges):
    from imposm3_spark.datapipe.graph import SCALE, pagerank_fixed_point

    edges = Counter((f"n{a}", f"n{b}") for a, b in raw_edges if a != b)
    if not edges:
        return
    nodes = sorted({x for e in edges for x in e})
    edf = spark.createDataFrame(
        [(s, d, c) for (s, d), c in edges.items()], "src string, dst string, cnt long"
    )
    ndf = spark.createDataFrame([(x,) for x in nodes], "node string")
    got = {r.node: r.r for r in pagerank_fixed_point(edf, ndf, 3).collect()}

    outs: dict[str, int] = {}
    for (s, d), c in edges.items():
        outs[s] = outs.get(s, 0) + c
    n = len(nodes)
    r = {v: SCALE // n for v in nodes}
    base = (15 * SCALE) // (100 * n)
    for _ in range(3):
        inc = {v: 0 for v in nodes}
        for (s, d), c in edges.items():
            inc[d] += (85 * r[s] * c) // (100 * outs[s])
        r = {v: base + inc[v] for v in nodes}
    assert got == r
