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
