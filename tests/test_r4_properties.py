"""Property-based tests for round-4 operators: Holt recursion vs a
pure-python mirror, Misra-Gries guarantees under random data AND random
partitioning, CDC chunk reassembly, and containment-join equality with
the naive quadratic reference."""

from __future__ import annotations

import datetime as dt
import hashlib
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st_

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

EV_SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
T0 = dt.datetime(2001, 1, 1)


def _holt_ref(series):
    out = []
    lvl = trend = 0
    first = True
    for c in series:
        if first:
            lvl, trend, first = c, 0, False
        else:
            prev = lvl
            lvl = (c + 3 * (lvl + trend)) // 4
            trend = ((lvl - prev) + trend) // 2
        out.append((lvl, trend))
    return out


@given(
    series=st_.lists(
        st_.lists(st_.integers(min_value=0, max_value=50_000), min_size=1, max_size=25),
        min_size=1,
        max_size=3,
    )
)
@settings(**SETTINGS)
def test_holt_matches_reference(spark, series):
    from imposm3_spark.datapipe.timeseries import holt_fixed_point

    rows = []
    eid = 0
    for uid, s in enumerate(series):
        for i, c in enumerate(s):
            rows.append((eid, T0 + dt.timedelta(minutes=i), uid, "x", c / 100.0, "{}"))
            eid += 1
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {r.id: (r.level_cents, r.trend_cents) for r in holt_fixed_point(df).collect()}
    expect = {}
    eid = 0
    for s in series:
        for lv, b in _holt_ref(s):
            expect[eid] = (lv, b)
            eid += 1
    assert got == expect


@given(
    keys=st_.lists(st_.integers(min_value=0, max_value=12), min_size=1, max_size=120),
    nparts=st_.integers(min_value=1, max_value=6),
    k=st_.integers(min_value=2, max_value=5),
)
@settings(**SETTINGS)
def test_misra_gries_guarantees(spark, keys, nparts, k):
    from imposm3_spark.datapipe.stats import misra_gries_summary

    df = spark.createDataFrame([(f"k{v}",) for v in keys], "k string").repartition(nparts)
    rows = misra_gries_summary(df, "k", k=k).collect()
    E = sum(r.err for r in rows)
    merged: dict[str, int] = {}
    for r in rows:
        if r.k is not None:
            merged[r.k] = merged.get(r.k, 0) + r.c
    exact = Counter(f"k{v}" for v in keys)
    n = len(keys)
    # bound: est_lower <= true <= est_lower + E for every surviving key
    for key, est in merged.items():
        assert est <= exact[key] <= est + E
    # guarantee: every key with true > N/(k+1) is present
    for key, true in exact.items():
        if true * (k + 1) > n:
            assert key in merged, f"{key} (count {true}) missing, N={n}, k={k}, E={E}"


@given(
    texts=st_.lists(
        st_.text(
            alphabet=st_.sampled_from("ab cd"), min_size=0, max_size=200
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(**SETTINGS)
def test_cdc_chunks_tile_and_hash(spark, texts):
    from imposm3_spark.datapipe.chunking import cdc_chunks

    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = cdc_chunks(df).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts):
        chunks = sorted(by_doc.get(i, []), key=lambda r: r.chunk_idx)
        if not t:
            assert chunks == []
            continue
        pos = 1
        for c in chunks:
            assert c.start == pos
            seg = t[c.start - 1 : c.start - 1 + c.chunk_len]
            assert hashlib.md5(seg.encode()).hexdigest() == c.chunk_hash
            pos += c.chunk_len
        assert pos - 1 == len(t)


@given(
    docs=st_.lists(
        st_.lists(
            st_.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=5,
    ),
    threshold=st_.sampled_from([0.5, 0.7, 0.9]),
)
@settings(**SETTINGS)
def test_containment_equals_naive(spark, docs, threshold):
    from imposm3_spark.datapipe.simjoin import containment_pairs

    texts = [" ".join(toks) for toks in docs]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        (r.id_a, r.id_b): (r.inter, r.na)
        for r in containment_pairs(df, threshold=threshold, k=2).collect()
    }

    def shingles(toks, k=2):
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    expect = {}
    for a in range(len(docs)):
        for b in range(len(docs)):
            if a == b:
                continue
            sa, sb = shingles(docs[a]), shingles(docs[b])
            if not sa:
                continue
            inter = len(sa & sb)
            if inter / len(sa) >= threshold:
                expect[(a, b)] = (inter, len(sa))
    assert got == expect
