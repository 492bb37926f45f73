"""Round-4 batch 1: two-feature OLS vs numpy lstsq, path mining and
attribution semantics, cadence regularity, and CDC chunking properties
(reassembly + content-shift alignment)."""

from __future__ import annotations

import datetime as dt

import numpy as np

from imposm3_spark.datapipe.chunking import cdc_chunks, cdc_shared_chunks
from imposm3_spark.datapipe.mining import last_touch_attribution, top_paths
from imposm3_spark.datapipe.stats import cadence_stats, group_ols2

T0 = dt.datetime(2001, 3, 1, 0, 0, 0)


def _ev(rows):
    """rows: (event_id, user_id, event_type, value, minutes_offset)"""
    return [
        (eid, T0 + dt.timedelta(minutes=m), uid, et, v, "{}")
        for (eid, uid, et, v, m) in rows
    ]


EV_SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"


def test_ols2_matches_numpy(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(400):
        minutes = int(rng.integers(0, 60 * 24 * 90))
        value = round(float(rng.uniform(1, 500)), 2)
        rows.append((i, 1, "click", value, minutes))
    df = spark.createDataFrame(_ev(rows), EV_SCHEMA)
    got = group_ols2(df, key_col="event_type").collect()
    assert len(got) == 1
    r = got[0]
    # numpy reference on the identical integer features
    y = np.array([round(v * 100) for (_, _, _, v, _) in rows], dtype=float)
    ts = [T0 + dt.timedelta(minutes=m) for (_, _, _, _, m) in rows]
    x1 = np.array([t.hour for t in ts], dtype=float)
    x2 = np.array([(t.date() - dt.date(2001, 1, 1)).days for t in ts], dtype=float)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert abs(r.b0_cents - beta[0]) < 1e-3 * max(1.0, abs(beta[0]))
    assert abs(r.b1_cents_per_hour - beta[1]) < 1e-3 * max(1.0, abs(beta[1]))
    assert abs(r.b2_cents_per_day - beta[2]) < 1e-3 * max(1.0, abs(beta[2]))


def test_ols2_singular_key_drops(spark):
    # all events in the same hour AND same day -> columns collinear
    rows = [(i, 1, "flat", 10.0, i) for i in range(5)]  # 5 events, minutes 0-4
    df = spark.createDataFrame(_ev(rows), EV_SCHEMA)
    assert group_ols2(df, key_col="event_type").count() == 0


def test_top_paths_counts_and_depth_filter(spark):
    rows = [
        # user 1: a > b > c (plus a 4th event that must not matter)
        (1, 1, "a", 1.0, 0), (2, 1, "b", 1.0, 1), (3, 1, "c", 1.0, 2), (4, 1, "z", 1.0, 3),
        # user 2: same journey
        (5, 2, "a", 1.0, 0), (6, 2, "b", 1.0, 1), (7, 2, "c", 1.0, 2),
        # user 3: different journey
        (8, 3, "b", 1.0, 0), (9, 3, "a", 1.0, 1), (10, 3, "c", 1.0, 2),
        # user 4: only 2 events -> skipped
        (11, 4, "a", 1.0, 0), (12, 4, "b", 1.0, 1),
    ]
    df = spark.createDataFrame(_ev(rows), EV_SCHEMA)
    got = {r.path: r.n_users for r in top_paths(df).collect()}
    assert got == {"a>b>c": 2, "b>a>c": 1}


def test_top_paths_tie_break_on_timestamp_collision(spark):
    # two events at the identical timestamp order by event_id
    rows = [(1, 1, "x", 1.0, 0), (2, 1, "y", 1.0, 0), (3, 1, "z", 1.0, 1)]
    df = spark.createDataFrame(_ev(rows), EV_SCHEMA)
    assert top_paths(df).collect()[0].path == "x>y>z"


def test_attribution_channels(spark):
    rows = [
        # user 1: click then purchase -> click channel
        (1, 1, "click", 0.0, 0), (2, 1, "purchase", 10.0, 5),
        # user 2: purchase with no prior event -> (none)
        (3, 2, "purchase", 7.5, 0),
        # user 2: view then ANOTHER purchase -> view (prior purchase skipped)
        (4, 2, "view", 0.0, 1), (5, 2, "purchase", 2.5, 2),
        # user 3: view then click then purchase -> click (most recent wins)
        (6, 3, "view", 0.0, 0), (7, 3, "click", 0.0, 1), (8, 3, "purchase", 1.0, 2),
    ]
    df = spark.createDataFrame(_ev(rows), EV_SCHEMA)
    got = {r.channel: (r.conversions, r.revenue) for r in last_touch_attribution(df).collect()}
    assert got == {
        "click": (2, 11.0),
        "(none)": (1, 7.5),
        "view": (1, 2.5),
    }


def test_cadence_regular_vs_bursty(spark):
    rows = []
    # user 1: perfectly regular 60s cadence -> cv = 0
    for i in range(12):
        rows.append((i, 1, "click", 1.0, i))
    # user 2: bursty gaps
    offs = [0, 1, 2, 3, 60, 61, 62, 300, 301, 302, 900, 901]
    for i, m in enumerate(offs):
        rows.append((100 + i, 2, "click", 1.0, m))
    df = spark.createDataFrame(_ev(rows), EV_SCHEMA)
    got = {r.user_id: r for r in cadence_stats(df).collect()}
    assert got[1].cv == 0.0 and got[1].is_regular
    assert got[1].median_gap_s == 60.0
    assert got[2].cv > 0.5 and not got[2].is_regular


def test_cadence_min_gaps(spark):
    rows = [(i, 1, "click", 1.0, i) for i in range(5)]  # 4 gaps < 8
    df = spark.createDataFrame(_ev(rows), EV_SCHEMA)
    assert cadence_stats(df).count() == 0


def _doc_df(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_cdc_chunks_reassemble(spark):
    texts = [
        "The quick brown fox jumps over the lazy dog. " * 8,
        "Lorem ipsum dolor sit amet, consectetur adipiscing elit sed do.",
        "short",
    ]
    df = _doc_df(spark, texts)
    rows = cdc_chunks(df).orderBy("doc_id", "chunk_idx").collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, text in enumerate(texts):
        chunks = by_doc[i]
        # spans tile the document exactly: starts chain and lengths sum
        pos = 1
        for c in chunks:
            assert c.start == pos
            pos += c.chunk_len
        assert pos - 1 == len(text)
        # hashes match the actual substrings
        import hashlib

        for c in chunks:
            seg = text[c.start - 1 : c.start - 1 + c.chunk_len]
            assert hashlib.md5(seg.encode()).hexdigest() == c.chunk_hash


def test_cdc_shift_invariance(spark):
    """The CDC property: prepending a prefix changes only chunks up to the
    first content-defined boundary — all later chunk hashes are shared."""
    base = ("A quite long synthetic paragraph about content defined chunking. " * 20)
    shifted = "PREFIX-INSERTED-TEXT! " + base
    df = _doc_df(spark, [base, shifted])
    rows = cdc_chunks(df).collect()
    h0 = {r.chunk_hash for r in rows if r.doc_id == 0}
    h1 = {r.chunk_hash for r in rows if r.doc_id == 1}
    shared = h0 & h1
    # all but the first chunk of each doc re-align
    assert len(shared) >= len(h0) - 1 >= 1


def test_cdc_shared_chunks_threshold(spark):
    common = "a shared boilerplate paragraph that is long enough to chunk. " * 10
    df = _doc_df(spark, [common + "tail one", common + "completely different end", "unrelated"])
    rep = cdc_shared_chunks(df).collect()
    assert len(rep) >= 1
    assert all(r.n_docs >= 2 for r in rep)
