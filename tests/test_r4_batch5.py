"""Round-4 batch 5/6: sequential-pattern support semantics, distinctive
terms vs a python mirror, and the profiling card."""

from __future__ import annotations

import datetime as dt
import math

from imposm3_spark.datapipe.mining import sequence_pair_support
from imposm3_spark.datapipe.text import distinctive_terms
from imposm3_spark.datapipe.validate import profile

EV_SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
T0 = dt.datetime(2001, 3, 1)


def _ev(rows):
    return [
        (eid, T0 + dt.timedelta(hours=h), uid, et, 1.0, "{}")
        for (eid, uid, et, h) in rows
    ]


def test_seq_pairs_before_semantics(spark):
    rows = [
        # user 1: a@0, b@1 -> supports (a,b) but NOT (b,a)
        (1, 1, "a", 0), (2, 1, "b", 1),
        # user 2: b@0, a@1, b@2 -> supports (a,b) AND (b,a)
        (3, 2, "b", 0), (4, 2, "a", 1), (5, 2, "b", 2),
        # user 3: only a -> supports nothing
        (6, 3, "a", 0),
    ]
    df = spark.createDataFrame(_ev(rows), EV_SCHEMA)
    got = {(r.type_a, r.type_b): (r.support, r.support_frac)
           for r in sequence_pair_support(df).collect()}
    assert got == {
        ("a", "b"): (2, round(2 / 3, 6)),
        ("b", "a"): (1, round(1 / 3, 6)),
    }


def test_distinctive_terms_surfaces_group_vocabulary(spark):
    rows = [
        (0, "common common apple apple apple", "fruit", "en", 1),
        (1, "common common apple banana", "fruit", "en", 1),
        (2, "common common rocket rocket engine", "space", "en", 1),
        (3, "common common rocket orbit", "space", "en", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    got = distinctive_terms(df, group_col="source", topn=2).collect()
    by_grp = {}
    for r in got:
        by_grp.setdefault(r.source, []).append((r.rank, r.token))
    assert by_grp["fruit"][0] == (1, "apple")
    assert by_grp["space"][0] == (1, "rocket")
    # 'common' never wins a top slot
    assert all(t != "common" for g in by_grp.values() for (_, t) in g)
    # score parity with the closed formula for the top fruit term
    r = next(x for x in got if x.source == "fruit" and x.rank == 1)
    cg, ng, ct, nt, v = 4, 9, 4, 18, 7
    expect = math.log((cg + 1) / (ng + v)) - math.log((ct - cg + 1) / (nt - ng + v))
    assert r.score == round(expect, 6)


def test_profile_card(spark):
    rows = [
        (1, 10.5, "A", dt.datetime(2001, 1, 1)),
        (2, 20.0, "B", dt.datetime(2001, 1, 3)),
        (3, None, "A", dt.datetime(2001, 1, 2)),
    ]
    df = spark.createDataFrame(rows, "k long, v double, s string, d timestamp_ntz")
    got = {r.column: r for r in profile(
        df, num_cols=["k", "v"], str_cols=["s"], date_cols=["d"]
    ).collect()}
    assert got["k"].n_rows == 3 and got["k"].n_nulls == 0
    assert got["k"].n_distinct == 3 and got["k"].min_num == 1.0 and got["k"].max_num == 3.0
    assert got["v"].n_nulls == 1 and got["v"].n_distinct == 2
    assert got["v"].min_num == 10.5 and got["v"].max_num == 20.0
    assert got["s"].min_str == "A" and got["s"].max_str == "B" and got["s"].n_distinct == 2
    # dates as day offsets vs 2000-01-01
    assert got["d"].min_num == 366.0 and got["d"].max_num == 368.0


def test_ood_flags_planted_outlier(spark):
    from imposm3_spark.datapipe.similarity import ood_scores

    rows = [(i, [1.0, 0.0, 0.0], 0) for i in range(10)]
    rows.append((99, [-5.0, 4.0, 3.0], 0))  # planted outlier, same label
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = ood_scores(df, topn=3).collect()
    assert got[0].vec_id == 99
    assert got[0].ood_dist > got[1].ood_dist * 5


def test_pmi_pairs_window_and_score(spark):
    import math

    from imposm3_spark.datapipe.text import pmi_pairs

    # 'strong pair' always adjacent; filler tokens independent
    text = "alpha beta " * 10 + "x y z w v u " * 2
    df = spark.createDataFrame(
        [(0, text, "s", "en", len(text))],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    got = pmi_pairs(df, min_count=3, topn=5).collect()
    # full python mirror: pairs within 4 tokens, unordered, min_count 3
    from collections import Counter

    toks = text.split()
    n = len(toks)
    pc: Counter = Counter()
    for i in range(n):
        for j in range(i + 1, min(i + 5, n)):
            pc[tuple(sorted((toks[i], toks[j])))] += 1
    uc = Counter(toks)
    tp = sum(pc.values())
    scored = {
        p: round(math.log((c / tp) / ((uc[p[0]] / n) * (uc[p[1]] / n))), 6)
        for p, c in pc.items()
        if c >= 3
    }
    expect = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [((r.a, r.b), r.pmi) for r in got] == expect
    # the always-adjacent pair is present with the right count
    assert ("alpha", "beta") in scored and pc[("alpha", "beta")] >= 10


def test_join_size_profile_exact(spark):
    from imposm3_spark.datapipe.stats import join_size_profile

    rows = [(k,) for k in [1] * 5 + [2] * 3 + [3] * 1]
    df = spark.createDataFrame(rows, "k long")
    got = {r.k: (r.cnt, r.pairs, r.share) for r in join_size_profile(df, "k").collect()}
    total = 25 + 9 + 1
    assert got == {
        1: (5, 25, round(25 / total, 6)),
        2: (3, 9, round(9 / total, 6)),
        3: (1, 1, round(1 / total, 6)),
    }
    # the profile equals the true self-join size
    true_size = df.alias("a").join(df.alias("b"), "k").count()
    assert sum(p for (_, p, _) in got.values()) == true_size
