"""Round-4 batch 3: Misra-Gries sketch guarantees under adversarial
partitioning, Holt fixed-point vs a pure-python mirror, and containment
join vs the naive quadratic reference."""

from __future__ import annotations

import datetime as dt
from itertools import combinations

from pyspark.sql import functions as F

from imposm3_spark.datapipe.simjoin import containment_pairs
from imposm3_spark.datapipe.stats import heavy_hitters_check, misra_gries_summary
from imposm3_spark.datapipe.timeseries import holt_fixed_point


def test_mg_exact_when_counters_fit(spark):
    # 3 distinct keys, k=4 counters -> no eviction: est == exact, E == 0
    rows = [("a",)] * 10 + [("b",)] * 5 + [("c",)] * 2
    df = spark.createDataFrame(rows, "k string").repartition(3)
    mg = misra_gries_summary(df, "k", k=4).collect()
    counts = {r.k: r.c for r in mg if r.k is not None}
    # summaries are per-partition; merged sums must equal exact counts
    merged: dict[str, int] = {}
    for r in mg:
        if r.k is not None:
            merged[r.k] = merged.get(r.k, 0) + r.c
    assert merged == {"a": 10, "b": 5, "c": 2}
    assert sum(r.err for r in mg) == 0
    assert counts  # at least one counter row


def test_mg_bounds_under_eviction(spark):
    # 10 keys vs k=3 counters forces decrements; the merged estimate must
    # stay within [exact - E, exact] for every surviving key
    rows = []
    freq = {f"k{i}": (i + 1) * 3 for i in range(10)}
    for key, n in freq.items():
        rows += [(key,)] * n
    df = spark.createDataFrame(rows, "k string").repartition(4)
    mg = misra_gries_summary(df, "k", k=3).collect()
    E = sum(r.err for r in mg)
    assert E > 0
    merged: dict[str, int] = {}
    for r in mg:
        if r.k is not None:
            merged[r.k] = merged.get(r.k, 0) + r.c
    for key, est in merged.items():
        assert est <= freq[key] <= est + E


def test_heavy_hitters_check_flags(spark):
    # key 'hot' has 60 of 100 rows; k=4 -> threshold N/5=20 -> guaranteed
    rows = [("hot",)] * 60 + [(f"c{i}",) for i in range(40)]
    df = spark.createDataFrame(rows, "k string").repartition(5)
    got = heavy_hitters_check(df, "k", k=4).collect()
    assert len(got) == 1
    r = got[0]
    assert r.k == "hot" and r.exact == 60 and r.present and r.bound_ok


def _holt_reference(series):
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


def test_holt_matches_python_mirror(spark):
    t0 = dt.datetime(2001, 1, 1)
    series = [100, 110, 120, 135, 150, 140, 100, 90, 95, 200]
    rows = [
        (i, t0 + dt.timedelta(hours=i), 7, "x", c / 100.0, "{}")
        for i, c in enumerate(series)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    got = {r.id: (r.level_cents, r.trend_cents) for r in holt_fixed_point(df).collect()}
    expect = dict(enumerate(_holt_reference(series)))
    assert got == expect


def test_holt_tracks_linear_trend(spark):
    # a perfectly linear series: the forecast l+b must converge near the
    # next value (EWMA alone would lag by a constant)
    t0 = dt.datetime(2001, 1, 1)
    series = [1000 + 100 * i for i in range(30)]
    rows = [
        (i, t0 + dt.timedelta(hours=i), 1, "x", c / 100.0, "{}")
        for i, c in enumerate(series)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    last = sorted(holt_fixed_point(df).collect(), key=lambda r: r.id)[-1]
    forecast = last.level_cents + last.trend_cents
    nxt = 1000 + 100 * 30
    assert abs(forecast - nxt) <= 110  # within ~one step of the true line


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _shingleset(text, k=3):
    toks = text.lower().split()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_containment_matches_naive_and_is_directional(spark):
    para = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [
        para,                                      # 0: the paragraph
        para + " lambda mu nu xi omicron pi rho sigma tau upsilon phi chi",  # 1: superset
        "completely different words entirely here now today",               # 2
    ]
    df = _docs(spark, texts)
    got = {(r.id_a, r.id_b): (r.inter, r.na, r.containment)
           for r in containment_pairs(df, threshold=0.8).collect()}
    expect = {}
    for a, b in combinations(range(len(texts)), 2):
        for x, y in ((a, b), (b, a)):
            sx, sy = _shingleset(texts[x]), _shingleset(texts[y])
            if not sx:
                continue
            c = len(sx & sy) / len(sx)
            if c >= 0.8:
                expect[(x, y)] = (len(sx & sy), len(sx), round(c, 6))
    assert got == expect
    # doc 0 contained in 1, but 1 NOT contained in 0 (asymmetry observed)
    assert (0, 1) in got and (1, 0) not in got


def test_containment_catches_what_jaccard_misses(spark):
    from imposm3_spark.datapipe.simjoin import ppjoin_pairs

    para = " ".join(f"w{i}" for i in range(12))
    big = para + " " + " ".join(f"z{i}" for i in range(60))
    df = _docs(spark, [para, big])
    cont = containment_pairs(df, threshold=0.9).collect()
    jac = ppjoin_pairs(df, threshold=0.5).collect()
    assert len(cont) == 1 and cont[0].id_a == 0 and cont[0].containment == 1.0
    assert len(jac) == 0
