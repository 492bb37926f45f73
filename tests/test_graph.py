"""Fixed-point PageRank: pure-python mirror equality, edge extraction,
and qualitative ranking sanity."""

from __future__ import annotations

import datetime as dt

from imposm3_spark.datapipe.graph import (
    SCALE,
    pagerank_fixed_point,
    transition_edges,
)


def _ref_pagerank(edges, nodes, iterations=3):
    outs = {}
    for s, d, c in edges:
        outs[s] = outs.get(s, 0) + c
    n = len(nodes)
    r = {v: SCALE // n for v in nodes}
    base = (15 * SCALE) // (100 * n)
    for _ in range(iterations):
        inc = {v: 0 for v in nodes}
        for s, d, c in edges:
            inc[d] += (85 * r[s] * c) // (100 * outs[s])
        r = {v: base + inc[v] for v in nodes}
    return r


def test_matches_reference_and_ranks_sink_highest(spark):
    nodes = ["a", "b", "c", "iso"]
    edges = [("a", "c", 3), ("b", "c", 2), ("c", "a", 1)]
    ndf = spark.createDataFrame([(v,) for v in nodes], "node string")
    edf = spark.createDataFrame(edges, "src string, dst string, cnt long")
    got = {r.node: r.r for r in pagerank_fixed_point(edf, ndf, 3).collect()}
    assert got == _ref_pagerank(edges, nodes, 3)
    # c receives all of a's and b's mass -> highest rank; iso only base
    assert got["c"] == max(got.values())
    assert got["iso"] == min(got.values())
    assert sum(got.values()) <= SCALE  # dangling mass only ever shrinks


def test_transition_edges_ordering_and_counts(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: x -> y -> x  (ordered by ts, tie broken by event_id)
        (1, t0, 1, "x", 0.0, "{}"),
        (2, t0 + dt.timedelta(seconds=1), 1, "y", 0.0, "{}"),
        (3, t0 + dt.timedelta(seconds=2), 1, "x", 0.0, "{}"),
        # user 2: x -> y  (no cross-user transition to user 1)
        (4, t0, 2, "x", 0.0, "{}"),
        (5, t0 + dt.timedelta(seconds=5), 2, "y", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    got = {(r.src, r.dst): r.cnt for r in transition_edges(df).collect()}
    assert got == {("x", "y"): 2, ("y", "x"): 1}
