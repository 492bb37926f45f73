"""Unit tests for the round-2 temporal/clustering operators:
asof_join, range_count_join (datapipe/asof.py) and
connected_components / dedup_representatives (datapipe/cluster.py).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from imposm3_spark.datapipe.asof import asof_join, range_count_join
from imposm3_spark.datapipe.cluster import connected_components, dedup_representatives


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, t=_ts("2024-01-01 10:00"), ev="a"),
            Row(k=1, t=_ts("2024-01-01 12:00"), ev="b"),
            Row(k=2, t=_ts("2024-01-01 09:00"), ev="c"),  # before any right row
            Row(k=3, t=_ts("2024-01-01 09:00"), ev="d"),  # key with no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, rt=_ts("2024-01-01 09:30"), val=10),
            Row(k=1, rt=_ts("2024-01-01 11:00"), val=20),
            Row(k=2, rt=_ts("2024-01-01 10:00"), val=30),
        ]
    )
    out = asof_join(left, right, on="k", left_time="t", right_time="rt", right_payload=["val"])
    got = {(r.k, r.ev): r.val for r in out.collect()}
    assert got == {(1, "a"): 10, (1, "b"): 20, (2, "c"): None, (3, "d"): None}


def test_asof_join_equal_ts_and_strict(spark):
    left = spark.createDataFrame([Row(k=1, t=_ts("2024-01-01 10:00"), ev="x")])
    right = spark.createDataFrame(
        [
            Row(k=1, rt=_ts("2024-01-01 09:00"), val=1),
            Row(k=1, rt=_ts("2024-01-01 10:00"), val=2),
        ]
    )
    non_strict = asof_join(
        left, right, on="k", left_time="t", right_time="rt", right_payload=["val"]
    ).collect()[0]
    assert non_strict.val == 2  # t == rt counts
    strict = asof_join(
        left, right, on="k", left_time="t", right_time="rt", right_payload=["val"], strict=True
    ).collect()[0]
    assert strict.val == 1  # strictly before only


def test_asof_join_plan_has_single_shuffle(spark):
    left = spark.range(100).select(
        (F.col("id") % 10).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("t"),
    )
    right = spark.range(20).select(
        (F.col("id") % 10).alias("k"),
        F.timestamp_seconds(F.col("id") * 300).alias("rt"),
        F.col("id").alias("val"),
    )
    out = asof_join(left, right, on="k", left_time="t", right_time="rt", right_payload=["val"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union-merge: exactly one exchange (on the key), not a join blow-up
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_range_count_join(spark):
    left = spark.createDataFrame(
        [Row(k=1, start=_ts("2024-01-01 00:00")), Row(k=2, start=_ts("2024-01-01 00:00"))]
    )
    right = spark.createDataFrame(
        [
            Row(rk=1, rt=_ts("2024-01-01 00:30")),
            Row(rk=1, rt=_ts("2024-01-01 01:30")),  # outside [start, start+1h)
            Row(rk=1, rt=_ts("2023-12-31 23:59")),  # before
        ]
    )
    out = range_count_join(
        left,
        right,
        on_left="k",
        on_right="rk",
        right_time="rt",
        lo=F.col("start"),
        hi=F.col("start") + F.expr("INTERVAL 1 HOUR"),
    )
    got = {r.k: r.n_in_range for r in out.collect()}
    assert got == {1: 1, 2: 0}  # left row with no match kept at 0


def test_connected_components_chain_and_singleton(spark):
    nodes = spark.createDataFrame([Row(id=i) for i in range(7)])
    # chain 0-1-2-3 (diameter > 1 forces multiple propagation rounds),
    # pair 5-6, singleton 4
    edges = spark.createDataFrame(
        [Row(src=1, dst=0), Row(src=1, dst=2), Row(src=2, dst=3), Row(src=6, dst=5)]
    )
    comp = {r.id: r.component for r in connected_components(nodes, edges).collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5}


def test_dedup_representatives(spark):
    df = spark.createDataFrame([Row(doc_id=i, text=f"t{i}") for i in range(5)])
    pairs = spark.createDataFrame([Row(a_id=0, b_id=3), Row(a_id=3, b_id=4)])
    kept = sorted(r.doc_id for r in dedup_representatives(df, pairs, "doc_id").collect())
    assert kept == [0, 1, 2]  # 3,4 collapse into representative 0


def test_dedup_representatives_keeps_null_ids(spark):
    """NULL-id rows are degenerate singletons: the anti join keeps them
    (documented divergence from the round-2 semi-join formulation, which
    dropped them — see dedup_representatives docstring)."""
    df = spark.createDataFrame(
        [Row(doc_id=0, text="a"), Row(doc_id=1, text="b"), Row(doc_id=None, text="n")],
        "doc_id bigint, text string",
    )
    pairs = spark.createDataFrame([Row(a_id=0, b_id=1)])
    kept = dedup_representatives(df, pairs, "doc_id").collect()
    assert sorted((r.doc_id, r.text) for r in kept if r.doc_id is not None) == [(0, "a")]
    assert [r.text for r in kept if r.doc_id is None] == ["n"]


def test_connected_components_distributed_path(spark, monkeypatch):
    """Force the multi-level contraction (driver fast path disabled) and
    check it labels a long chain + ring + singletons exactly like the
    reference reachability — the path real 100 TB pair graphs take."""
    import pandas as pd

    from imposm3_spark.datapipe import cluster as cl

    monkeypatch.setattr(cl, "_DRIVER_EDGES", 0)
    monkeypatch.setattr(cl, "_EDGES_PER_TASK", 50)  # force multi-partition UF

    # chain 0-1-...-120 (diameter >> level count kills label propagation,
    # not contraction), a 4-ring, and 10 singletons
    chain = [(i, i + 1) for i in range(120)]
    ring = [(200, 201), (201, 202), (202, 203), (203, 200)]
    edges = spark.createDataFrame(
        pd.DataFrame(chain + ring, columns=["src", "dst"])
    )
    nodes = spark.createDataFrame(
        pd.DataFrame({"id": list(range(121)) + [200, 201, 202, 203] + list(range(300, 310))})
    )
    out = {r.id: r.component for r in cl.connected_components(nodes, edges).collect()}
    assert all(out[i] == 0 for i in range(121))
    assert all(out[i] == 200 for i in (200, 201, 202, 203))
    assert all(out[i] == i for i in range(300, 310))
    assert len(out) == 121 + 4 + 10
