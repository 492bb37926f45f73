"""Streaming Misra-Gries: the bounded summary survives the checkpoint
across micro-batches and replays the sequential reference exactly."""

from __future__ import annotations

import shutil
from collections import Counter
from datetime import datetime, timedelta

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from imposm3_spark.datapipe.streaming_mg import mg_reference, streaming_mg_heavy

SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("event_type", StringType(), False),
        StructField("user_id", LongType(), False),
    ]
)


def _rows(start_id, specs):
    t0 = datetime(2001, 1, 1)
    return [
        (start_id + i, t0 + timedelta(minutes=start_id + i), k, u)
        for i, (k, u) in enumerate(specs)
    ]


def _drain(spark, src, ckpt, out, k=3):
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        streaming_mg_heavy(stream, k=k)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive
    return spark.read.parquet(str(out))


def test_summary_state_spans_batches_and_matches_reference(spark, tmp_path):
    heavy = [("a", 7)] * 6
    noise1 = [("a", u) for u in (1, 2, 3, 4)]
    noise2 = [("a", u) for u in (5, 6, 7, 7, 8, 9)]
    b1 = _rows(0, heavy[:3] + noise1)
    b2 = _rows(100, noise2 + heavy[3:])
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(b1, SCHEMA).write.parquet(str(src / "b1"))
    _drain(spark, src / "b1", tmp_path / "ck", tmp_path / "out")

    staging = tmp_path / "staging"
    spark.createDataFrame(b2, SCHEMA).write.parquet(str(staging))
    for i, f in enumerate(sorted(staging.glob("part-*.parquet"))):
        shutil.move(str(f), str(src / "b1" / f"late-{i}.parquet"))
    got = _drain(spark, src / "b1", tmp_path / "ck", tmp_path / "out")

    # latest snapshot per key = rows with the max snapshot_id
    rows = got.collect()
    last = max(r.snapshot_id for r in rows)
    final = {r.item: r.est_lower for r in rows if r.snapshot_id == last}

    # the full in-order item stream (batch order == id order here)
    all_items = [str(u) for _, _, _, u in b1 + b2]
    assert final == {k: v for k, v in mg_reference(all_items, 3).items()}

    # MG guarantees vs exact counts: est <= exact <= est + N/(k+1)
    exact = Counter(all_items)
    n = len(all_items)
    for it, est in final.items():
        assert est <= exact[it] <= est + n // 4
    # the genuinely heavy item (> N/(k+1) = 25%) must be tracked
    assert "7" in final


def test_empty_summary_is_observable(spark, tmp_path):
    """A batch whose decrements empty the summary must emit a null-item
    snapshot — otherwise the consumer stays stuck on the stale one —
    and snapshot ids stay monotone even when late event_ids are small."""
    # k=3: batch1 gives {1:1, 2:1, 3:1}; batch2's single new item 4
    # (with a SMALLER event_id) decrements everything away.
    b1 = _rows(100, [("a", 1), ("a", 2), ("a", 3)])
    b2 = _rows(0, [("a", 4)])
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(b1, SCHEMA).write.parquet(str(src / "b1"))
    got1 = _drain(spark, src / "b1", tmp_path / "ck", tmp_path / "out")
    snap1 = max(r.snapshot_id for r in got1.collect())

    staging = tmp_path / "staging"
    spark.createDataFrame(b2, SCHEMA).write.parquet(str(staging))
    for i, f in enumerate(sorted(staging.glob("part-*.parquet"))):
        shutil.move(str(f), str(src / "b1" / f"late-{i}.parquet"))
    got2 = _drain(spark, src / "b1", tmp_path / "ck", tmp_path / "out")
    rows = got2.collect()
    snap2 = max(r.snapshot_id for r in rows)
    assert snap2 > snap1  # monotone despite smaller event ids in batch 2
    final = [(r.item, r.est_lower) for r in rows if r.snapshot_id == snap2]
    assert final == [(None, 0)]  # the shrink to empty is visible
