"""Streaming time-bound funnel: stage state crosses micro-batches, the
24h deadlines hold, and the final stage matches the batch operator on an
in-order stream."""

from __future__ import annotations

import shutil
from datetime import datetime, timedelta

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from imposm3_spark.datapipe.mining import funnel_timebound
from imposm3_spark.datapipe.streaming_funnel import streaming_funnel

SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), False),
    ]
)

T0 = datetime(2001, 1, 1)


def _rows(specs):
    return [(eid, T0 + timedelta(hours=h), u, et) for (eid, u, et, h) in specs]


def _drain(spark, src, ckpt, out):
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        streaming_funnel(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive
    return spark.read.parquet(str(out))


def test_funnel_state_spans_microbatches_and_deadline(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    b1 = _rows([(1, 1, "signup", 0), (2, 1, "click", 2),
                (3, 2, "signup", 0),
                (4, 3, "click", 0)])  # user 3: click w/o signup -> nothing
    spark.createDataFrame(b1, SCHEMA).write.parquet(str(src / "b"))
    got1 = _drain(spark, src / "b", tmp_path / "ck", tmp_path / "out")
    assert {(r.user_id, r.stage) for r in got1.collect()} == {(1, 1), (1, 2), (2, 1)}

    # batch 2: user 1 purchases 3h after the click (inside window, state
    # from batch 1); user 2 clicks 30h after signup (deadline MISSED)
    b2 = _rows([(10, 1, "purchase", 5), (11, 2, "click", 30)])
    staging = tmp_path / "staging"
    spark.createDataFrame(b2, SCHEMA).write.parquet(str(staging))
    for i, f in enumerate(sorted(staging.glob("part-*.parquet"))):
        shutil.move(str(f), str(src / "b" / f"late-{i}.parquet"))
    got2 = _drain(spark, src / "b", tmp_path / "ck", tmp_path / "out")
    rows = {(r.user_id, r.stage): r for r in got2.collect()}
    assert (1, 3) in rows and rows[(1, 3)].convert_s == 5 * 3600
    assert (2, 2) not in rows


def test_stream_final_stage_matches_batch(spark, tmp_path):
    specs = [
        (1, 1, "signup", 0), (2, 1, "click", 2), (3, 1, "purchase", 3),
        (4, 2, "signup", 0), (5, 2, "click", 30), (6, 2, "purchase", 31),
        (7, 3, "click", 0), (8, 3, "signup", 1), (9, 3, "click", 5),
        (10, 4, "signup", 0), (11, 4, "purchase", 1),
    ]
    rows = _rows(specs)
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(rows, SCHEMA).write.parquet(str(src / "b"))
    out = _drain(spark, src / "b", tmp_path / "ck", tmp_path / "out")
    final = {}
    for r in out.collect():
        final[r.user_id] = max(final.get(r.user_id, 0), r.stage)

    batch_df = spark.createDataFrame(
        [(eid, ts, u, et, 1.0, "{}") for (eid, ts, u, et) in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    batch = {r.user_id: r.stage for r in funnel_timebound(batch_df).collect()}
    assert final == batch
