"""Streaming last-touch attribution: touch state survives micro-batch
boundaries and the attributed stream matches the batch operator on an
in-order stream."""

from __future__ import annotations

import shutil
from datetime import datetime, timedelta

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from imposm3_spark.datapipe.mining import last_touch_attribution
from imposm3_spark.datapipe.streaming_attribution import streaming_attribution

SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), False),
    ]
)


def _rows(start_id, specs):
    t0 = datetime(2001, 1, 1)
    return [
        (start_id + i, t0 + timedelta(minutes=start_id + i), u, et, v)
        for i, (u, et, v) in enumerate(specs)
    ]


def _drain(spark, src, ckpt, out):
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        streaming_attribution(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive
    return spark.read.parquet(str(out))


def test_attribution_state_spans_microbatches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    b1 = _rows(0, [(1, "click", 0.0), (1, "purchase", 10.0), (2, "view", 0.0)])
    spark.createDataFrame(b1, SCHEMA).write.parquet(str(src / "b1"))
    got1 = _drain(spark, src / "b1", tmp_path / "ck", tmp_path / "out")
    assert {r.event_id: (r.channel, r.revenue) for r in got1.collect()} == {
        1: ("click", 10.0)
    }

    # batch 2: user 2's purchase must credit the 'view' from batch 1
    # (state crossed the micro-batch boundary); user 3 converts cold
    b2 = _rows(100, [(2, "purchase", 5.5), (3, "purchase", 1.0)])
    staging = tmp_path / "staging"
    spark.createDataFrame(b2, SCHEMA).write.parquet(str(staging))
    for i, f in enumerate(sorted(staging.glob("part-*.parquet"))):
        shutil.move(str(f), str(src / "b1" / f"late-{i}.parquet"))
    got2 = _drain(spark, src / "b1", tmp_path / "ck", tmp_path / "out")
    out = {r.event_id: (r.channel, r.revenue) for r in got2.collect()}
    assert out[100] == ("view", 5.5)
    assert out[101] == ("(none)", 1.0)


def test_stream_matches_batch_on_in_order_stream(spark, tmp_path):
    specs = [
        (1, "click", 0.0), (1, "purchase", 3.0), (1, "view", 0.0),
        (1, "purchase", 4.0), (2, "purchase", 7.0), (2, "signup", 0.0),
        (2, "purchase", 2.0), (3, "error", 0.0), (3, "purchase", 9.0),
    ]
    rows = _rows(0, specs)
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(rows, SCHEMA).write.parquet(str(src / "b"))
    stream_out = _drain(spark, src / "b", tmp_path / "ck", tmp_path / "out")
    per_conv = {r.event_id: r.channel for r in stream_out.collect()}

    batch_df = spark.createDataFrame(
        [(eid, ts, u, et, v, "{}") for (eid, ts, u, et, v) in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    batch = {
        r.channel: (r.conversions, r.revenue)
        for r in last_touch_attribution(batch_df).collect()
    }
    # aggregate the stream rows to the batch rollup shape
    agg: dict[str, list] = {}
    for r in stream_out.collect():
        c = agg.setdefault(r.channel, [0, 0.0])
        c[0] += 1
        c[1] += r.revenue
    assert {k: (v[0], round(v[1], 2)) for k, v in agg.items()} == batch
    assert per_conv[1] == "click" and per_conv[3] == "view"
    assert per_conv[4] == "(none)" and per_conv[6] == "signup"
    assert per_conv[8] == "error"
