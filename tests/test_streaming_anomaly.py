"""Streaming rolling z-score anomalies: stateful across micro-batches and
bit-identical to the batch operator on an in-order stream."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from imposm3_spark.datapipe.stats import anomalies
from imposm3_spark.datapipe.streaming_anomaly import streaming_anomalies

SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("user_id", LongType(), False),
        StructField("value", DoubleType(), False),
    ]
)


def _rows(start_id, specs):
    t0 = datetime(2001, 1, 1)
    return [
        (start_id + i, t0 + timedelta(minutes=start_id + i), u, v)
        for i, (u, v) in enumerate(specs)
    ]


def _drain(spark, src, ckpt, out):
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        streaming_anomalies(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive
    return spark.read.parquet(str(out))


def test_stream_matches_batch_and_state_spans_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # batch 1: eight alternating baseline values for user 1 (plus noise
    # user 7) — no anomaly yet
    b1 = _rows(0, [(1, 10.0 + 0.1 * (i % 2)) for i in range(8)] + [(7, 5.0)])
    # batch 2: the spike arrives in a LATER micro-batch — the rolling
    # history must come from checkpointed state
    b2 = _rows(100, [(1, 50.0), (1, 10.0)])

    for batch in (b1, b2):
        spark.createDataFrame(batch, SCHEMA).coalesce(1).write.mode("append").parquet(
            str(src)
        )

    got = _drain(spark, src, tmp_path / "ckpt", tmp_path / "out").collect()

    # batch reference on the concatenated data
    ref = anomalies(
        spark.createDataFrame(b1 + b2, SCHEMA), min_periods=8
    ).collect()
    assert sorted((r.event_id, r.user_id, r.n, r.z) for r in got) == sorted(
        (r.event_id, r.user_id, r.n, r.z) for r in ref
    )
    assert len(got) == 1 and got[0].event_id == 100  # only the spike


def test_history_window_caps_state(spark, tmp_path):
    src = tmp_path / "src2"
    src.mkdir()
    # 30 events: only the last 20 may influence the spike's z — feed a
    # drifting series then a spike, stream vs batch must agree (both drop
    # the oldest rows from the frame)
    series = [(3, 10.0 + (i % 5) * 0.05) for i in range(30)] + [(3, 99.0)]
    spark.createDataFrame(_rows(0, series), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    got = _drain(spark, src, tmp_path / "ckpt2", tmp_path / "out2").collect()
    ref = anomalies(spark.createDataFrame(_rows(0, series), SCHEMA)).collect()
    assert sorted((r.event_id, r.n, r.z) for r in got) == sorted(
        (r.event_id, r.n, r.z) for r in ref
    )
    assert all(r.n == 20 for r in got)
