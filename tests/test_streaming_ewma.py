"""Streaming EWMA: state spans micro-batches and the stream output is
bit-identical to the batch operator on an in-order stream."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from imposm3_spark.datapipe.streaming_ewma import streaming_ewma
from imposm3_spark.datapipe.timeseries import ewma_fixed_point

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
        streaming_ewma(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive
    return spark.read.parquet(str(out))


def test_stream_matches_batch_across_microbatches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    b1 = _rows(0, [(1, 4.0), (1, 8.0), (2, 2.0)])
    # later micro-batch: the recursion seed must come from checkpointed state
    b2 = _rows(100, [(1, 1.0), (2, 6.0), (3, 9.0)])
    spark.createDataFrame(b1, SCHEMA).write.parquet(str(src / "b1"))
    got1 = _drain(spark, src / "b1", tmp_path / "ck", tmp_path / "out")
    assert {r.id: r.ewma for r in got1.collect()} == {0: 4.0, 1: 5.0, 2: 2.0}

    import shutil

    staging = tmp_path / "staging"
    spark.createDataFrame(b2, SCHEMA).write.parquet(str(staging))
    for i, f in enumerate(sorted(staging.glob("part-*.parquet"))):
        shutil.move(str(f), str(src / "b1" / f"late-{i}.parquet"))
    got2 = _drain(spark, src / "b1", tmp_path / "ck", tmp_path / "out")
    stream_out = {r.id: r.ewma for r in got2.collect()}

    # batch operator over the full in-order history must agree exactly
    all_rows = spark.createDataFrame(b1 + b2, SCHEMA).withColumn(
        "props", F.lit("{}")
    )
    batch_out = {
        r.id: r.ewma for r in ewma_fixed_point(all_rows).collect()
    }
    assert stream_out == batch_out
    # spot-check the recursion: user1 e3 = (3*500 + 100)//4 = 400 cents
    assert stream_out[100] == 4.0
