"""Streaming CUSUM: alarms fire across micro-batch boundaries, the
running statistics survive the checkpoint, and the stream replays the
sequential reference recursion bit-for-bit."""

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

from imposm3_spark.datapipe.streaming_cusum import (
    cusum_reference,
    streaming_cusum,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), False),
    ]
)


def _rows(start_id, specs):
    t0 = datetime(2001, 1, 1)
    return [
        (start_id + i, t0 + timedelta(minutes=start_id + i), k, v)
        for i, (k, v) in enumerate(specs)
    ]


def _drain(spark, src, ckpt, out):
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        streaming_cusum(stream, mu0=10.0, k=0.5, h=5.0)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive
    return spark.read.parquet(str(out))


def test_alarm_crosses_microbatch_boundary(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # level 10.0 baseline; 'a' drifts up +3/step: S+ accumulates 2.5/step,
    # so the alarm needs 3 steps — the first two land in batch 1, the
    # third in batch 2: the alarm only fires if state crossed the
    # checkpoint.
    b1 = _rows(0, [("a", 13.0), ("a", 13.0), ("b", 10.0)])
    b2 = _rows(100, [("a", 13.0), ("b", 10.0)])
    spark.createDataFrame(b1, SCHEMA).write.parquet(str(src / "b1"))
    got1 = _drain(spark, src / "b1", tmp_path / "ck", tmp_path / "out")
    assert got1.count() == 0  # S+ = 5.0 not yet > 5.0

    staging = tmp_path / "staging"
    spark.createDataFrame(b2, SCHEMA).write.parquet(str(staging))
    for i, f in enumerate(sorted(staging.glob("part-*.parquet"))):
        shutil.move(str(f), str(src / "b1" / f"late-{i}.parquet"))
    got2 = _drain(spark, src / "b1", tmp_path / "ck", tmp_path / "out")
    alarms = [(r.id, r.key, r.direction, r.stat) for r in got2.collect()]
    assert alarms == [(100, "a", "up", 7.5)]


def test_stream_replays_reference_recursion(spark, tmp_path):
    # a longer mixed series with up and down shifts and a reset in the
    # middle — the stream must equal the sequential reference exactly
    specs = [("a", v) for v in (13.0, 14.0, 12.0, 9.0, 4.0, 3.0, 3.0, 16.0, 17.0, 18.0)]
    specs += [("b", v) for v in (10.0, 10.2, 9.9, 10.1)]  # never alarms
    rows = _rows(0, specs)
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(rows, SCHEMA).write.parquet(str(src / "b1"))
    got = _drain(spark, src / "b1", tmp_path / "ck", tmp_path / "out")
    stream_alarms = sorted(
        (r.id, r.key, r.direction, r.stat) for r in got.collect()
    )

    by_key: dict[str, list[tuple[int, int]]] = {}
    for rid, _ts, k, v in rows:
        by_key.setdefault(k, []).append((rid, int(round(v * 100))))
    expect = sorted(
        (rid, k, d, s)
        for k, seq in by_key.items()
        for rid, d, s in cusum_reference(seq, 1000, 50, 500)
    )
    assert stream_alarms == expect
    assert any(d == "up" for _, _, d, _ in expect)
    assert any(d == "down" for _, _, d, _ in expect)
    assert all(k == "a" for _, k, _, _ in expect)
