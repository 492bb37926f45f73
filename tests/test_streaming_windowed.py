"""Watermarked tumbling-window aggregation: windows finalize exactly once
(append mode), too-late events are dropped by the watermark."""

from datetime import datetime

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from imposm3_spark.streaming.windowed import windowed_event_counts

EVENT_SCHEMA = StructType(
    [
        StructField("ts", TimestampType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), False),
        StructField("eid", LongType(), False),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(
        str(path)
    )


def _drain(spark, src_dir, ckpt_dir, out_dir):
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(src_dir))
    q = (
        windowed_event_counts(stream)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt_dir))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive
    return spark.read.parquet(str(out_dir))


def _t(h, m):
    return datetime(2024, 1, 1, h, m)


def test_window_finalize_and_late_drop(spark, tmp_path):
    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"
    src.mkdir()

    # batch 1: three events in 09:00-10:00, max event time 12:00
    # -> watermark after the batch = 11:00, so the 09:00 window CAN finalize
    _write_batch(
        spark,
        src,
        [
            (_t(9, 10), "click", 1.0, 1),
            (_t(9, 20), "click", 2.0, 2),
            (_t(9, 40), "view", 5.0, 3),
            (_t(12, 0), "click", 1.0, 4),  # advances the watermark
        ],
    )
    _drain(spark, src, ckpt, out)

    # batch 2: a LATE event for 09:00 (watermark is already 11:00 -> drop)
    # and a watermark pusher so 12:00's window can finalize later
    _write_batch(
        spark,
        src,
        [
            (_t(9, 50), "click", 100.0, 5),  # too late: dropped
            (_t(14, 0), "view", 1.0, 6),
        ],
    )
    got = _drain(spark, src, ckpt, out)
    nine = {
        r["event_type"]: (r["n"], r["total_value"])
        for r in got.filter("window_start = timestamp '2024-01-01 09:00:00'").collect()
    }
    # the 09:00 window finalized WITHOUT the late event
    assert nine == {"click": (2, 3.0), "view": (1, 5.0)}

    # batch 3: one more pusher finalizes 14:00's window too; the 09:00
    # window must NOT re-emit (append mode: exactly once)
    _write_batch(spark, src, [(_t(16, 0), "click", 1.0, 7)])
    got = _drain(spark, src, ckpt, out)
    assert got.filter("window_start = timestamp '2024-01-01 09:00:00'").count() == 2
    twelve = got.filter("window_start = timestamp '2024-01-01 12:00:00'").collect()
    assert len(twelve) == 1 and twelve[0]["n"] == 1
