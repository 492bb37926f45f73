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


def _drain_sessions(spark, src_dir, ckpt_dir, out_dir):
    from imposm3_spark.streaming.windowed import session_windowed_counts

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(src_dir))
    q = (
        session_windowed_counts(stream, gap="30 minutes", watermark_delay="1 hour")
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt_dir))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive
    return spark.read.parquet(str(out_dir))


def test_session_windows_merge_and_finalize(spark, tmp_path):
    src = tmp_path / "ssrc"
    ckpt = tmp_path / "sckpt"
    out = tmp_path / "sout"
    src.mkdir()

    # one key: 09:00 + 09:20 chain into one session (gap 30m); 09:20+30m
    # = 09:50 end. 11:10 starts a separate session.
    _write_batch(
        spark,
        src,
        [
            (_t(9, 0), "click", 1.0, 1),
            (_t(9, 20), "click", 2.0, 2),
            (_t(11, 10), "click", 4.0, 3),
        ],
    )
    _drain_sessions(spark, src, ckpt, out)

    # push the watermark far ahead so every session above finalizes
    _write_batch(spark, src, [(_t(15, 0), "view", 0.0, 4)])
    got = _drain_sessions(spark, src, ckpt, out)

    rows = {
        (r["session_start"], r["session_end"]): (r["n"], r["total_value"])
        for r in got.filter(got.event_type == "click").collect()
    }
    assert rows == {
        (_t(9, 0), _t(9, 50)): (2, 3.0),   # merged session: two events
        (_t(11, 10), _t(11, 40)): (1, 4.0),
    }


def test_session_extends_across_batches(spark, tmp_path):
    src = tmp_path / "xsrc"
    ckpt = tmp_path / "xckpt"
    out = tmp_path / "xout"
    src.mkdir()

    _write_batch(spark, src, [(_t(9, 0), "click", 1.0, 1)])
    _drain_sessions(spark, src, ckpt, out)
    # second batch extends the same session (09:25 < 09:00+30m)
    _write_batch(spark, src, [(_t(9, 25), "click", 1.0, 2)])
    _drain_sessions(spark, src, ckpt, out)
    # finalize
    _write_batch(spark, src, [(_t(15, 0), "view", 0.0, 3)])
    got = _drain_sessions(spark, src, ckpt, out)

    clicks = got.filter(got.event_type == "click").collect()
    assert len(clicks) == 1
    assert clicks[0]["session_start"] == _t(9, 0)
    assert clicks[0]["session_end"] == _t(9, 55)
    assert clicks[0]["n"] == 2
