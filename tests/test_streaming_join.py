"""Watermarked stream-stream interval join: matches within the interval,
nothing outside it, left-outer emits unmatched rows after expiry."""

from datetime import datetime

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from imposm3_spark.streaming.join import interval_join

IMP_SCHEMA = StructType(
    [
        StructField("ts", TimestampType(), False),
        StructField("user", StringType(), False),
        StructField("imp_id", LongType(), False),
    ]
)
CLK_SCHEMA = StructType(
    [
        StructField("ts", TimestampType(), False),
        StructField("user", StringType(), False),
        StructField("clk_id", LongType(), False),
    ]
)


def _t(h, m):
    return datetime(2024, 1, 1, h, m)


def _drain(spark, imp_dir, clk_dir, ckpt, out, how="inner"):
    imps = spark.readStream.schema(IMP_SCHEMA).parquet(str(imp_dir))
    clks = spark.readStream.schema(CLK_SCHEMA).parquet(str(clk_dir))
    q = (
        interval_join(imps, clks, key="user", max_delay="30 minutes", how=how)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive
    return spark.read.parquet(str(out))


def test_interval_join_matches_within_window(spark, tmp_path):
    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir(), clk_dir.mkdir()
    spark.createDataFrame(
        [
            (_t(9, 0), "alice", 1),
            (_t(9, 0), "bob", 2),
            (_t(11, 0), "alice", 3),  # watermark pusher
        ],
        IMP_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(imp_dir))
    spark.createDataFrame(
        [
            (_t(9, 10), "alice", 100),  # within 30min of imp 1 -> match
            (_t(9, 45), "alice", 101),  # outside imp 1's interval -> no match
            (_t(8, 50), "bob", 102),  # BEFORE the impression -> no match
            (_t(11, 0), "bob", 103),  # watermark pusher
        ],
        CLK_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(clk_dir))

    out = _drain(spark, imp_dir, clk_dir, tmp_path / "ck1", tmp_path / "out1")
    pairs = {(r["l_imp_id"], r["r_clk_id"]) for r in out.collect()}
    assert pairs == {(1, 100)}


def test_interval_join_left_outer_emits_unmatched(spark, tmp_path):
    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir(), clk_dir.mkdir()
    spark.createDataFrame(
        [(_t(9, 0), "alice", 1), (_t(9, 0), "carol", 2), (_t(13, 0), "zz", 9)],
        IMP_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(imp_dir))
    spark.createDataFrame(
        [(_t(9, 5), "alice", 100), (_t(13, 0), "zz", 900)],
        CLK_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(clk_dir))

    out = _drain(
        spark, imp_dir, clk_dir, tmp_path / "ck2", tmp_path / "out2", how="leftOuter"
    )
    rows = {r["l_imp_id"]: r["r_clk_id"] for r in out.collect()}
    assert rows[1] == 100
    # carol had no click: emitted with NULL right side once her join window
    # expired (watermark passed 9:00 + 30min)
    assert 2 in rows and rows[2] is None
