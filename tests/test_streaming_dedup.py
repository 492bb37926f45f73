"""Stateful streaming dedup: first occurrence of each content hash wins,
across micro-batches, with state restored from the checkpoint."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from imposm3_spark.datapipe.streaming_dedup import streaming_exact_dedup

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode("append").parquet(
        str(path)
    )


def _drain(spark, src_dir, ckpt_dir, out_dir):
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(str(src_dir))
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt_dir))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive
    return spark.read.parquet(str(out_dir))


def test_first_occurrence_wins_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"
    src.mkdir()

    _write_batch(
        spark,
        src,
        [(1, "alpha"), (2, "beta"), (3, "alpha"), (4, "gamma")],
    )
    got = _drain(spark, src, ckpt, out)
    rows = {r["text"]: r["doc_id"] for r in got.collect()}
    # within-batch dedup: lowest id per hash
    assert rows == {"alpha": 1, "beta": 2, "gamma": 4}

    # batch 2: a cross-batch duplicate (alpha), a duplicate-of-duplicate
    # (beta) and a brand-new doc
    _write_batch(spark, src, [(10, "alpha"), (11, "beta"), (12, "delta")])
    got = _drain(spark, src, ckpt, out)
    rows = {r["text"]: r["doc_id"] for r in got.collect()}
    # alpha/beta suppressed by checkpointed state; delta passes
    assert rows == {"alpha": 1, "beta": 2, "gamma": 4, "delta": 12}
    assert got.count() == 4


def _drain_flags(spark, src_dir, ckpt_dir, out_dir):
    from imposm3_spark.datapipe.streaming_dedup import streaming_neardup_flags

    stream = spark.readStream.schema(DOC_SCHEMA).parquet(str(src_dir))
    q = (
        streaming_neardup_flags(stream)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt_dir))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive
    return spark.read.parquet(str(out_dir))


def test_streaming_neardup_flags_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"
    src.mkdir()

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    near = base.replace("lazy", "sleepy")  # near-dup: most shingles shared
    other = "completely different words with nothing shared at all here now"

    # batch 1: base claims its bands; near collides within the batch
    _write_batch(spark, src, [(1, base), (2, near), (3, other)])
    got = _drain_flags(spark, src, ckpt, out)
    flagged = {r["doc_id"] for r in got.collect()}
    assert flagged == {2}
    assert {r["first_doc_id"] for r in got.collect()} == {1}

    # batch 2: an exact copy of base collides via checkpointed band state;
    # a fresh doc passes clean
    _write_batch(spark, src, [(10, base), (11, "fresh unrelated content words entirely new stuff")])
    got = _drain_flags(spark, src, ckpt, out)
    flagged = {r["doc_id"] for r in got.collect()}
    assert flagged == {2, 10}
    dup10 = [r for r in got.collect() if r["doc_id"] == 10]
    assert all(r["first_doc_id"] == 1 for r in dup10)
