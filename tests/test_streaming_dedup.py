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


def test_native_dedup_within_watermark(spark, tmp_path):
    """Native dropDuplicatesWithinWatermark: the bounded-state alternative
    to the custom registry — duplicates within the watermark horizon
    collapse; state for expired keys is dropped (so it runs forever)."""
    from datetime import datetime

    from pyspark.sql.types import TimestampType

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("h", StringType(), True),
            StructField("ts", TimestampType(), False),
        ]
    )
    src = tmp_path / "wsrc"
    src.mkdir()

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            str(src)
        )

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            stream.withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark(["h"])
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "wout"))
            .option("checkpointLocation", str(tmp_path / "wckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert not q.isActive
        return spark.read.parquet(str(tmp_path / "wout"))

    t = datetime(2024, 1, 1, 9, 0)
    write(
        [
            (1, "AAA", t),
            (2, "AAA", datetime(2024, 1, 1, 9, 10)),  # dup within horizon
            (3, "BBB", datetime(2024, 1, 1, 9, 20)),
        ]
    )
    got = drain()
    assert got.count() == 2  # one AAA, one BBB
    assert sorted(r["h"] for r in got.collect()) == ["AAA", "BBB"]

    # same hash again within a later batch but inside the (advanced)
    # watermark horizon of its first emission -> still deduped
    write([(4, "BBB", datetime(2024, 1, 1, 9, 40))])
    got = drain()
    assert got.filter(F.col("h") == "BBB").count() == 1


def test_streaming_chunk_dedup_cross_batch_and_shift(spark, tmp_path):
    """Chunk-level dedup: batch 2 re-pastes batch 1's content with a
    shifted prefix — every re-aligned chunk after the first boundary is
    suppressed by state from batch 1."""
    import shutil

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from imposm3_spark.datapipe.chunking import cdc_chunks
    from imposm3_spark.datapipe.streaming_dedup import streaming_chunk_dedup

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("text", StringType(), False),
        ]
    )
    base = "A fairly long paragraph about content defined chunk dedup. " * 20

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame([(1, base)], schema).write.parquet(str(src / "b"))

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src / "b"))
        q = (
            streaming_chunk_dedup(stream)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert not q.isActive
        return spark.read.parquet(str(tmp_path / "out"))

    got1 = drain().collect()
    # the x20-repeated paragraph dedups WITHIN doc 1 as well: output is
    # one row per DISTINCT chunk content, first occurrence wins
    distinct_doc1 = (
        cdc_chunks(spark.createDataFrame([(1, base)], schema))
        .select("chunk_hash")
        .distinct()
        .count()
    )
    assert len(got1) == distinct_doc1
    assert all(r.doc_id == 1 for r in got1)

    # batch 2: shifted duplicate + one genuinely new doc
    staging = tmp_path / "staging"
    spark.createDataFrame(
        [(2, "SHIFT-PREFIX! " + base), (3, "totally fresh content here")], schema
    ).write.parquet(str(staging))
    for i, f in enumerate(sorted(staging.glob("part-*.parquet"))):
        shutil.move(str(f), str(src / "b" / f"late-{i}.parquet"))
    got2 = drain().collect()
    new_rows = [r for r in got2 if (r.doc_id, r.chunk_idx) not in
                {(r1.doc_id, r1.chunk_idx) for r1 in got1}]
    # doc 2 contributes ONLY its first (prefix-affected) chunk; doc 3 all
    doc2_new = [r for r in new_rows if r.doc_id == 2]
    doc3_new = [r for r in new_rows if r.doc_id == 3]
    assert len(doc2_new) <= 1
    assert len(doc3_new) >= 1
