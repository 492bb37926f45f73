"""Z-order clustering (geom/spatial_index): interleave vectors, quantize
clamping, and the write-path property that actually matters — each output
partition covers a compact, non-overlapping z-range so parquet row-group
stats prune."""

from pyspark.sql import functions as F

from imposm3_spark.geom.spatial_index import (
    cluster_by_zorder,
    interleave_bits,
    quantize,
    zorder_key,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_interleave_known_vectors(spark):
    # x=0b11, y=0b01 -> bits: x0->0, y0->1, x1->2, y1->3 = 0b0111 = 7
    assert _one(spark, interleave_bits(F.lit(3), F.lit(1), 2)) == 7
    assert _one(spark, interleave_bits(F.lit(0), F.lit(0), 8)) == 0
    # full-ones interleave: x=0xFF, y=0xFF -> 0xFFFF
    assert _one(spark, interleave_bits(F.lit(255), F.lit(255), 8)) == 0xFFFF
    # y contributes the odd bits
    assert _one(spark, interleave_bits(F.lit(0), F.lit(1), 4)) == 2


def test_quantize_clamps_and_scales(spark):
    q = lambda v: _one(spark, quantize(F.lit(v), 0.0, 100.0, 8))
    assert q(-5.0) == 0  # clamped low
    assert q(1000.0) == 255  # clamped high
    assert q(0.0) == 0 and q(100.0) == 255
    assert q(50.0) == 128  # round(0.5 * 255) = 128


def test_zorder_locality(spark):
    """Nearby points get nearby keys: the max key delta within a tight
    cluster is far below the delta to a far-away point."""
    rows = [(0, 10.0, 10.0), (1, 10.5, 10.2), (2, 900.0, 950.0)]
    df = spark.createDataFrame(rows, "id int, x double, y double")
    out = {
        r["id"]: r["z"]
        for r in df.select(
            "id", zorder_key(F.col("x"), F.col("y"), (0, 0, 1000, 1000), 8).alias("z")
        ).collect()
    }
    assert abs(out[0] - out[1]) < abs(out[0] - out[2])


def test_cluster_by_zorder_partitions_are_disjoint_ranges(spark):
    df = spark.range(4000).select(
        F.col("id").cast("int").alias("id"),
        (F.pmod(F.xxhash64("id"), 1000)).cast("double").alias("x"),
        (F.pmod(F.xxhash64("id", F.lit(1)), 1000)).cast("double").alias("y"),
    )
    clustered = cluster_by_zorder(df, "x", "y", (0, 0, 1000, 1000), bits=8, n_files=8)
    # same rows, just reordered
    assert clustered.count() == 4000
    ranges = (
        clustered.withColumn(
            "z", zorder_key(F.col("x"), F.col("y"), (0, 0, 1000, 1000), 8)
        )
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in ranges)
    assert len(spans) > 1
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "partition z-ranges overlap — write would not prune"
