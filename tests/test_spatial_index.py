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


def test_zorder_layout_prunes_parquet_row_groups(spark, tmp_path):
    """Data-skipping evidence: after a z-ordered write, a small bbox
    query's min/max check admits far fewer row groups than the same data
    written in insertion order — the property that turns a full scan
    into a handful of row groups at 100 TB."""
    import random

    import pyarrow.parquet as pq

    rng = random.Random(4)
    rows = [
        (i, rng.uniform(0, 1000), rng.uniform(0, 1000)) for i in range(40000)
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")

    plain = str(tmp_path / "plain")
    df.repartition(16).write.parquet(plain)
    clustered = str(tmp_path / "zorder")
    cluster_by_zorder(df, "x", "y", (0, 0, 1000, 1000), bits=10, n_files=16).write.parquet(clustered)

    def admitted(path, qx, qy, r=25.0):
        import glob

        total = hit = 0
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            cols = {
                md.schema.column(c).name: c for c in range(md.num_columns)
            }
            for g in range(md.num_row_groups):
                total += 1
                sx = md.row_group(g).column(cols["x"]).statistics
                sy = md.row_group(g).column(cols["y"]).statistics
                if (
                    sx.min <= qx + r
                    and sx.max >= qx - r
                    and sy.min <= qy + r
                    and sy.max >= qy - r
                ):
                    hit += 1
        return hit, total

    worse = better = 0
    for qx, qy in [(100, 100), (500, 500), (900, 200), (300, 800)]:
        hp, tp = admitted(plain, qx, qy)
        hz, tz = admitted(clustered, qx, qy)
        assert tp > 1 and tz > 1
        if hz < hp:
            better += 1
        elif hz > hp:
            worse += 1
    # insertion-order row groups span the whole plane (every group
    # admits every query); z-ordered groups are compact
    assert better >= 3 and worse == 0
