"""Hive-partitioned writes + partition pruning: the 100 TB table-layout
practice — a day-filtered query over a date-partitioned table must prune
at the DIRECTORY level (PartitionFilters), not scan-and-filter."""

from pyspark.sql import functions as F


def _events(spark):
    rows = [
        (i, f"2024-01-{(i % 5) + 1:02d}", "click" if i % 2 else "view", float(i))
        for i in range(1000)
    ]
    return spark.createDataFrame(
        rows, "event_id long, day string, event_type string, value double"
    )


def test_partition_pruned_scan(spark, tmp_path):
    path = str(tmp_path / "events_by_day")
    _events(spark).write.partitionBy("day").parquet(path)

    df = (
        spark.read.parquet(path)
        .filter(F.col("day") == "2024-01-03")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    rows = {r["event_type"]: (r["n"], r["total"]) for r in df.collect()}
    # day 3 <=> i % 5 == 2: 200 events, alternating types
    assert rows["click"][0] + rows["view"][0] == 200

    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(ln for ln in plan.splitlines() if "FileScan parquet" in ln)
    # the day predicate must appear as a PartitionFilter (directory prune),
    # NOT as a post-scan data filter
    assert "PartitionFilters: [" in scan
    assert "isnotnull(day" in scan or "(day" in scan.split("PartitionFilters")[1]

    # correctness parity with the unpartitioned layout
    flat = str(tmp_path / "events_flat")
    _events(spark).write.parquet(flat)
    expect = {
        r["event_type"]: (r["n"], r["total"])
        for r in spark.read.parquet(flat)
        .filter(F.col("day") == "2024-01-03")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert rows == expect


def test_dynamic_partition_overwrite(spark, tmp_path):
    """Re-writing ONE day must leave the other partitions untouched
    (dynamic partition overwrite — the incremental-backfill pattern)."""
    path = str(tmp_path / "events_dpo")
    _events(spark).write.partitionBy("day").parquet(path)
    before = spark.read.parquet(path).count()

    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        patch = spark.createDataFrame(
            [(9999, "2024-01-03", "patched", 0.0)],
            "event_id long, day string, event_type string, value double",
        )
        patch.write.mode("overwrite").partitionBy("day").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)

    after = spark.read.parquet(path)
    # day 3 replaced by the single patch row; other days intact
    assert after.filter(F.col("day") == "2024-01-03").count() == 1
    assert after.count() == before - 200 + 1
    assert after.filter(F.col("event_type") == "patched").count() == 1
