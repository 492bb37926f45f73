"""Skew-safe combinators (datapipe/skew.py): salted results must be
EXACTLY the unsalted ones, for any salt count, deterministically."""

import pytest
from pyspark.sql import functions as F

from imposm3_spark.datapipe import skew

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_salted_agg_matches_plain(spark, events):
    plain = {
        (r["event_type"],): (r["n"], round(r["total"], 2), r["max_v"], r["min_v"])
        for r in events.groupBy("event_type")
        .agg(
            F.count("event_id").alias("n"),
            F.sum("value").alias("total"),
            F.max("value").alias("max_v"),
            F.min("value").alias("min_v"),
        )
        .collect()
    }
    for n_salts in (1, 4, 32):
        out = skew.salted_agg(
            events,
            keys=["event_type"],
            aggs={
                "n": ("event_id", "count"),
                "total": ("value", "sum"),
                "max_v": ("value", "max"),
                "min_v": ("value", "min"),
            },
            n_salts=n_salts,
        )
        got = {
            (r["event_type"],): (r["n"], round(r["total"], 2), r["max_v"], r["min_v"])
            for r in out.collect()
        }
        assert got == plain, f"n_salts={n_salts}"


def test_salted_agg_rejects_unknown_fn(events):
    with pytest.raises(ValueError):
        skew.salted_agg(events, ["event_type"], {"a": ("value", "avg")})


def test_salted_join_matches_plain(spark, events):
    users = events.select("user_id").distinct().withColumn(
        "flag", F.col("user_id") % 3
    )
    plain = sorted(
        (r["event_id"], r["flag"])
        for r in events.join(users, "user_id").select("event_id", "flag").collect()
    )
    for n_salts in (1, 8):
        got = sorted(
            (r["event_id"], r["flag"])
            for r in skew.salted_broadcast_join(events, users, key="user_id", n_salts=n_salts)
            .select("event_id", "flag")
            .collect()
        )
        assert got == plain, f"n_salts={n_salts}"


def test_salted_join_is_deterministic(spark, events):
    users = events.select("user_id").distinct()
    a = skew.salted_broadcast_join(events, users, key="user_id", n_salts=8)
    h1 = sorted(r["event_id"] for r in a.select("event_id").collect())
    b = skew.salted_broadcast_join(events, users, key="user_id", n_salts=8)
    h2 = sorted(r["event_id"] for r in b.select("event_id").collect())
    assert h1 == h2


def test_salted_join_requires_salt_source(spark, events):
    only_key = events.select("user_id")
    with pytest.raises(ValueError):
        skew.salted_broadcast_join(only_key, events.select("user_id"), key="user_id")


class TestHotKeyJoin:
    def test_skewed_key_routes_hot_and_matches_plain_join(self, spark):
        from pyspark.sql import functions as F

        from imposm3_spark.datapipe.skew import hot_key_join, hot_keys

        # one viral key (0) with 50k rows, 100 cold keys with 10 each
        probe = (
            spark.range(0, 50_000)
            .select(F.lit(0).alias("k"), F.col("id").alias("v"))
            .union(
                spark.range(0, 1000).select(
                    (F.col("id") % 100 + 1).alias("k"), F.col("id").alias("v")
                )
            )
        )
        build = spark.range(0, 101).select(
            F.col("id").alias("k"), F.concat(F.lit("b"), F.col("id")).alias("b")
        )
        hk = {r.k for r in hot_keys(probe, "k", threshold=10_000).collect()}
        assert hk == {0}

        out = hot_key_join(probe, build, "k", threshold=10_000)
        plain = probe.join(build, "k")
        assert out.count() == plain.count() == 51_000
        assert (
            out.groupBy("k").count().orderBy("k").collect()
            == plain.groupBy("k").count().orderBy("k").collect()
        )

    def test_left_join_keeps_unmatched_probe_rows(self, spark):
        from pyspark.sql import functions as F

        from imposm3_spark.datapipe.skew import hot_key_join

        probe = spark.range(0, 100).select((F.col("id") % 5).alias("k"), "id")
        build = spark.range(0, 3).select(F.col("id").alias("k"), F.lit("x").alias("b"))
        out = hot_key_join(probe, build, "k", threshold=1_000_000, how="left")
        assert out.count() == 100
        assert out.filter(F.col("b").isNull()).count() == 40  # k in {3,4}

    def test_rejects_outer_joins(self, spark):
        import pytest as pt

        from imposm3_spark.datapipe.skew import hot_key_join

        df = spark.range(1).withColumnRenamed("id", "k")
        with pt.raises(ValueError):
            hot_key_join(df, df, "k", how="full")
