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
