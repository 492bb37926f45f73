"""Incrementally-maintained rollup: batch merges equal the batch-mode
aggregate, replays are no-ops, restarts resume from the checkpoint."""

from pyspark.sql import functions as F

from imposm3_spark.streaming.maintain import RollupStore

SCHEMA = "event_type string, value double, eid long"


def _store(spark, path):
    return RollupStore(
        spark,
        str(path),
        key_cols=["event_type"],
        agg_spec={"n": ("count", None), "total": ("sum", "value")},
    )


def _drain(spark, store, src, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        stream.writeStream.foreachBatch(store.sink())
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive


def _rows(store):
    return {
        r["event_type"]: (r["n"], r["total"]) for r in store.current().collect()
    }


def test_incremental_merge_matches_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    store = _store(spark, tmp_path / "rollup")
    ckpt = tmp_path / "ckpt"

    spark.createDataFrame(
        [("click", 1.0, 1), ("click", 2.0, 2), ("view", 5.0, 3)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))
    _drain(spark, store, src, ckpt)
    assert _rows(store) == {"click": (2, 3.0), "view": (1, 5.0)}

    # second batch merges: only touched keys change
    spark.createDataFrame(
        [("click", 10.0, 4), ("buy", 7.0, 5)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))
    _drain(spark, store, src, ckpt)
    assert _rows(store) == {"click": (3, 13.0), "view": (1, 5.0), "buy": (1, 7.0)}


def test_replay_is_noop(spark, tmp_path):
    store = _store(spark, tmp_path / "rollup")
    b = spark.createDataFrame([("click", 1.0, 1)], SCHEMA)
    store.apply_batch(b, 0)
    assert _rows(store) == {"click": (1, 1.0)}
    # the streaming engine re-delivers batch 0 after a crash: no double count
    store.apply_batch(b, 0)
    assert _rows(store) == {"click": (1, 1.0)}
    store.apply_batch(b, 1)
    assert _rows(store) == {"click": (2, 2.0)}


def test_restart_resumes_from_checkpoint(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    store = _store(spark, tmp_path / "rollup")
    ckpt = tmp_path / "ckpt"

    spark.createDataFrame([("click", 1.0, 1)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    _drain(spark, store, src, ckpt)

    # "restart": a NEW store handle over the same dir + same checkpoint;
    # the already-processed file must not be re-merged
    store2 = _store(spark, tmp_path / "rollup")
    spark.createDataFrame([("view", 4.0, 2)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    _drain(spark, store2, src, ckpt)
    assert _rows(store2) == {"click": (1, 1.0), "view": (1, 4.0)}


def test_rejects_non_mergeable_spec(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        RollupStore(
            spark, str(tmp_path / "r"), ["k"], {"m": ("avg", "value")}
        )


def test_atomic_version_visible_table(spark, tmp_path):
    store = _store(spark, tmp_path / "rollup")
    assert store.current() is None
    store.apply_batch(spark.createDataFrame([("a", 1.0, 1)], SCHEMA), 0)
    v1 = store.current()
    store.apply_batch(spark.createDataFrame([("a", 1.0, 2)], SCHEMA), 1)
    # reader sees the new version atomically
    assert _rows(store) == {"a": (2, 2.0)}
    assert store.last_batch_id == 1
    _ = v1  # old handle may be invalidated; the marker flip is the contract


def test_version_retention_gc(spark, tmp_path):
    """Publish keeps the previous version (reader race window) and sweeps
    ALL older versions, including ones leaked by a crash before GC."""
    import os

    from imposm3_spark.streaming.maintain import RollupStore

    store = RollupStore(
        spark, str(tmp_path / "roll"), ["k"], {"n": ("count", None)}
    )
    # simulate a crash-leaked stale dir that a naive previous-only GC never revisits
    os.makedirs(tmp_path / "roll" / "v999_bogus")  # non-numeric: ignored
    for b in range(4):
        df = spark.createDataFrame([(1,), (2,)], "k int")
        store.apply_batch(df, b)
        versions = sorted(
            int(d[1:]) for d in os.listdir(tmp_path / "roll")
            if d.startswith("v") and d[1:].isdigit()
        )
        assert versions == ([b + 1] if b == 0 else [b, b + 1])
    assert (tmp_path / "roll" / "v999_bogus").is_dir()  # untouched
    assert store.current().count() == 2
    assert [r["n"] for r in store.current().collect()] == [4, 4]


def test_hll_rollup_merges_registers_across_batches(spark, tmp_path):
    """The 'hll' agg kind: per-batch HyperLogLog register sets union into
    the stored rollup, so the maintained approximate distinct count spans
    the FULL stream history — while each merge touches only rollup-sized
    state. Distinct values split across batches must still be counted
    once (registers merge; counts would double)."""
    store = RollupStore(
        spark,
        str(tmp_path / "hll"),
        key_cols=["event_type"],
        agg_spec={"n": ("count", None), "users": ("hll", "eid")},
    )
    b1 = spark.createDataFrame(
        [("a", 1.0, v) for v in range(100)], SCHEMA
    )
    # batch 2 repeats 50 of batch 1's ids and adds 100 new ones
    b2 = spark.createDataFrame(
        [("a", 1.0, v) for v in range(50, 200, 1)], SCHEMA
    )
    store.apply_batch(b1, 0)
    store.apply_batch(b2, 1)
    est = {r["event_type"]: r for r in store.estimates().collect()}
    assert est["a"]["n"] == 100 + 150  # counts sum
    # distinct ids 0..199 -> estimate within HLL error of 200, and far
    # below the 250 a count-sum would give
    assert 180 <= est["a"]["users"] <= 220
    # replay of batch 1 is a no-op (exactly-once)
    store.apply_batch(b1, 1)
    est2 = {r["event_type"]: r for r in store.estimates().collect()}
    assert est2["a"]["n"] == 250
