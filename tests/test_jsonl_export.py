"""Sharded JSONL export: the written files must agree with the shard_plan manifest."""
from __future__ import annotations


def test_sharded_export_matches_plan(spark, tmp_path):
    """write_sharded_jsonl produces exactly the files shard_plan
    describes: same shard ids, same per-shard doc counts, and a stable
    assignment (re-running the plan gives identical rows)."""
    from imposm3_spark.sources.jsonl import shard_plan, write_sharded_jsonl

    docs = spark.createDataFrame(
        [(i, f"doc text number {i} with words", "en", "src") for i in range(200)],
        "doc_id long, text string, lang string, source string",
    )
    plan = {r.shard: r.n_docs for r in shard_plan(docs, n_shards=8).collect()}
    plan2 = {r.shard: r.n_docs for r in shard_plan(docs, n_shards=8).collect()}
    assert plan == plan2 and sum(plan.values()) == 200

    out = tmp_path / "shards"
    write_sharded_jsonl(docs, str(out), n_shards=8)
    back = spark.read.json(str(out))
    got = {r.shard: r.cnt for r in back.groupBy("shard").count().withColumnRenamed("count", "cnt").collect()}
    assert got == plan
    # every doc round-trips
    assert back.count() == 200
    assert {r.doc_id for r in back.select("doc_id").collect()} == set(range(200))
