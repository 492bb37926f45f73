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


def test_csv_docs_roundtrip_and_quarantine(spark, tmp_path):
    from imposm3_spark.sources.jsonl import read_csv_docs

    p = tmp_path / "corpus.csv"
    p.write_text(
        "doc_id,text,lang,source\n"
        '1,"hello world",en,web\n'
        ',"no id doc",de,books\n'          # doc_id backfilled
        '3,"",en,web\n'                     # empty text dropped
        '4,"unterminated quote,en,web\n'    # malformed -> quarantine
        '5,"ok, with comma",fr,web\n'
    )
    docs, quarantine = read_csv_docs(spark, str(p))
    rows = {r.text: r for r in docs.collect()}
    assert set(rows) == {"hello world", "no id doc", "ok, with comma"}
    assert rows["hello world"].doc_id == 1 and rows["hello world"].lang == "en"
    assert rows["no id doc"].doc_id > 0  # xxhash64 backfill
    assert rows["ok, with comma"].n_chars == len("ok, with comma")
    assert quarantine.count() >= 1
