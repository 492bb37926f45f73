"""Pins for the curation-bench corpus synthesis (benchcurate.py).

The throughput numbers are only meaningful if the synthetic corpus has
the properties the bench's docstring claims: deterministic, unigram-
preserving, exact-dup-preserving within a replica, and (effectively)
shingle-disjoint across replicas so candidate volume scales linearly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from imposm3_spark.benchcurate import synth_corpus


def _mini_docs(spark):
    rows = [
        (1, "the cat sat on the mat with a hat"),
        (2, "spark shuffles data across the cluster nodes fast"),
        (3, "the cat sat on the mat with a hat"),  # exact dup of 1
        (4, "completely different words appear in this one here"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_synth_counts_and_determinism(spark):
    docs = _mini_docs(spark)
    c1 = synth_corpus(docs, 8)
    assert c1.count() == 32
    # deterministic: two independent evaluations hash identically
    h = lambda df: df.select(F.md5(F.concat_ws("|", "doc_id", "text")).alias("h")) \
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long"))).first()[0]
    assert h(synth_corpus(docs, 8)) == h(c1)
    # doc_ids are dense and collision-free
    assert c1.select("doc_id").distinct().count() == 32


def test_synth_preserves_unigrams_per_replica(spark):
    docs = _mini_docs(spark)
    out = synth_corpus(docs, 4)
    n = docs.count()
    # replica of base doc j has the same token MULTISET as base doc j
    base = {
        r["j"]: sorted(r["t"].split())
        for r in docs.select(
            (F.row_number().over(__import__("pyspark").sql.Window.orderBy("doc_id")) - 1).alias("j"),
            F.col("text").alias("t"),
        ).collect()
    }
    for r in out.collect():
        j = r["doc_id"] % n
        assert sorted(r["text"].split()) == base[j], r["doc_id"]


def test_synth_exact_dups_survive_within_replica(spark):
    docs = _mini_docs(spark)  # docs 1 and 3 identical
    out = synth_corpus(docs, 4)
    dup_groups = (
        out.groupBy("text").count().filter(F.col("count") > 1).count()
    )
    # one duplicated text per replica (the 1/3 pair permutes identically)
    assert dup_groups == 4


def test_synth_cross_replica_trigram_overlap_is_low(spark):
    docs = _mini_docs(spark)
    out = synth_corpus(docs, 6)
    n = docs.count()
    toks = F.split("text", " ")
    tri = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 3)),
    )
    sh = out.select(
        (F.col("doc_id") % n).alias("j"),
        F.floor(F.col("doc_id") / n).alias("rep"),
        F.explode(tri).alias("s"),
    ).distinct()
    # same base doc, different replicas: trigram sets must be (nearly)
    # disjoint — that is what keeps LSH candidate volume linear
    a = sh.filter(F.col("rep") == 1).select("j", "s")
    b = sh.filter(F.col("rep") == 2).select("j", "s")
    inter = a.join(b, ["j", "s"]).count()
    total = a.count()
    assert inter / max(total, 1) < 0.2, (inter, total)
