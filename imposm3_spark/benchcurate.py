"""End-to-end training-data curation throughput bench (the LLM-pipeline
analog of benchimport's OSM proxy).

Times the composed curation chain a 100 TB pre-training pipeline runs —
score/gate -> exact dedup -> MinHash-LSH near-dup -> benchmark
decontamination -> sequence packing -> parquet sink — per stage on a
synthesized corpus, every stage being the production operator from
datapipe/* (the same code paths the driver-checked `doc_curate`,
`doc_decontaminate`, `doc_pack_sequences` queries exercise one at a
time).

Corpus synthesis (UNTIMED — fixture prep, like test data generation):
`copies` replicas of the sf documents table, each replica's docs being
a DETERMINISTIC per-replica permutation of the base doc's tokens
(sort by xxhash64(token, position, replica)):

* unigram statistics — token count, stopword/punctuation ratios, i.e.
  everything the quality gate and langid read — are exactly the base
  corpus's, per replica;
* word-3-gram shingle sets are effectively disjoint across replicas
  (a permutation shares ~no trigrams with a different permutation of
  the same tokens), so LSH candidate volume and decontamination
  overlap grow LINEARLY with corpus size. Replicating text verbatim
  would instead make every doc a near-dup of its copies-1 siblings —
  the LSH bucket join and the component pass would then measure a
  quadratic artifact of the fixture, not pipeline throughput (first
  cut measured exactly that: 90 % of the corpus collapsed into
  transitive franken-chains and decontamination emptied the output);
* the permutation key excludes doc_id, so base docs with identical
  text stay exact duplicates WITHIN a replica — the exact-dedup stage
  keeps its real structure.

The replica fan-out is the same explode(sequence(...)) Catalyst
pattern as benchimport; the permutation is array expressions end to
end (transform -> array_sort -> array_join), zero Python.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_QUALITY_GATE = 0.75
_PACK_TOKENS = 2048


def synth_corpus(docs: DataFrame, copies: int) -> DataFrame:
    """Permuted-replica corpus: (doc_id, text), copies x count(docs) rows.

    doc_id = replica * N + base row index (dense, collision-free); text =
    the base doc's tokens sorted by xxhash64(token, position, replica).
    The key deliberately EXCLUDES doc_id so identical base texts permute
    identically within a replica (exact-dup structure preserved)."""
    n = docs.count()
    base = docs.select(
        (F.row_number().over(Window.orderBy("doc_id")) - 1).alias("j"),
        F.split(F.col("text"), " ").alias("toks"),
    )
    if copies <= 1:
        return base.select(
            F.col("j").cast("bigint").alias("doc_id"),
            F.array_join("toks", " ").alias("text"),
        )
    rep = F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("_rep")
    keyed = F.transform(
        F.col("toks"),
        lambda t, i: F.struct(
            F.xxhash64(t, i, F.col("_rep")).alias("k"), t.alias("t")
        ),
    )
    # repartition BETWEEN the fan-out and the permutation: the row_number
    # window pins the lineage to one partition, and without the shuffle
    # boundary here every permutation sort would run on a single core
    # (measured: 18 s -> ~2 s of untimed prep at 64 copies)
    exploded = base.select("j", "toks", rep).repartition(
        docs.sparkSession.sparkContext.defaultParallelism
    )
    return exploded.select(
        (F.col("_rep").cast("bigint") * n + F.col("j")).alias("doc_id"),
        F.array_join(
            F.transform(F.array_sort(keyed), lambda s: s["t"]), " "
        ).alias("text"),
    )


def curate_bench(spark: SparkSession, copies: int | None = None) -> dict:
    """Time the curation chain per stage; return a compact summary dict.

    Stages (each materialized before the next clock reading):
      score    langid + token count + quality score, gate >= 0.75
      exact    md5 hash-groupBy exact dedup (min-id representative)
      neardup  MinHash-LSH candidate pairs -> connected components ->
               one representative per cluster
      decont   word-3-gram overlap against a held-out benchmark sample
               (broadcast), anti-join contaminated docs out
      pack     greedy sequence packing into 2048-token budgets + parquet
               sink (the shard list a trainer consumes)
    """
    from imposm3_spark.datapipe import cluster as cl
    from imposm3_spark.datapipe import dedup as dd
    from imposm3_spark.datapipe import sampling as sp
    from imposm3_spark.datapipe import text as tx
    from imposm3_spark.datapipe.evaluation import deterministic_sample

    if copies is None:
        # 64 x 5000 sf0.1 docs = 320k franken-docs: large enough that the
        # LSH band join and component pass dominate fixed job overhead
        copies = int(os.environ.get("SPARK_GRAFT_CURATE_COPIES", "64"))

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # synth_corpus repartitions internally (the row_number window would
    # otherwise collapse the lineage to ONE partition — the first cut of
    # this bench ran the whole pipeline single-threaded)
    corpus = synth_corpus(base, copies).localCheckpoint()
    docs_in = corpus.count()
    # benchmark set for decontamination: a held-out deterministic slice of
    # the corpus itself (an eval set drawn from the training distribution)
    benchmark = deterministic_sample(corpus, mod=64).localCheckpoint()

    stages: dict[str, float] = {}

    t = time.perf_counter()
    # materialize the scored columns FIRST, then gate on the plain column:
    # filtering directly on the scoring expression lets Catalyst push the
    # predicate into the same operator as the projection, and the scoring
    # tree is then evaluated once for the predicate and again per output
    # reference with no subexpression reuse across them — measured 47.9 s
    # vs 5.9 s + 0.2 s for this exact stage at 320k docs (docs/SCALE.md)
    scored = corpus.select(
        "doc_id",
        "text",
        tx.token_count(F.col("text")).alias("n_tokens"),
        tx.quality_score(F.col("text")).alias("quality"),
        tx.langid(F.col("text")).alias("lang"),
    ).localCheckpoint()
    scored = scored.filter(F.col("quality") >= _QUALITY_GATE)
    n_scored = scored.count()
    stages["score"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    keep_exact = (
        scored.groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    exact = scored.join(keep_exact, "doc_id", "left_semi").localCheckpoint()
    n_exact = exact.count()
    stages["exact"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    # 5-gram shingles + a bucket cap, the production-scale parameters
    # (RefinedWeb/Gopher-style): the fixture's 31-word vocabulary makes
    # 3-gram Jaccard between RANDOM docs ~0.05-0.1, so default 3-shingles
    # here would measure chance-collision transitive closure, not dedup
    pairs = dd.minhash_lsh_pairs(exact, shingle_k=5, max_bucket_size=64)
    curated = cl.dedup_representatives(
        exact, pairs, "doc_id", pair_a="id_a", pair_b="id_b"
    ).localCheckpoint()
    n_curated = curated.count()
    stages["neardup"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    # 8-gram overlap (GPT-3 used 13-grams): contamination means genuine
    # eval-text reuse, not chance n-gram collisions in a tiny vocabulary
    contaminated = dd.decontaminate(curated, benchmark, shingle_k=8).select("doc_id")
    clean = curated.join(contaminated, "doc_id", "left_anti").localCheckpoint()
    n_clean = clean.count()
    stages["decont"] = round(time.perf_counter() - t, 3)

    # A/B rider: the Bloom-filter decont variant (dedup.py
    # bloom_decontaminate — fixed 8 KB plan-literal bitset no matter the
    # eval-suite size). Flags a SUPERSET of the exact stage's docs
    # (hash-collision false positives only). RECORDED NEGATIVE RESULT
    # (round-10, docs/ROUND10.md): at bench scale the eval slice holds
    # ~1M distinct 8-gram shingles, saturating the 64 Ki-bit default
    # filter — bloom_false_positives lands near the whole corpus and
    # bloom_identical stays false. Per-doc FP <= 1% at this shingle volume
    # needs m ~ 45n ~ 56 Mbit, far past what a Catalyst array literal
    # should carry (Spark's internal BloomFilterAggregate/might_contain
    # pair would hold it as a broadcast binary, but Spark 4.1 does not
    # register them as public functions). The exact broadcast-semi-join
    # stage therefore remains the production decont shape; the rider
    # stays in the bench to keep the boundary measured. Timed + diffed
    # against the exact stage, never replacing it — the headline `decont`
    # number stays comparable across rounds.
    t = time.perf_counter()
    bloom_flagged = dd.bloom_decontaminate(curated, benchmark, shingle_k=8).select(
        "doc_id"
    )
    clean_bloom = curated.join(bloom_flagged, "doc_id", "left_anti")
    n_clean_bloom = clean_bloom.count()
    stages["decont_bloom"] = round(time.perf_counter() - t, 3)
    # FP docs = flagged by bloom but not by the exact checker; the exact
    # stage's verdicts are never-false-negative, so set difference one way
    n_bloom_fp = bloom_flagged.join(contaminated, "doc_id", "left_anti").count()

    t = time.perf_counter()
    packed = sp.pack_sequences(clean, "doc_id", "n_tokens", _PACK_TOKENS)
    out_dir = tempfile.mkdtemp(prefix="imposm3_curate_bench_")
    try:
        packed.write.mode("overwrite").parquet(f"{out_dir}/packed.parquet")
        docs_out = spark.read.parquet(f"{out_dir}/packed.parquet").count()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    stages["pack"] = round(time.perf_counter() - t, 3)

    # headline wall excludes the decont_bloom A/B rider (it duplicates the
    # decont stage's work; including it would break cross-round totals)
    wall = round(sum(v for k, v in stages.items() if k != "decont_bloom"), 3)
    assert docs_out == n_clean, "sink row count diverged from the pipeline"
    return {
        "metric": "doc_curate_e2e_wall",
        "value": wall,
        "unit": "sec",
        "copies": copies,
        "docs_in": docs_in,
        "docs_scored": n_scored,
        "docs_exact": n_exact,
        "docs_curated": n_curated,
        "docs_out": docs_out,
        "bloom_clean": n_clean_bloom,
        "bloom_false_positives": n_bloom_fp,
        "bloom_identical": n_bloom_fp == 0 and n_clean_bloom == n_clean,
        "docs_per_sec": round(docs_in / wall, 1) if wall else None,
        "stages": stages,
    }


def measured_run(spark: SparkSession) -> dict:
    """Warmup pass + best-of-2 in one warm JVM (same protocol as
    benchimport.measured_run)."""
    import gc

    warm = min(8, int(os.environ.get("SPARK_GRAFT_CURATE_COPIES", "64")))
    gc.collect()
    curate_bench(spark, copies=warm)
    runs = []
    for _ in range(2):
        gc.collect()
        runs.append(curate_bench(spark))
    summary = min(runs, key=lambda r: r["value"])
    summary["trials"] = len(runs)
    return summary


if __name__ == "__main__":
    import json
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from imposm3_spark.session import get_spark

    spark = get_spark("imposm3-curate-bench")
    spark.sparkContext.setLogLevel("ERROR")
    mode = sys.argv[1] if len(sys.argv) > 1 else "once"
    if mode == "measured":
        print(json.dumps(measured_run(spark)), flush=True)
    else:
        print(json.dumps(curate_bench(spark)), flush=True)
