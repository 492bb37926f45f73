"""Similarity-search + dedup-variant tests.

The ANN surface (datapipe/similarity.py) has no reference-side analog
(beyond-the-reference operator); these tests pin its semantics:
brute-force cosine is the exact baseline, LSH is a recall-lossy
approximation whose *scoring* must agree exactly with brute force on the
candidates it does return.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from imposm3_spark.datapipe import dedup as dd
from imposm3_spark.datapipe import similarity as sim


def _vectors(spark, n=50, dim=8):
    rows = []
    for i in range(n):
        vec = [math.sin(0.1 * i * (d + 1)) + 0.01 * d for d in range(dim)]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def _cosine_py(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


class TestBruteForce:
    def test_matches_python_reference(self, spark):
        emb = _vectors(spark)
        q = emb.filter(F.col("vec_id") < 2)
        got = {
            (r.query_id, r.rank): (r.vec_id, r.sim)
            for r in sim.brute_force_topk(emb, q, k=3).collect()
        }
        data = {r.vec_id: r.embedding for r in emb.collect()}
        for qid in (0, 1):
            scored = sorted(
                ((round(_cosine_py(data[qid], v), 6), cid) for cid, v in data.items() if cid != qid),
                key=lambda t: (-t[0], t[1]),
            )
            for rank in (1, 2, 3):
                want_sim, want_id = scored[rank - 1]
                assert got[(qid, rank)] == (want_id, pytest.approx(want_sim, abs=1e-9))

    def test_excludes_self(self, spark):
        emb = _vectors(spark, n=10)
        out = sim.brute_force_topk(emb, emb, k=9).collect()
        assert all(r.query_id != r.vec_id for r in out)


class TestLsh:
    def test_bucket_is_deterministic_sign_pattern(self, spark):
        planes = [sim._hyperplane(i + 1, 8) for i in range(4)]
        emb = _vectors(spark, n=20)
        got = {
            r.vec_id: r.bucket
            for r in emb.select(
                "vec_id", sim.lsh_bucket(F.col("embedding"), planes).alias("bucket")
            ).collect()
        }
        data = {r.vec_id: r.embedding for r in emb.collect()}
        for vid, vec in data.items():
            want = sum(
                (1 << i)
                for i, p in enumerate(planes)
                if sum(x * y for x, y in zip(vec, p)) >= 0
            )
            assert got[vid] == want, vid

    def test_lsh_scores_agree_with_brute_force(self, spark):
        emb = _vectors(spark)
        q = emb.filter(F.col("vec_id") < 3)
        exact = {
            (r.query_id, r.vec_id): r.sim
            for r in sim.brute_force_topk(emb, q, k=49).collect()
        }
        for r in sim.lsh_topk(emb, q, k=3, dim=8).collect():
            assert exact[(r.query_id, r.vec_id)] == pytest.approx(r.sim, abs=1e-6)

    def test_same_bucket_for_identical_vectors(self, spark):
        rows = [(0, [1.0] * 8), (1, [1.0] * 8), (2, [-1.0] * 8)]
        emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
        q = emb.filter(F.col("vec_id") == 0)
        out = sim.lsh_topk(emb, q, k=5, dim=8).collect()
        # the identical vector must be found (same bucket by construction)
        assert any(r.vec_id == 1 and r.sim == 1.0 for r in out)


class TestSimhashTable:
    def test_matches_column_version(self, spark):
        rows = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different words entirely here now"),
            (4, ""),
            (5, "   "),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        via_col = {
            r.doc_id: r.s
            for r in df.select("doc_id", dd.simhash(F.col("text")).alias("s")).collect()
        }
        via_table = {r.doc_id: r.simhash for r in dd.simhash_table(df).collect()}
        assert via_col == via_table
        assert via_table[1] == via_table[2]
        assert via_table[1] != via_table[3]

    def test_empty_text_is_zero(self, spark):
        df = spark.createDataFrame([(1, "")], "doc_id bigint, text string")
        assert dd.simhash_table(df).collect()[0].simhash == 0


class TestMinhashPairs:
    def test_duplicate_docs_pair_up(self, spark):
        text = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [(1, text), (2, text), (3, "unrelated totally different content words here")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        pairs = {(r.id_a, r.id_b) for r in dd.minhash_lsh_pairs(df).collect()}
        assert (1, 2) in pairs
        assert all(a < b for a, b in pairs)

    def test_no_self_or_reversed_pairs(self, spark):
        rows = [(i, f"shared prefix words here tail{i // 2}") for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        pairs = [(r.id_a, r.id_b) for r in dd.minhash_lsh_pairs(df).collect()]
        assert len(pairs) == len(set(pairs))
        assert all(a < b for a, b in pairs)


class TestCosineNearDup:
    def test_matches_python_all_pairs(self, spark):
        emb = _vectors(spark, n=40)
        data = {r.vec_id: r.embedding for r in emb.collect()}
        th = 0.4
        want = set()
        for a in data:
            for b in data:
                if a < b and round(_cosine_py(data[a], data[b]), 6) >= th:
                    want.add((a, b))
        got = {
            (r.a_id, r.b_id): r.sim
            for r in sim.cosine_neardup_pairs(emb, threshold=th).collect()
        }
        assert set(got) == want
        for (a, b), s in got.items():
            assert s == pytest.approx(round(_cosine_py(data[a], data[b]), 6), abs=1e-9)

    def test_lsh_neardup_subset_of_exact(self, spark):
        emb = _vectors(spark, n=40)
        exact = {
            (r.a_id, r.b_id)
            for r in sim.cosine_neardup_pairs(emb, threshold=0.4).collect()
        }
        lsh = {
            (r.a_id, r.b_id): r.sim
            for r in sim.lsh_neardup_pairs(emb, threshold=0.4, bits=4, tables=4, dim=8).collect()
        }
        # LSH may miss pairs (recall < 1) but must never invent or mis-score
        assert set(lsh) <= exact
        # identical vectors always collide -> decent recall on this data
        assert len(lsh) > 0


class TestIvf:
    def test_scores_agree_with_brute_force_and_decent_recall(self, spark):
        emb = _vectors(spark)
        q = emb.filter(F.col("vec_id") < 3)
        exact_all = {
            (r.query_id, r.vec_id): r.sim
            for r in sim.brute_force_topk(emb, q, k=49).collect()
        }
        exact_top = {
            (r.query_id, r.vec_id)
            for r in sim.brute_force_topk(emb, q, k=3).collect()
        }
        got = sim.ivf_topk(emb, q, k=3, ncentroids=8, nprobe=4).collect()
        for r in got:
            assert exact_all[(r.query_id, r.vec_id)] == pytest.approx(r.sim, abs=1e-6)
        hits = sum(1 for r in got if (r.query_id, r.vec_id) in exact_top)
        assert hits / len(exact_top) >= 0.5  # nprobe=4 of 8 cells

    def test_nprobe_all_cells_is_exact(self, spark):
        emb = _vectors(spark, n=30)
        q = emb.filter(F.col("vec_id") < 2)
        want = {
            (r.query_id, r.rank): r.vec_id
            for r in sim.brute_force_topk(emb, q, k=3).collect()
        }
        got = {
            (r.query_id, r.rank): r.vec_id
            for r in sim.ivf_topk(emb, q, k=3, ncentroids=4, nprobe=4).collect()
        }
        assert got == want


class TestHotBucketCap:
    def test_minhash_cap_drops_degenerate_bucket(self, spark):
        # 6 identical docs collide in every band -> bucket of 6; cap at 5
        # drops those buckets entirely, two genuinely-different docs remain
        text = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [(i, text) for i in range(6)]
        rows += [(10, "one shared tail piece x"), (11, "one shared tail piece x")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        uncapped = {(r.id_a, r.id_b) for r in dd.minhash_lsh_pairs(df).collect()}
        capped = {
            (r.id_a, r.id_b)
            for r in dd.minhash_lsh_pairs(df, max_bucket_size=5).collect()
        }
        assert (10, 11) in uncapped and (10, 11) in capped
        assert any(a < 6 and b < 6 for a, b in uncapped)
        assert not any(a < 6 and b < 6 for a, b in capped)

    def test_emb_cap_keeps_small_buckets(self, spark):
        rows = [(i, [1.0] * 8) for i in range(5)]  # one hot bucket of 5
        rows += [(10, [-1.0] * 8), (11, [-1.0] * 8)]  # small bucket of 2
        emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
        capped = {
            (r.a_id, r.b_id)
            for r in sim.lsh_neardup_pairs(
                emb, threshold=0.9, bits=4, tables=2, dim=8, max_bucket_size=3
            ).collect()
        }
        assert (10, 11) in capped
        assert not any(a < 5 and b < 5 for a, b in capped)


def test_ivfpq_allprobe_equals_pq(spark):
    """nprobe == ncentroids prunes nothing, so IVF-PQ must reproduce plain
    PQ top-k EXACTLY — the value check for the composed machinery
    (quantizer, cell equi-join, per-cell ADC, cross-cell merge)."""
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe.similarity import ivfpq_topk, pq_topk

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    key = lambda r: (r["query_id"], r["rank"], r["vec_id"], r["adc"])  # noqa: E731
    a = sorted(map(key, ivfpq_topk(e, q, k=3, ncentroids=16, nprobe=16).collect()))
    b = sorted(map(key, pq_topk(e, q, k=3).collect()))
    assert a == b and len(a) == 15


def test_ivfpq_pruned_is_deterministic_subset_machinery(spark):
    """Pruned probing (nprobe < cells) returns k results per query,
    deterministically, with ADC values that also appear in the all-probe
    scoring for the same (query, cand) pair."""
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe.similarity import ivfpq_topk

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    pruned = ivfpq_topk(e, q, k=3, ncentroids=16, nprobe=4).collect()
    assert len(pruned) == 15
    again = ivfpq_topk(e.repartition(9), q, k=3, ncentroids=16, nprobe=4).collect()
    key = lambda r: (r["query_id"], r["rank"], r["vec_id"])  # noqa: E731
    assert sorted(map(key, pruned)) == sorted(map(key, again))
    full = {
        (r["query_id"], r["vec_id"]): r["adc"]
        for r in ivfpq_topk(e, q, k=10**6, ncentroids=16, nprobe=16).collect()
    }
    assert all(full[(r["query_id"], r["vec_id"])] == r["adc"] for r in pruned)


def test_knn_graph_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    vecs = rng.randn(20, 8).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    from imposm3_spark.datapipe.similarity import knn_graph

    got = {}
    for r in knn_graph(df, k=3).collect():
        got.setdefault(r.src, []).append((r.rk, r.dst))
    V = vecs.astype("float64")
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    sims = np.round(V @ V.T, 6)
    for i in range(20):
        order = sorted(
            ((-(sims[i, j]), j) for j in range(20) if j != i)
        )[:3]
        expect = [(rk + 1, j) for rk, (_, j) in enumerate(order)]
        assert sorted(got[i]) == expect, i


def test_knn_graph_every_node_has_k(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    from imposm3_spark.datapipe.similarity import knn_graph

    rows = knn_graph(df, k=4).collect()
    per = {}
    for r in rows:
        per.setdefault(r.src, set()).add(r.rk)
    assert set(per) == set(range(10))
    assert all(v == {1, 2, 3, 4} for v in per.values())
