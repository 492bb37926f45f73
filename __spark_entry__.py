"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query smoke check at sf0.001.
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 training-data pipeline ops); see imposm3_spark/benchqueries.py.
oracle_sql()   — matching DuckDB SQL for the correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from imposm3_spark import benchqueries as _bq  # noqa: E402


def _pin_session(spark: SparkSession) -> None:
    """Make query results independent of how the DRIVER built its session
    (it does not use imposm3_spark.session's factory). Three pins:
    nanos-as-long for nanosecond parquet timestamps, NTZ inference so the
    testdata's tz-less timestamp[us] columns read as TIMESTAMP_NTZ (the
    timezone-independent representation), and a UTC session zone so any
    residual LTZ path evaluates identically everywhere."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _pin_session(spark)
    return _bq.tpch_q1(spark, "/root/testdata/sf0.001")


# The driver's correctness gate records at most 50 entries per round, taken
# in dict order. ROUND-8 WINDOW: 7 re-check slots + ALL 43 registered
# queries that still lack a driver row (cumulative after this window:
# 242/242). The round-7 verdict budgeted 8 re-checks + 42 fresh, reserving
# a slot for doc_source_similarity — but its r07 driver row was recorded
# AGAINST the post-pin code (the simjoin localCheckpoint commits 4c32aac/
# 71d9042 predate the r07 correctness run, and CORRECTNESS_r07 shows it
# hash-green), so under the round-5 guard rule ("re-check iff code changed
# after the query's LAST driver row") it needs no slot and every fresh
# name fits.
#
# RE-CHECK audit (git diff bef3d46..e006a51, every round-7 commit):
#   * datapipe/timeseries.py — _step_major_scan null/negative guards →
#     events_ewma, events_holt (last rows r06, predate the change).
#   * datapipe/simjoin.py — pinned shared tokenization frames →
#     doc_ppjoin, doc_cosine_pairs, doc_winnow_pairs, doc_containment,
#     doc_minhash_accuracy (last rows predate the pins).
#     doc_source_similarity / doc_lsh_pr / doc_lsh_pr_curve also ride
#     these kernels but are r07-green post-change: no slot.
#   * benchqueries.py — deleted two DEAD SQL-string helpers only
#     (_REV_E4_SQL, _cents_sum_sql; no query referenced them): no slot.
#   * benchqueries_{ext,mining,r4,r4b}.py, stats.py, evaluation.py,
#     multimodal.py — every touched query function is either r07-green
#     (events_did, events_kendall_tau, doc_lsh_pr*) or in the fresh list
#     below (media_*, sampled variants, cust_except_months).
#   * geom/{build,py_geom,wkb}.py, pipeline/engine.py, sources/pbf.py —
#     import-pipeline only; the symbols benchqueries import (line_length,
#     is_closed_refs, proj.*, resolve_way_coords, zorder_key, grid_join)
#     are all byte-unchanged in round 7.
# All 50 names re-gated strict green (scripts/check_oracle.py: repr-float
# hash + banned-type audit + zero-row WEAK flag) at sf0.01 this round
# before this list landed; the 7 re-checks also at sf0.1.
#
# ROUND-9 RE-CHECK QUEUE (code changed after their last driver row):
# round 8 rewrote the text-op kernels (datapipe/text.py: token_count /
# avg_token_len / punct_ratio / stopword_ratio / quality_score / langid /
# gopher symbol_ratio now regexp_count-based, allocation-free; value
# equality property-pinned in test_text_fast_ops.py and the FULL 242-query
# gate re-passed at sf0.01 after the change). Driver-green queries riding
# those kernels that are NOT in this window:
#   doc_text_stats, doc_quality, doc_langid, doc_clean_sample,
#   doc_gopher_rules, doc_rag_retrieve, doc_score_auc, doc_lang_confusion,
#   doc_make_batches, doc_tokenizer_fertility
# (doc_curate and doc_quality_matrix also ride them but are IN this
# window, so their rows will postdate the change.)
# Round 8 also FIXED a real BPE defect (hypothesis found it: the
# two-pass boundary-sharing replace segmented odd runs of 5+ repeated
# symbols (xx)(x)(xx) instead of classic BPE's (xx)(xx)(x)); the merge
# application now uses a double-space spelling whose single replace IS
# the classic greedy sweep, and BOTH the Spark kernel and the DuckDB
# oracles changed accordingly (datapipe/bpe.py, _sql_bpe,
# _sql_bpe_encode). Re-check in round 9:
#   doc_bpe_merges, doc_bpe_encode
_DRIVER_FIRST = [
    # -- re-checks (code changed after their last driver row) --
    "events_ewma",
    "events_holt",
    "doc_ppjoin",
    "doc_cosine_pairs",
    "doc_winnow_pairs",
    "doc_containment",
    "doc_minhash_accuracy",
    # -- the 43 never-driver-checked names (registry complete after this) --
    "cust_except_months",
    "doc_curate",
    "doc_decontaminate",
    "doc_dsir_weights",
    "doc_inverted_index",
    "doc_lsh_pr_curve_sampled",
    "doc_lsh_pr_sampled",
    "doc_minhash_accuracy_sampled",
    "doc_mix_temperature",
    "doc_pairgraph_triangles",
    "doc_perplexity_bins",
    "doc_quality_matrix",
    "doc_repetition",
    "doc_sample_stratified",
    "doc_scrub",
    "doc_split_assign",
    "doc_tfidf_topk",
    "doc_vocab_topk",
    "emb_ivfpq_topk",
    "emb_knn_graph_sampled",
    "emb_label_centroids",
    "emb_neardup_clusters",
    "emb_neardup_clusters_sampled",
    "emb_norm_stats",
    "emb_pq_topk",
    "emb_quantize",
    "emb_semdedup",
    "events_asof_nearest",
    "events_cube_distinct",
    "events_json_props",
    "events_moving_avg",
    "events_retention",
    "events_salted_agg",
    "events_session_window",
    "lineitem_unpivot",
    "media_dedup_exact",
    "media_features",
    "media_frame_sample",
    "media_resize_meta",
    "orders_hotkey_join",
    "orders_price_deciles",
    "orders_salted_join",
    "osm_zorder_key",
]

# A typo here would silently shrink the driver's 50-row window (unknown
# names are filtered out in queries()) — fail loudly at import instead.
assert len(_DRIVER_FIRST) == 50, len(_DRIVER_FIRST)
assert len(set(_DRIVER_FIRST)) == 50


def _check_driver_first() -> None:
    missing = [n for n in _DRIVER_FIRST if n not in _bq.QUERIES]
    assert not missing, f"_DRIVER_FIRST names not registered: {missing}"


_check_driver_first()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _pin_session(spark)
            return fn(spark, sf_dir)

        return run

    ordered = [n for n in _DRIVER_FIRST if n in _bq.QUERIES]
    ordered += [n for n in _bq.QUERIES if n not in set(ordered)]
    return {name: wrap(_bq.QUERIES[name]) for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted -> rows-only check)."""
    return dict(_bq.ORACLES)
