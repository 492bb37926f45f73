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
# in dict order. ROUND-7 WINDOW: the first 50 names of the 90-query
# rotation queue committed in round 6 (registry minus every query with a
# driver row through r06), executed verbatim per the round-6 verdict.
# events_did (position 38) was fixed THIS round before spending its slot:
# the old 2001-06-15 cutover predated the all-2024 fixture, making it
# vacuously green (0 rows); the cutover is now 2024-01-15 (5 rows at
# sf0.001/0.01) and check_oracle.py flags any 0-row oracle as WEAK.
# All 50 green on the round-7 STRICT local gate (full-precision repr float
# hash + banned-type audit + zero-row WEAK flag) before this list landed.
_DRIVER_FIRST = [
    "emb_silhouette",
    "orders_percent_rank",
    "doc_source_similarity",
    "events_heatmap",
    "lineitem_weighted_median",
    "orders_priority_drift",
    "events_growth_accounting",
    "doc_lsh_pr",
    "events_cuped",
    "emb_cluster_purity",
    "doc_lsh_pr_curve",
    "events_hazard",
    "doc_pii_report",
    "orders_dup_payments",
    "orders_cycle_time",
    "emb_ball_query",
    "supplier_hhi",
    "emb_mmr_select",
    "events_k_anonymity",
    "cust_gini",
    "events_benford",
    "events_spearman",
    "events_kcore",
    "doc_collocation_llr",
    "doc_zipf",
    "doc_textrank",
    "events_mutual_info",
    "doc_shard_plan",
    "emb_kcenter",
    "events_dispersion",
    "orders_burstiness",
    "events_transition_entropy",
    "events_ks_test",
    "events_conversion_ci",
    "events_markov_stationary",
    "events_kendall_tau",
    "orders_churn_labels",
    "events_did",
    "emb_cluster_ari",
    "doc_tokenizer_fertility",
    "events_eta_squared",
    "doc_simpson_diversity",
    "events_runs_test",
    "doc_char_entropy",
    "cust_palma",
    "events_qq_drift",
    "doc_bloom_decontaminate",
    "doc_chunk_overlap",
    "doc_clean_sample",
    "doc_corpus_diff",
    # ROUND-8 QUEUE — the 40 registered queries that will still lack a
    # driver row after this window lands (queue positions 51-90 of the
    # round-6 rotation, verbatim), PLUS:
    #   * RE-CHECK slots (code changed after the query's last driver row,
    #     the round-5 guard rule):
    #     - events_ewma, events_holt — round 7 added null/negative guards
    #       to their _step_major_scan kernel (datapipe/timeseries.py);
    #     - doc_ppjoin, doc_winnow_pairs, doc_cosine_pairs,
    #       doc_containment, doc_minhash_accuracy, doc_source_similarity —
    #       round 7 pinned their shared tokenization frames
    #       (datapipe/simjoin.py localCheckpoints; values unchanged).
    #     All eight re-gated strict green at sf0.01 AND sf0.1 after the
    #     change this round, but the driver should confirm. The window
    #     queries the simjoin pins touch (doc_lsh_pr, doc_lsh_pr_curve)
    #     were likewise re-gated at both SFs after the pins landed.
    #     No other round-7 change touched oracle-backed code: the
    #     ORACLES-dict diff vs round 6 shows only events_did changed
    #     (intended), the engine pinning affects no bench query, and
    #     media_features now PINS the digest decoder explicitly (re-gated).
    #   * the three queries REGISTERED in round 7 (listed at the end).
    # Total round-8 window: 8 re-checks + 43 fresh = 51 names (the driver
    # records 50 — drop the last fresh name to round 9 if needed).
    #   doc_curate, doc_decontaminate, doc_dsir_weights, doc_inverted_index,
    #   doc_lsh_pr_curve_sampled, doc_lsh_pr_sampled,
    #   doc_minhash_accuracy_sampled, doc_mix_temperature,
    #   doc_pairgraph_triangles, doc_perplexity_bins, doc_quality_matrix,
    #   doc_repetition, doc_sample_stratified, doc_scrub, doc_split_assign,
    #   doc_tfidf_topk, doc_vocab_topk, emb_ivfpq_topk, emb_label_centroids,
    #   emb_neardup_clusters, emb_norm_stats, emb_pq_topk, emb_quantize,
    #   emb_semdedup, events_asof_nearest, events_cube_distinct,
    #   events_json_props, events_moving_avg, events_retention,
    #   events_salted_agg, events_session_window, lineitem_unpivot,
    #   media_dedup_exact, media_features, media_frame_sample,
    #   media_resize_meta, orders_hotkey_join, orders_price_deciles,
    #   orders_salted_join, osm_zorder_key;
    # plus the queries REGISTERED in round 7 (never queued before):
    #   emb_knn_graph_sampled, emb_neardup_clusters_sampled,
    #   cust_except_months.
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
