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
# in dict order. ROUND-11 WINDOW (round-10 verdict task 1): the round-10
# window rotation (3356c06) predates the session-2 rewrites (f62f59c,
# e4eee68, 0165b39), so every query whose EXECUTED PLAN changed in those
# commits has driver rows only on its OLD code — this window leads with
# them, then reserves slots for this round's own code changes, then drains
# the r05 staleness queue.
#
# (a) ROUND-10 REWRITE RE-CHECKS (the verdict's explicit list): the lsh_pr
#     family (single-plan full-outer rewrite), emb_cluster_purity (rollup
#     rewrite) + the kmeans/quantize_pinned riders (ari/silhouette/
#     mmr_select), events_kendall_tau (Column-tree memo),
#     doc_textrank/events_pagerank/events_markov_stationary (pagerank
#     pins), and the 11 plan_parallelism riders (cust_gini, cust_palma,
#     doc_budget_select, doc_perplexity_bins, doc_weighted_sample,
#     orders_pareto, orders_percent_rank, events_ks_test, lineitem_skyline
#     + kendall/knn already listed). All pass the builder's
#     scripts/check_oracle.py at sf0.1 on the new code; the driver
#     re-confirms here.
# (b) ROUND-11 CODE-CHANGE RE-CHECKS: slots reserved for the queries this
#     optimization round touches — doc_winnow_pairs/doc_cdc_* (hash-kernel
#     A/B, verdict task 6), doc_containment/doc_cosine_pairs (single-plan
#     restructure, task 7), osm_diff_frontier/osm_expire_tiles (diff-loop
#     rebuild/expire work rides refindex/expire symbols, tasks 3+5).
#     Confirmed against scripts/recheck_audit.py a8ce655..HEAD at round
#     close.
# (c) R05 STALENESS QUEUE, DRAINED: all 14 remaining r05-newest rows
#     (events_pagerank, the 15th, re-checks via (a)). After this window no
#     query's newest driver row predates r06.
# (d) STALEST-NEXT FILL: the 8 alphabetically-first r06-newest rows.
_DRIVER_FIRST = [
    # -- (a) round-10 rewrite re-checks: 21 --
    "doc_lsh_pr",
    "doc_lsh_pr_sampled",
    "doc_lsh_pr_curve",
    "doc_lsh_pr_curve_sampled",
    "emb_cluster_purity",
    "emb_cluster_ari",
    "emb_silhouette",
    "emb_mmr_select",
    "events_kendall_tau",
    "doc_textrank",
    "events_pagerank",
    "events_markov_stationary",
    "cust_gini",
    "cust_palma",
    "doc_budget_select",
    "doc_perplexity_bins",
    "doc_weighted_sample",
    "orders_pareto",
    "orders_percent_rank",
    "events_ks_test",
    "lineitem_skyline",
    # -- (b) round-11 code-change re-checks: 7 --
    "doc_winnow_pairs",
    "doc_cdc_chunks",
    "doc_cdc_dedup",
    "doc_containment",
    "doc_cosine_pairs",
    "osm_diff_frontier",
    "osm_expire_tiles",
    # -- (c) r05 staleness queue: 14 --
    "events_hll_intersect",
    "events_hll_rollup",
    "events_mad_outliers",
    "events_scd2",
    "events_scd2_join",
    "events_seasonal_naive",
    "events_sliding_topk",
    "events_user_trend",
    "events_value_histogram",
    "events_value_hour_corr",
    "events_zscore_anomaly",
    "lineitem_approx_quantiles",
    "lineitem_basket_pairs",
    "orders_rfm",
    # -- (d) stalest-next fill: 8 r06 rows --
    "doc_distinctive_terms",
    "doc_kfold",
    "doc_ngram_diversity",
    "doc_pack_sequences",
    "doc_pmi_pairs",
    "doc_span_dedup",
    "emb_drift",
    "emb_hamming_recall",
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
