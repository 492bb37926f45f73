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
# in dict order. ROUND-10 WINDOW: the 30 remaining r02-newest rows (the
# staleness queue reserved by the round-9 window comment — 18 TPC-H, 11
# osm_*, events_top_types_per_user) + 2 re-checks for this round's code
# changes + the 18 alphabetically-first r05-newest rows. After this window
# no query's newest driver row predates r05.
#
# (a) R02 STALENESS QUEUE, DRAINED (round-9 verdict task 1): every query
#     whose newest driver row is r02. All 30 pass the full-registry strict
#     gate (scripts/check_oracle.py) at sf0.1 and sf0.01 on current code;
#     seven rounds of module accretion sit on top of those rows, so the
#     driver re-confirms them here.
# (b) ROUND-10 CODE-CHANGE RE-CHECKS (scripts/recheck_audit.py over
#     e457c43..HEAD): doc_curate (cluster.dedup_representatives gained an
#     explicit NULL-id filter — ADVICE r9; value-identical on non-null ids,
#     pinned by tests, but the executed plan changed) and media_features
#     (datapipe/multimodal.py gained the stdlib-PNG decode tier; the
#     registered query pins decoder="stub" so its output is unchanged —
#     slot spent anyway since the module's import surface changed).
#     streaming_neardup_flags also rides changed code (md5 band keys
#     restored on the stateful path — ADVICE r9) but is pytest-parity-
#     checked, not driver-checked. The diff/runner + diff/update +
#     streaming/replication rewrites (frontier pinning, broadcast closure
#     pruning for benchdiff) touch NO registered-query symbol: the audit
#     flags only doc_curate; osm_diff_frontier/osm_expire_tiles ride
#     refindex/expire.tiles which are untouched — both re-check via (a)
#     anyway.
# (c) STALEST-NEXT FILL: 17 of the alphabetically-first r05-newest rows
#     plus emb_knn_graph_sampled (it rides the knn_graph kernel rewritten
#     this round after the sf1 soak caught its unbounded per-task Arrow
#     output — see docs/ROUND10.md §3 — so it re-checks alongside
#     emb_knn_graph; events_hll_intersect yielded its slot and stays in
#     round 11's queue with the remaining 15 r05 rows).
_DRIVER_FIRST = [
    # -- (a) r02 staleness queue: 18 TPC-H + events_top_types_per_user --
    "tpch_q2_mincost",
    "tpch_q3",
    "tpch_q4_semi",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7_volume",
    "tpch_q8_share",
    "tpch_q9_profit",
    "tpch_q10_returns",
    "tpch_q11_stock",
    "tpch_q13_custdist",
    "tpch_q14_promo",
    "tpch_q15_topsupp",
    "tpch_q16_suppcnt",
    "tpch_q17_smallqty",
    "tpch_q18",
    "tpch_q21_wait",
    "tpch_q22_anti",
    "events_top_types_per_user",
    # -- (a) r02 staleness queue: 11 osm_* --
    "osm_closed_way_dispatch",
    "osm_column_types",
    "osm_diff_frontier",
    "osm_expire_tiles",
    "osm_hstore_render",
    "osm_id_mangle",
    "osm_merc_roundtrip",
    "osm_metadata",
    "osm_rel_resolve",
    "osm_tag_prefilter",
    "osm_wayzorder",
    # -- (b) round-10 code-change re-checks --
    "doc_curate",
    "media_features",
    # -- (c) stalest-next fill: 18 r05 rows --
    "cust_fuzzy_pairs",
    "doc_bigram_nll",
    "doc_bm25_topk",
    "doc_contamination_score",
    "doc_nb_confusion",
    "doc_substring_dedup",
    "doc_weighted_sample",
    "emb_kmeans",
    "emb_kmeans_inertia",
    "emb_knn_graph",
    "emb_knn_graph_sampled",
    "emb_lsh_recall",
    "emb_pca_top",
    "events_approx_distinct",
    "events_autocorr",
    "events_cms_heavy",
    "events_cusum",
    "events_entropy",
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
