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
# in dict order. ROUND-9 WINDOW: 3 array-flattening fixes + 12 queued
# re-checks + 13 re-checks for this round's minhash/cluster rewrite + 22
# stalest rows. Cumulative registry coverage stays 242/242; after this
# window no query's newest driver row predates r02 except the remaining
# r02 cohort scheduled for round 10 (30 names).
#
# (a) ROUND-8 REDS, FLATTENED (driver comparator cannot canonicalize
#     ArrayType cells — round-8 forensics): doc_inverted_index,
#     emb_quantize, media_features now render postings/qvec/features as
#     comma-joined scalar strings, mirrored in their oracles; the gate and
#     test_oracle_types.py now FAIL any query with Array/Map/Struct output.
# (b) ROUND-8 QUEUED RE-CHECKS (code changed after their last driver row):
#     the 10 text-kernel riders (datapipe/text.py regexp_count rewrite,
#     value equality property-pinned in test_text_fast_ops.py) + both BPE
#     queries after the round-8 greedy-merge fix (datapipe/bpe.py).
# (c) ROUND-9 MINHASH/CLUSTER RE-CHECKS: this round rewrote
#     minhash_signatures_relational (one-pass aggregate fold, exchange
#     deleted), minhash_lsh_pairs (raw-concat band keys via the fold's
#     finish lambda; oracle _sql_minhash_bands mirrored md5(a||b) -> a||b)
#     and cluster.py dedup_representatives (drop-list anti join) +
#     _cc_on_edges (Arrow labels). Byte-identity with the round-2
#     formulations pinned by test_curation.py::TestMinhashFoldParity and
#     the cluster tests; all 17 affected queries re-gated strict green at
#     sf0.01 this session. Every registered query riding the changed
#     kernels is in this window:
#       dedup.py/benchqueries minhash: doc_minhash_pairs, doc_ngram_jaccard,
#         doc_curate, doc_minhash_accuracy(+_sampled), doc_dedup_report,
#         doc_lsh_pr(+_sampled), doc_lsh_pr_curve(+_sampled),
#         doc_minhash_clusters
#       cluster.py: emb_neardup_clusters(+_sampled) (doc_curate,
#         doc_dedup_report, doc_minhash_clusters already above;
#         doc_pairgraph_triangles rides datapipe/graph.py, unchanged — no
#         slot). streaming_neardup_flags rides lsh_band_keys but is
#         pytest-parity-checked, not driver-checked.
#     Untouched this round and NOT re-checked: simhash*, decontaminate
#     (separate kernels), all simjoin/stats/timeseries queries.
#     datapipe/text.py also gained re.escape on the stopword alternation —
#     the escaped pattern is byte-identical for every current word list
#     (pinned by test_stopword_alternation_escape_is_identity), so no
#     additional slots beyond the (b) queue.
#     AUDIT CROSS-CHECK: scripts/recheck_audit.py (new this round —
#     symbol-level git-range -> query flagging) over fd631a7..HEAD flags
#     25 queries; all are in this window except doc_quality_matrix
#     (r08-green), struck because its only flagged edges are the
#     gopher_rules DOCSTRING edit and the byte-identical stopword
#     pattern — neither changes any executed plan.
# (d) STALEST ROWS (round-8 verdict task 4): all 9 queries whose newest
#     row is r01, then the dedup.py/similarity.py round-1 family (their
#     backing modules accreted since r02), then 4 core r02 anchors
#     (tpch_q1 flagship, J1/F2 joins, events_hourly). The remaining 30
#     r02-newest rows (19 TPC-H, 10 osm_*, cust_*) are round 10's fill.
_DRIVER_FIRST = [
    # -- (a) round-8 reds, flattened --
    "doc_inverted_index",
    "emb_quantize",
    "media_features",
    # -- (b) round-8 queued re-checks --
    "doc_text_stats",
    "doc_quality",
    "doc_langid",
    "doc_clean_sample",
    "doc_gopher_rules",
    "doc_rag_retrieve",
    "doc_score_auc",
    "doc_lang_confusion",
    "doc_make_batches",
    "doc_tokenizer_fertility",
    "doc_bpe_merges",
    "doc_bpe_encode",
    # -- (c) round-9 minhash/cluster re-checks --
    "doc_minhash_pairs",
    "doc_ngram_jaccard",
    "doc_curate",
    "doc_minhash_accuracy",
    "doc_minhash_accuracy_sampled",
    "doc_dedup_report",
    "doc_lsh_pr",
    "doc_lsh_pr_sampled",
    "doc_lsh_pr_curve",
    "doc_lsh_pr_curve_sampled",
    "doc_minhash_clusters",
    "emb_neardup_clusters",
    "emb_neardup_clusters_sampled",
    # -- (d) stalest rows: the 9 r01-newest --
    "cust_active_both_years",
    "cust_new_in_2001",
    "events_asof_order",
    "events_rollup",
    "events_sessionize",
    "lineitem_quantiles",
    "orders_events_7d",
    "tpch_q19_disjunct",
    "tpch_q20_nested_semi",
    # -- (d) round-1 dedup/similarity family (modules accreted since r02) --
    "doc_fingerprint",
    "doc_dedup_exact",
    "doc_simhash",
    "doc_simhash_pairs",
    "emb_cosine_topk",
    "emb_ivf_topk",
    "emb_lsh_neardup",
    "emb_lsh_topk",
    "emb_neardup",
    # -- (d) core r02 anchors --
    "tpch_q1",
    "osm_way_resolve",
    "osm_tag_match",
    "events_hourly",
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
