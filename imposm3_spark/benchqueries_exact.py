"""Round-3 batch-13 additions: exact similarity joins, temporal
dimension resolution, and frontier analytics.

* ``doc_ppjoin``            exact Jaccard set-similarity self-join via
                            prefix filtering (AllPairs/PPJoin) — recall 1
                            without LSH probabilism
* ``doc_substring_dedup``   ExactSubstr-style duplicated-substring span
                            detection with per-document span merging
* ``events_scd2_join``      point-in-interval (as-of the fact timestamp)
                            join of purchase facts onto an SCD2 dimension
                            built from the users' non-purchase k-buckets
* ``lineitem_skyline``      Pareto frontier (skyline) of parts on
                            (total quantity max, min line price min) via
                            a two-phase exclusive running max
* ``events_cusum``          exact CUSUM mean-shift changepoint per event
                            type in DECIMAL(38,0)/HUGEINT arithmetic
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imposm3_spark.benchqueries import _SQL_SHINGLES, _t, register
from imposm3_spark.datapipe import frontier as fr
from imposm3_spark.datapipe import simjoin as sj
from imposm3_spark.datapipe import temporal as tp
from imposm3_spark.datapipe import timeseries as ts_

_PPJOIN_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []
              ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tokens
  FROM documents
), sized AS MATERIALIZED (
  SELECT doc_id, sh, len(sh) AS n
  FROM (SELECT doc_id, list_distinct({_SQL_SHINGLES}) AS sh FROM toks)
  WHERE len(sh) > 0
), tok AS (
  SELECT doc_id, n, unnest(sh) AS t FROM sized
), inter AS (
  -- exact |A ∩ B| by counting shared distinct shingles; any pair with
  -- J >= 0.5 shares at least one shingle, so nothing is missed
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter,
         any_value(a.n) AS na, any_value(b.n) AS nb
  FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, inter, na + nb - inter AS uni,
       round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard
FROM inter
WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5
"""


@register("doc_ppjoin", _PPJOIN_ORACLE)
def doc_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.5 self-join over 3-gram shingle sets. The
    oracle is the naive all-pairs join; the Spark plan is the prefix-
    filtered equi-join (datapipe/simjoin.py) — identical output, recall 1
    proven by the prefix pigeonhole, no O(n^2) stage anywhere."""
    return sj.ppjoin_pairs(_t(spark, sf_dir, "documents"), threshold=0.5, k=3)


_SUBSTR_ORACLE = """
WITH pos AS MATERIALIZED (
  SELECT doc_id, i, substr(text, CAST(i AS INT), 40) AS g
  FROM documents,
       LATERAL (SELECT unnest(range(1, greatest(length(text) - 39, 0) + 1)) AS i)
), dup AS (
  SELECT g FROM pos GROUP BY g HAVING count(*) >= 2
), hits AS (
  SELECT doc_id, i FROM pos WHERE g IN (SELECT g FROM dup)
), flagged AS (
  SELECT doc_id, i,
         CASE WHEN lag(i) OVER w IS NULL OR i > lag(i) OVER w + 40
              THEN 1 ELSE 0 END AS new_span
  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY i)
), spans AS (
  SELECT doc_id, i,
         sum(new_span) OVER (PARTITION BY doc_id ORDER BY i
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS span
  FROM flagged
)
SELECT doc_id, min(i) AS span_start,
       max(i) - min(i) + 40 AS span_len,
       count(*) AS n_grams
FROM spans GROUP BY doc_id, span
"""


@register("doc_substring_dedup", _SUBSTR_ORACLE)
def doc_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated 40-char substring spans across the corpus
    (the ExactSubstr dedup step): JVM-side gram enumeration, one exact
    gram-keyed multiplicity count, semi-join mark, keyed-window island
    merge (datapipe/simjoin.py)."""
    return sj.duplicated_substring_spans(
        _t(spark, sf_dir, "documents"), gram_len=40, min_count=2
    )


_SCD2_JOIN_ORACLE = """
WITH dim AS (
  SELECT user_id, ts, event_id,
         CAST(json_extract(props, '$.k') AS BIGINT) // 25 AS kb
  FROM events WHERE event_type <> 'purchase'
), runs AS (
  SELECT user_id, ts, event_id, kb,
         CASE WHEN lag(kb) OVER w IS NULL OR lag(kb) OVER w <> kb
              THEN 1 ELSE 0 END AS chg
  FROM dim
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, kb,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM runs
), iv0 AS (
  SELECT user_id, run, min(ts) AS valid_from, arg_min(kb, ts) AS regime
  FROM numbered GROUP BY 1, 2
), iv AS MATERIALIZED (
  SELECT user_id, regime, valid_from,
         lead(valid_from) OVER w2 AS valid_to
  FROM iv0 WINDOW w2 AS (PARTITION BY user_id ORDER BY run)
), pts AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, v.regime, v.valid_from, v.valid_to
FROM pts p JOIN iv v
  ON v.user_id = p.user_id
 AND p.ts >= v.valid_from
 AND (v.valid_to IS NULL OR p.ts < v.valid_to)
"""


@register("events_scd2_join", _SCD2_JOIN_ORACLE)
def events_scd2_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension resolution: each purchase fact joins the SCD2
    interval (built from the user's non-purchase events' k-bucket) valid
    at the fact's timestamp. Month-binned range join
    (datapipe/temporal.py) — per-fact fanout is intervals-per-month, and
    the disjointness of SCD2 intervals makes the exact-bound filter
    yield at most one match without dedup."""
    ev = _t(spark, sf_dir, "events")
    dim = ev.where(F.col("event_type") != "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(
            F.get_json_object("props", "$.k").cast("bigint") / F.lit(25)
        ).alias("kb"),
    )
    iv = ts_.scd2_intervals(dim, attr_col="kb").select(
        "user_id", F.col("value").alias("regime"), "valid_from", "valid_to"
    )
    pts = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return tp.interval_point_join(
        pts, iv, point_key="user_id", point_ts="ts"
    )


_SKYLINE_ORACLE = """
WITH p AS MATERIALIZED (
  SELECT l_partkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
         min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS price_c
  FROM lineitem GROUP BY 1
)
SELECT a.l_partkey, a.qty, a.price_c
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.qty >= a.qty AND b.price_c <= a.price_c
    AND (b.qty > a.qty OR b.price_c < a.price_c)
)
"""


@register("lineitem_skyline", _SKYLINE_ORACLE)
def lineitem_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts: maximize total ordered quantity,
    minimize the cheapest line price (integer cents). The oracle is the
    O(n^2) NOT EXISTS skyline; the Spark plan is the two-phase exclusive
    running max over price levels (datapipe/frontier.py) — no quadratic
    stage, no single-task window."""
    li = _t(spark, sf_dir, "lineitem")
    parts = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
        F.min(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
            "price_c"
        ),
    )
    return fr.skyline_max_min(parts, "l_partkey", "qty", "price_c")


_CUSUM_ORACLE = """
WITH src AS (
  SELECT event_type, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), rows_ AS (
  SELECT event_type, ts, event_id,
         sum(c) OVER (PARTITION BY event_type ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS i,
         sum(c) OVER (PARTITION BY event_type) AS s,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM src
), d AS (
  SELECT event_type, ts, i, n,
         CAST(n AS HUGEINT) * CAST(cs AS HUGEINT)
         - CAST(i AS HUGEINT) * CAST(s AS HUGEINT) AS dd
  FROM rows_
)
SELECT event_type, ts AS cp_ts, i AS cp_index, n,
       round(CAST(dd AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0), 6) AS cusum
FROM d
QUALIFY row_number() OVER (PARTITION BY event_type
                           ORDER BY abs(dd) DESC, i ASC) = 1
"""


@register("events_cusum", _CUSUM_ORACLE)
def events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact CUSUM mean-shift changepoint per event type: integer-cents
    cumulative sums, the scaled deviation D_i = n*cs_i - i*s compared in
    DECIMAL(38,0) (HUGEINT in the oracle), earliest-position tie-break
    (datapipe/timeseries.py cusum_changepoint)."""
    return ts_.cusum_changepoint(_t(spark, sf_dir, "events"))


_COSINE_PAIRS_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []
              ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tokens
  FROM documents
), tc AS MATERIALIZED (
  SELECT doc_id, t, count(*) AS c
  FROM (SELECT doc_id, unnest({_SQL_SHINGLES}) AS t FROM toks) GROUP BY 1, 2
), norms AS (
  SELECT doc_id, sum(c * c) AS nrm FROM tc GROUP BY 1
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(sum(a.c * b.c) AS BIGINT) AS dot
  FROM tc a JOIN tc b ON a.t = b.t AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, dot,
       CAST(na.nrm AS BIGINT) AS nrm_a,
       CAST(nb.nrm AS BIGINT) AS nrm_b
FROM pairs
JOIN norms na ON na.doc_id = id_a
JOIN norms nb ON nb.doc_id = id_b
WHERE CAST(dot AS HUGEINT) * CAST(dot AS HUGEINT) * 100
      >= CAST(na.nrm AS HUGEINT) * CAST(nb.nrm AS HUGEINT) * 81
"""


@register("doc_cosine_pairs", _COSINE_PAIRS_ORACLE)
def doc_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle-count cosine >= 9/10 similarity self-join via
    the inverted-index term join, thresholded and compared as PURE
    integers: dot^2 * q^2 >= nrm_a * nrm_b * p^2 — no float, no sqrt, no
    round, so no engine-version skew in the compared cells. Shingle terms
    (not unigrams) keep the inverted-index fanout sub-quadratic
    (datapipe/simjoin.py cosine_pairs)."""
    return sj.cosine_pairs(
        _t(spark, sf_dir, "documents"), k=3, threshold_ratio=(9, 10)
    )


_WINNOW_ORACLE = """
WITH pos AS (
  SELECT doc_id, i,
         ('0x' || substr(md5(substr(text, CAST(i AS INT), 20)), 1, 15))::BIGINT
           AS h
  FROM documents,
       LATERAL (SELECT unnest(range(1, greatest(length(text) - 19, 0) + 1)) AS i)
), picked AS (
  SELECT doc_id,
         min({'h': h, 'pos': i}) OVER (PARTITION BY doc_id ORDER BY i
                                       ROWS BETWEEN CURRENT ROW
                                       AND 7 FOLLOWING) AS m
  FROM pos
), fps AS (
  SELECT DISTINCT doc_id, m.h AS fp FROM picked
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 2
"""


@register("doc_winnow_pairs", _WINNOW_ORACLE)
def doc_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint candidate pairs: 20-char gram md5
    hashes, window-8 struct-min selection (lexicographic (hash, pos) —
    deterministic tie-break), docs sharing >= 2 distinct fingerprints
    (datapipe/simjoin.py winnow_pairs). Any shared substring of length
    >= 27 guarantees a shared fingerprint."""
    return sj.winnow_pairs(
        _t(spark, sf_dir, "documents"), k=20, w=8, min_shared=2
    )


_ENTROPY_CATS = ["click", "error", "purchase", "signup", "view"]

_ENTROPY_ORACLE = """
WITH g AS (
  SELECT user_id, count(*) AS n,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c0,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2,
         sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS c3,
         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c4
  FROM events GROUP BY 1
)
SELECT user_id, n,
       round(ln(CAST(n AS DOUBLE))
             - (CASE WHEN c0 > 0 THEN CAST(c0 AS DOUBLE) * ln(CAST(c0 AS DOUBLE)) ELSE 0.0 END
                + CASE WHEN c1 > 0 THEN CAST(c1 AS DOUBLE) * ln(CAST(c1 AS DOUBLE)) ELSE 0.0 END
                + CASE WHEN c2 > 0 THEN CAST(c2 AS DOUBLE) * ln(CAST(c2 AS DOUBLE)) ELSE 0.0 END
                + CASE WHEN c3 > 0 THEN CAST(c3 AS DOUBLE) * ln(CAST(c3 AS DOUBLE)) ELSE 0.0 END
                + CASE WHEN c4 > 0 THEN CAST(c4 AS DOUBLE) * ln(CAST(c4 AS DOUBLE)) ELSE 0.0 END)
               / CAST(n AS DOUBLE), 6) AS entropy
FROM g
"""


@register("events_entropy", _ENTROPY_ORACLE)
def events_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the event-type distribution: one
    keyed aggregation with the category dimension pivoted into
    conditional counts; the entropy is a single fixed-order term fold
    (datapipe/stats.py categorical_entropy) — bit-identical doubles."""
    from imposm3_spark.datapipe import stats as st

    return st.categorical_entropy(
        _t(spark, sf_dir, "events"), "user_id", "event_type", _ENTROPY_CATS
    )


_AUTOCORR_ORACLE = """
WITH hrs AS (
  SELECT event_type AS k, date_trunc('hour', ts) AS h,
         sum(CAST(round(value * 100) AS BIGINT)) AS tot
  FROM events GROUP BY 1, 2
), p AS (
  SELECT a.k, CAST(a.tot AS HUGEINT) AS x, CAST(b.tot AS HUGEINT) AS y
  FROM hrs a JOIN hrs b ON a.k = b.k AND b.h = a.h + INTERVAL 1 HOUR
), m AS (
  SELECT k, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM p GROUP BY 1
)
SELECT event_type, n, r FROM (
  SELECT k AS event_type, n,
         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
         round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r
  FROM m
) WHERE vx > 0 AND vy > 0
"""


@register("events_autocorr", _AUTOCORR_ORACLE)
def events_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the hourly cent-total series per event
    type: hour-bucketed BIGINT sums, (key, hour+1) equi-join,
    DECIMAL(38,0) sufficient statistics, fixed-order Pearson expression
    (datapipe/timeseries.py hourly_lag_autocorr)."""
    return ts_.hourly_lag_autocorr(_t(spark, sf_dir, "events"), lag_hours=1)
