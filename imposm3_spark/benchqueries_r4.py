"""Round-4 additions: closed-form multiple regression, sequential path
mining, last-touch attribution, inter-arrival cadence profiling, and
content-defined chunking with chunk-level dedup.

Registered into the same QUERIES/ORACLES registry as benchqueries:

* ``events_ols2``        per-type two-feature OLS (Cramer's rule over
                         exact integer sufficient statistics)
* ``events_user_paths``  top first-3-event journeys (Sankey aggregation)
* ``events_attribution`` last-touch conversion attribution
* ``events_bot_cadence`` per-user inter-arrival regularity profile
* ``doc_cdc_chunks``     content-defined chunk table (rsync/FastCDC family)
* ``doc_cdc_dedup``      cross-doc shared-chunk report over CDC chunks
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from imposm3_spark.benchqueries import _t, register
from imposm3_spark.datapipe import chunking as ck
from imposm3_spark.datapipe import mining as mn
from imposm3_spark.datapipe import stats as st
from imposm3_spark.datapipe.evaluation import sampled_docs_sql
from imposm3_spark.datapipe.stats import (
    CADENCE_CV,
    OLS2_DET,
    OLS2_DET0,
    OLS2_DET1,
    OLS2_DET2,
)


@register(
    "events_ols2",
    # the determinant expressions are the SAME strings Spark evaluates
    # (stats.OLS2_DET*), so every IEEE rounding step matches.
    f"""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS y,
             CAST(hour(ts) AS BIGINT) AS x1,
             CAST(date_diff('day', DATE '2001-01-01', CAST(ts AS DATE)) AS BIGINT) AS x2
      FROM events
    ), a AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
             CAST(sum(x1 * x1) AS BIGINT) AS s11,
             CAST(sum(x1 * x2) AS BIGINT) AS s12,
             CAST(sum(x2 * x2) AS BIGINT) AS s22,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x1 * y) AS BIGINT) AS s1y,
             CAST(sum(x2 * y) AS BIGINT) AS s2y
      FROM c GROUP BY event_type
    )
    SELECT event_type, n,
           round({OLS2_DET0} / {OLS2_DET}, 6) AS b0_cents,
           round({OLS2_DET1} / {OLS2_DET}, 6) AS b1_cents_per_hour,
           round({OLS2_DET2} / {OLS2_DET}, 6) AS b2_cents_per_day
    FROM a WHERE abs({OLS2_DET}) > 1e-6
    """,
)
def events_ols2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature closed-form regression per event type: cents ~ b0 +
    b1*hour + b2*day_index via Cramer's rule on exact BIGINT normal
    equations (stats.group_ols2) — one aggregation pass, no solver."""
    return st.group_ols2(_t(spark, sf_dir, "events"))


@register(
    "events_user_paths",
    """
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), p AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path,
             count(*) AS k
      FROM r WHERE rn <= 3 GROUP BY user_id
    )
    SELECT path, count(*) AS n_users FROM p WHERE k = 3
    GROUP BY path ORDER BY n_users DESC, path LIMIT 10
    """,
)
def events_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 first-3-event journeys (mining.top_paths) — the Sankey /
    onboarding-funnel path aggregation with deterministic tie-breaks."""
    return mn.top_paths(_t(spark, sf_dir, "events"))


@register(
    "events_attribution",
    """
    WITH t AS (
      SELECT user_id, event_type, value,
             last_value(CASE WHEN event_type != 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      FROM events
    )
    SELECT coalesce(touch, '(none)') AS channel, count(*) AS conversions,
           round(CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                      AS DOUBLE) / 100.0, 2) AS revenue
    FROM t WHERE event_type = 'purchase' GROUP BY channel
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution (mining.last_touch_attribution): every
    purchase credits the user's most recent non-purchase event type;
    revenue sums exact cents."""
    return mn.last_touch_attribution(_t(spark, sf_dir, "events"))


@register(
    "events_bot_cadence",
    f"""
    WITH s AS (
      SELECT user_id, event_id,
             date_diff('second', TIMESTAMP '2001-01-01 00:00:00', ts) AS sec
      FROM events
    ), g AS (
      SELECT user_id,
             sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS gap
      FROM s
    ), a AS (
      SELECT user_id, count(*) AS n, CAST(sum(gap) AS BIGINT) AS s,
             CAST(sum(gap * gap) AS BIGINT) AS ss,
             quantile_cont(gap, 0.5) AS median_gap_s
      FROM g WHERE gap IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n, round(median_gap_s, 4) AS median_gap_s,
           round({CADENCE_CV}, 6) AS cv,
           {CADENCE_CV} < 0.5 AS is_regular
    FROM a WHERE n >= 8 AND s > 0
    """,
)
def events_bot_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival cadence profile (stats.cadence_stats): gap
    count, exact median gap, coefficient of variation — the automation /
    bot-detection signal (schedulers have cv near 0, humans are bursty)."""
    return st.cadence_stats(_t(spark, sf_dir, "events"))


_SQL_CDC = """
    WITH d AS (
      SELECT doc_id, text, length(text) AS n
      FROM documents WHERE length(text) > 0
    ), cuts AS (
      SELECT doc_id, text, n,
             list_filter(range(1, greatest(n - 15, 0) + 1),
               i -> (('0x' || substr(md5(substr(text, i, 16)), 1, 15))::BIGINT)
                    % 64 = 0) AS cut
      FROM d
    ), ends AS (
      SELECT doc_id, text,
             list_sort(list_distinct(
               list_append(list_transform(cut, i -> i + 15), CAST(n AS BIGINT)))) AS e
      FROM cuts
    ), spans AS (
      SELECT doc_id, text,
             list_filter(list_transform(range(1, len(e) + 1),
               j -> {'s': CASE WHEN j = 1 THEN 0 ELSE e[j - 1] END + 1,
                     'e': e[j]}),
               x -> x.e >= x.s) AS sp
      FROM ends
    )
    SELECT doc_id, CAST(j AS INT) AS chunk_idx,
           CAST(sp[j].s AS INT) AS start,
           CAST(sp[j].e - sp[j].s + 1 AS INT) AS chunk_len,
           md5(substr(text, CAST(sp[j].s AS INT),
                      CAST(sp[j].e - sp[j].s + 1 AS INT))) AS chunk_hash
    FROM spans, unnest(range(1, len(sp) + 1)) AS u(j)
    """


@register("doc_cdc_chunks", _SQL_CDC)
def doc_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (chunking.cdc_chunks): chunk boundaries
    follow a 16-char rolling window's md5 mod 64, so identical regions in
    shifted copies re-align to identical chunks — the property offset
    shingling lacks."""
    return ck.cdc_chunks(_t(spark, sf_dir, "documents"))


@register(
    "doc_cdc_dedup",
    f"""
    WITH chunks AS ({_SQL_CDC})
    SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_occurrences, max(chunk_len) AS chunk_len
    FROM chunks GROUP BY chunk_hash HAVING count(DISTINCT doc_id) >= 2
    """,
)
def doc_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document shared-chunk report (chunking.cdc_shared_chunks):
    chunk contents appearing in 2+ docs — the delta-dedup output CDC
    chunking exists for."""
    return ck.cdc_shared_chunks(_t(spark, sf_dir, "documents"))


@register(
    "emb_hard_negatives",
    """
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qvec, label AS qlabel
      FROM embeddings WHERE vec_id < 5
    ), scored AS (
      SELECT q.query_id, e.vec_id AS neg_id, e.label AS neg_label,
             round(list_cosine_similarity(CAST(q.qvec AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])), 6) AS sim
      FROM q CROSS JOIN embeddings e WHERE e.label != q.qlabel
    )
    SELECT query_id, neg_id, rank, sim, neg_label FROM (
      SELECT query_id, neg_id, neg_label, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neg_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining (similarity.hard_negatives): the
    top-5 most-similar OTHER-label vectors per query — the highest-loss
    negatives an InfoNCE/triplet sampler selects."""
    from imposm3_spark.datapipe import similarity as sim
    from pyspark.sql import functions as F

    emb = _t(spark, sf_dir, "embeddings")
    return sim.hard_negatives(emb, emb.filter(F.col("vec_id") < 5), k=5)


@register(
    "doc_ngram_diversity",
    r"""
    WITH toks AS (
      SELECT source,
             CASE WHEN trim(text) = '' THEN []
                  ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tokens
      FROM documents
    ), uni AS (
      SELECT source, count(*) AS tokens_total, count(DISTINCT g) AS d1
      FROM (SELECT source, unnest(tokens) AS g FROM toks) GROUP BY source
    ), bi AS (
      SELECT source, count(*) AS bigrams_total, count(DISTINCT g) AS d2
      FROM (SELECT source, tokens[i] || ' ' || tokens[i+1] AS g
            FROM toks, unnest(range(1, len(tokens))) AS u(i)) GROUP BY source
    ), d AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
    SELECT d.source, n_docs, coalesce(tokens_total, 0) AS tokens_total,
           round(CAST(d1 AS DOUBLE) / CAST(tokens_total AS DOUBLE), 6) AS distinct1_ratio,
           round(CAST(d2 AS DOUBLE) / CAST(bigrams_total AS DOUBLE), 6) AS distinct2_ratio
    FROM d LEFT JOIN uni USING (source) LEFT JOIN bi USING (source)
    """,
)
def doc_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n diversity per source (text.ngram_diversity): low
    distinct-1/distinct-2 ratios flag templated or mode-collapsed text."""
    from imposm3_spark.datapipe import text as tx

    return tx.ngram_diversity(_t(spark, sf_dir, "documents"))


@register(
    "events_interval_overlap",
    """
    WITH iv AS (
      SELECT user_id, event_type, min(ts) AS f,
             max(ts) + INTERVAL 1 SECOND AS t
      FROM events GROUP BY user_id, event_type
    )
    SELECT a.user_id, a.event_type AS type_a, b.event_type AS type_b,
           date_diff('second', greatest(a.f, b.f), least(a.t, b.t)) AS overlap_s
    FROM iv a JOIN iv b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
     AND a.f < b.t AND b.f < a.t
    """,
)
def events_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-interval overlap join (temporal.interval_overlap_join):
    per-user activity intervals of distinct event types that overlap,
    with exact overlap seconds — the generic range-join primitive,
    month-binned for scale."""
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe.temporal import interval_overlap_join

    ev = _t(spark, sf_dir, "events")
    iv = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("f"),
        (F.max("ts") + F.expr("INTERVAL 1 SECOND")).alias("t"),
    )
    left = iv.select(
        "user_id", F.col("event_type").alias("type_a"),
        F.col("f").alias("a_from"), F.col("t").alias("a_to"),
    )
    right = iv.select(
        "user_id", F.col("event_type").alias("type_b"),
        F.col("f").alias("b_from"), F.col("t").alias("b_to"),
    )
    joined = interval_overlap_join(
        left, right, key="user_id",
        l_from="a_from", l_to="a_to", r_from="b_from", r_to="b_to",
    )
    return joined.filter(F.col("type_a") < F.col("type_b")).select(
        "user_id", "type_a", "type_b", "overlap_s"
    )


@register(
    "events_mg_heavy",
    # invariant oracle (the events_cms_heavy / approx-distinct pattern):
    # the sketch content depends on partitioning, so the hashed columns
    # are the deterministic guaranteed-present key set (exact*(k+1) > N)
    # and the guarantee flags, which must both hold for ANY partitioning.
    """
    WITH c AS (
      SELECT substr(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR), 1, 1) AS digit
      FROM events
    ), e AS (SELECT digit, count(*) AS exact FROM c GROUP BY digit),
    t AS (SELECT CAST(sum(exact) AS BIGINT) AS n FROM e)
    SELECT digit, exact, TRUE AS present, TRUE AS bound_ok
    FROM e, t WHERE exact * 7 > n
    """,
)
def events_mg_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries mergeable heavy hitters (stats.heavy_hitters_check)
    over the leading digit of event cents (a naturally skewed key): the
    merged 6-counter sketch must contain every key with exact > N/7 and
    bound it within [est_lower, est_lower + E]."""
    from pyspark.sql import functions as F

    ev = _t(spark, sf_dir, "events")
    digit = F.substring(
        F.round(F.col("value") * 100).cast("bigint").cast("string"), 1, 1
    )
    return st.heavy_hitters_check(ev.select(digit.alias("digit")), "digit", k=6)


@register(
    "events_holt",
    """
    WITH RECURSIVE c AS MATERIALIZED (
      SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), r(user_id, rn, event_id, l, b) AS (
      -- DuckDB's // truncates toward zero; Python floors. The divisors
      -- are powers of two, so floor(x / 4.0) is exact in doubles and
      -- reproduces the floor semantics bit-for-bit.
      SELECT user_id, rn, event_id, cents, CAST(0 AS BIGINT) FROM c WHERE rn = 1
      UNION ALL
      SELECT c.user_id, c.rn, c.event_id,
             CAST(floor((c.cents + 3 * (r.l + r.b)) / 4.0) AS BIGINT),
             CAST(floor(((CAST(floor((c.cents + 3 * (r.l + r.b)) / 4.0) AS BIGINT)
                          - r.l) + r.b) / 2.0) AS BIGINT)
      FROM r JOIN c ON c.user_id = r.user_id AND c.rn = r.rn + 1
    )
    SELECT event_id AS id, user_id AS key, l AS level_cents, b AS trend_cents
    FROM r
    """,
)
def events_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level+trend) per user in exact
    fixed-point arithmetic (timeseries.holt_fixed_point) — bit-identical
    to the recursive-CTE oracle; both sides use FLOOR division because
    the trend state goes negative."""
    from imposm3_spark.datapipe import timeseries as ts_

    return ts_.holt_fixed_point(_t(spark, sf_dir, "events"))


def _sql_containment() -> str:
    from imposm3_spark.benchqueries import _SQL_SHINGLES

    return rf"""
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
      -- directional: group keeps BOTH orders (a != b, no a < b cut)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter,
             any_value(a.n) AS na
      FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id != b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, inter, na,
           round(CAST(inter AS DOUBLE) / CAST(na AS DOUBLE), 6) AS containment
    FROM inter
    WHERE CAST(inter AS DOUBLE) / CAST(na AS DOUBLE) >= 0.8
    """


@register("doc_containment", _sql_containment())
def doc_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment >= 0.8 self-join over 3-gram shingle sets
    (simjoin.containment_pairs): catches sub-document duplication that
    symmetric Jaccard misses. Oracle is the naive all-pairs join; the
    Spark plan joins A-prefix tokens against the full index — recall 1
    by the containment pigeonhole, no quadratic stage."""
    from imposm3_spark.datapipe import simjoin as sj

    return sj.containment_pairs(_t(spark, sf_dir, "documents"), threshold=0.8, k=3)


@register(
    "events_funnel_window",
    """
    WITH a1 AS (
      SELECT user_id AS k, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ), a2 AS (
      SELECT e.user_id AS k, min(e.ts) AS t2
      FROM events e JOIN a1 ON a1.k = e.user_id
      WHERE e.event_type = 'click' AND e.ts > a1.t1
        AND e.ts <= a1.t1 + INTERVAL 24 HOURS
      GROUP BY 1
    ), a3 AS (
      SELECT e.user_id AS k, min(e.ts) AS t3
      FROM events e JOIN a2 ON a2.k = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > a2.t2
        AND e.ts <= a2.t2 + INTERVAL 24 HOURS
      GROUP BY 1
    )
    SELECT a1.k AS user_id,
           1 + CASE WHEN a2.k IS NOT NULL THEN 1 ELSE 0 END
             + CASE WHEN a3.k IS NOT NULL THEN 1 ELSE 0 END AS stage,
           date_diff('second', a1.t1, a3.t3) AS convert_s
    FROM a1 LEFT JOIN a2 ON a1.k = a2.k LEFT JOIN a3 ON a1.k = a3.k
    """,
)
def events_funnel_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained funnel (mining.funnel_timebound): signup ->
    click -> purchase where each step lands within 24h of the previous
    step's first qualifying occurrence — the realistic variant of
    events_funnel."""
    return mn.funnel_timebound(_t(spark, sf_dir, "events"))


@register(
    "events_wau",
    """
    WITH active AS (
      SELECT DISTINCT date_trunc('day', ts) AS d, user_id AS k FROM events
    ), cap AS (SELECT max(d) AS dmax FROM active),
    grid AS (
      SELECT a.k, a.d + o * INTERVAL 1 DAY AS g
      FROM active a, cap, unnest(range(0, 7)) AS u(o)
      WHERE a.d + o * INTERVAL 1 DAY <= cap.dmax
    ),
    wau AS (SELECT g, count(DISTINCT k) AS wau FROM grid GROUP BY g),
    dau AS (SELECT d AS g, count(DISTINCT k) AS dau FROM active GROUP BY d)
    SELECT CAST(w.g AS DATE) AS day, coalesce(dau, 0) AS dau, wau,
           round(CAST(coalesce(dau, 0) AS DOUBLE) / CAST(wau AS DOUBLE), 6)
             AS stickiness
    FROM wau w LEFT JOIN dau ON dau.g = w.g
    """,
)
def events_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users + DAU/WAU stickiness per day
    (stats.rolling_active_users): exact sliding-window distinct via the
    activity-table explode, no window function."""
    return st.rolling_active_users(_t(spark, sf_dir, "events"))


@register(
    "emb_drift",
    """
    WITH e AS (
      SELECT label, vec_id % 2 AS half, pos,
             CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT) AS q
      FROM (SELECT label, vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings)
    ), a AS (
      SELECT label, pos, CAST(sum(q) AS BIGINT) AS s_a, count(*) AS n_a
      FROM e WHERE half = 0 GROUP BY 1, 2
    ), b AS (
      SELECT label, pos, CAST(sum(q) AS BIGINT) AS s_b, count(*) AS n_b
      FROM e WHERE half = 1 GROUP BY 1, 2
    ), j AS (
      SELECT a.label, CAST(s_a * n_b - s_b * n_a AS HUGEINT) AS diff, n_a, n_b
      FROM a JOIN b USING (label, pos)
    ), g AS (
      SELECT label, max(n_a) AS na, max(n_b) AS nb, sum(diff * diff) AS ss
      FROM j GROUP BY label
    )
    SELECT label, na, nb,
           round(sqrt(CAST(ss AS DOUBLE))
                 / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) / 1048576.0, 6)
             AS l2_shift
    FROM g
    """,
)
def emb_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid drift between the even/odd vec_id slices
    (similarity.centroid_drift): quantized integer sufficient statistics,
    DECIMAL(38,0)/HUGEINT squared-diff accumulator, one final float
    expression — the batch-vs-reference distribution monitor."""
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe import similarity as sim

    emb = _t(spark, sf_dir, "embeddings")
    return sim.centroid_drift(
        emb.filter(F.col("vec_id") % 2 == 0), emb.filter(F.col("vec_id") % 2 == 1)
    )


@register(
    "orders_pareto",
    """
    WITH c AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ), d AS (
      SELECT cents, ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS bucket
      FROM c
    ), a AS (
      SELECT bucket, count(*) AS customers, CAST(sum(cents) AS BIGINT) AS cents
      FROM d GROUP BY bucket
    ), t AS (SELECT CAST(sum(cents) AS BIGINT) AS tot FROM a)
    SELECT x.bucket, x.customers,
           round(CAST(x.cents AS DOUBLE) / 100.0, 2) AS revenue,
           round(CAST(CAST(sum(y.cents) AS BIGINT) AS DOUBLE)
                 / CAST(t.tot AS DOUBLE), 6) AS cum_share
    FROM a x JOIN a y ON y.bucket <= x.bucket, t
    GROUP BY x.bucket, x.customers, x.cents, t.tot
    """,
)
def orders_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration curve (stats.pareto_curve): customers
    ranked by exact revenue cents into 10 rank-bands with cumulative
    share — two-phase global ranking, no single-task window."""
    from pyspark.sql import functions as F

    o = _t(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
    )
    return st.pareto_curve(c, "o_custkey", "cents")


def _sql_dedup_report() -> str:
    from imposm3_spark.benchqueries import _sql_minhash_bands

    inner = (
        _sql_minhash_bands().replace("WITH toks", "WITH RECURSIVE toks", 1)
        + """
    , pairs AS (
      SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc < b.doc
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ), reach(node, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id, min(lbl) AS component FROM reach GROUP BY node
    """
    )
    return f"""
    SELECT cluster_size, count(*) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
    FROM (
      SELECT component, count(*) AS cluster_size
      FROM ({inner}) GROUP BY component
    ) GROUP BY cluster_size
    """


@register("doc_dedup_report", _sql_dedup_report())
def doc_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup summary report: the cluster-size histogram of the
    MinHash-LSH duplicate graph (how much of the corpus is singletons vs
    2-clusters vs larger families) — the one-page artifact a dedup pass
    is judged by before anyone deletes data."""
    from pyspark.sql import functions as F

    from imposm3_spark.benchqueries import _t as _tt
    from imposm3_spark.datapipe import dedup as dd
    from imposm3_spark.datapipe.cluster import connected_components

    docs = _tt(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(docs)
    clusters = connected_components(
        docs.select("doc_id"), pairs, node_col="doc_id", src="id_a", dst="id_b"
    )
    sizes = clusters.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(F.count("*").alias("n_clusters")).select(
        "cluster_size",
        "n_clusters",
        (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
    )


@register(
    "events_seq_pairs",
    """
    WITH iv AS (
      SELECT user_id AS k, event_type AS c, min(ts) AS tmin, max(ts) AS tmax
      FROM events GROUP BY 1, 2
    ), total AS (SELECT count(DISTINCT user_id) AS n FROM events)
    SELECT a.c AS type_a, b.c AS type_b, count(*) AS support,
           round(CAST(count(*) AS DOUBLE) / CAST(any_value(total.n) AS DOUBLE), 6)
             AS support_frac
    FROM iv a JOIN iv b ON a.k = b.k AND a.c != b.c AND a.tmin < b.tmax, total
    GROUP BY a.c, b.c
    """,
)
def events_seq_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern 2-sequence support (mining.sequence_pair_
    support): keys whose earliest `a` precedes their latest `b` — the
    GSP/PrefixSpan support-counting step reduced to the per-(key, type)
    interval table."""
    return mn.sequence_pair_support(_t(spark, sf_dir, "events"))


@register(
    "doc_distinctive_terms",
    r"""
    WITH toks AS (
      SELECT source AS grp, unnest(
        CASE WHEN trim(text) = '' THEN []
             ELSE regexp_split_to_array(trim(lower(text)), '\s+') END) AS w
      FROM documents
    ), gt AS (
      SELECT grp, w, count(*) AS cg FROM toks GROUP BY grp, w
    ), corpus AS (
      SELECT w, CAST(sum(cg) AS BIGINT) AS ct FROM gt GROUP BY w
    ), ng AS (
      SELECT grp, CAST(sum(cg) AS BIGINT) AS ng FROM gt GROUP BY grp
    ), totals AS (
      SELECT CAST(sum(ct) AS BIGINT) AS nt, count(*) AS v FROM corpus
    ), scored AS (
      SELECT grp, w, cg,
             round(ln((CAST(cg AS DOUBLE) + 1.0) / (CAST(ng AS DOUBLE) + CAST(v AS DOUBLE)))
                   - ln((CAST(ct AS DOUBLE) - CAST(cg AS DOUBLE) + 1.0)
                        / (CAST(nt AS DOUBLE) - CAST(ng AS DOUBLE) + CAST(v AS DOUBLE))),
                   6) AS score
      FROM gt JOIN corpus USING (w) JOIN ng USING (grp), totals
    )
    SELECT grp AS source, rank, w AS token, cg AS count_in_group, score
    FROM (
      SELECT grp, w, cg, score,
             row_number() OVER (PARTITION BY grp ORDER BY score DESC, w) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def doc_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinctive vocabulary by smoothed log-odds vs the
    rest of the corpus (text.distinctive_terms) — the corpus-comparison
    report."""
    from imposm3_spark.datapipe import text as tx

    return tx.distinctive_terms(_t(spark, sf_dir, "documents"))


@register(
    "orders_profile",
    """
    SELECT 'o_orderkey' AS "column", count(*) AS n_rows,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           count(DISTINCT o_orderkey) AS n_distinct,
           round(min(CAST(o_orderkey AS DOUBLE)), 6) AS min_num,
           round(max(CAST(o_orderkey AS DOUBLE)), 6) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*),
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_custkey),
           round(min(CAST(o_custkey AS DOUBLE)), 6),
           round(max(CAST(o_custkey AS DOUBLE)), 6), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*),
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_totalprice),
           round(min(CAST(o_totalprice AS DOUBLE)), 6),
           round(max(CAST(o_totalprice AS DOUBLE)), 6), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', count(*),
           CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_orderdate),
           round(min(CAST(date_diff('day', DATE '2000-01-01', CAST(o_orderdate AS DATE))
                          AS DOUBLE)), 6),
           round(max(CAST(date_diff('day', DATE '2000-01-01', CAST(o_orderdate AS DATE))
                          AS DOUBLE)), 6), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*),
           CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_orderstatus), NULL, NULL,
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*),
           CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_orderpriority), NULL, NULL,
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    """,
)
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass dataset-profiling card over orders (validate.profile):
    nulls, exact distincts, typed min/max per column from a single
    unpivoted scan — no per-column replay."""
    from imposm3_spark.datapipe.validate import profile

    return profile(
        _t(spark, sf_dir, "orders"),
        num_cols=["o_orderkey", "o_custkey", "o_totalprice"],
        str_cols=["o_orderstatus", "o_orderpriority"],
        date_cols=["o_orderdate"],
    )


@register(
    "emb_ood",
    """
    WITH e AS (
      SELECT vec_id, label, pos,
             CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT) AS q
      FROM (SELECT vec_id, label, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings)
    ), s AS (
      SELECT label, pos, CAST(sum(q) AS BIGINT) AS s, count(*) AS n
      FROM e GROUP BY 1, 2
    ), pv AS (
      SELECT vec_id, e.label,
             sum(CAST(e.q * s.n - s.s AS HUGEINT)
                 * CAST(e.q * s.n - s.s AS HUGEINT)) AS ss,
             max(s.n) AS n
      FROM e JOIN s ON e.label = s.label AND e.pos = s.pos
      GROUP BY 1, 2
    )
    SELECT vec_id, label,
           round(sqrt(CAST(ss AS DOUBLE)) / CAST(n AS DOUBLE) / 1048576.0, 6)
             AS ood_dist
    FROM pv ORDER BY ood_dist DESC, vec_id LIMIT 20
    """,
)
def emb_ood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 out-of-distribution vectors by distance to their own
    label centroid (similarity.ood_scores) — the mislabeled/outlier
    shortlist, integer-exact like emb_drift."""
    from imposm3_spark.datapipe import similarity as sim

    return sim.ood_scores(_t(spark, sf_dir, "embeddings"))


@register(
    "doc_pmi_pairs",
    r"""
    WITH toks AS (
      SELECT doc_id AS d, pos, w FROM (
        SELECT doc_id, unnest(
          CASE WHEN trim(text) = '' THEN []
               ELSE regexp_split_to_array(trim(lower(text)), '\s+') END) AS w,
          generate_subscripts(
          CASE WHEN trim(text) = '' THEN []
               ELSE regexp_split_to_array(trim(lower(text)), '\s+') END, 1) AS pos
        FROM documents)
    ), pairs AS (
      SELECT least(a.w, b.w) AS a, greatest(a.w, b.w) AS b, count(*) AS c_ab
      FROM toks a JOIN toks b
        ON a.d = b.d AND b.pos BETWEEN a.pos + 1 AND a.pos + 4
      GROUP BY 1, 2
    ), uni AS (
      SELECT w, count(*) AS c FROM toks GROUP BY w
    ), tt AS (SELECT CAST(sum(c) AS BIGINT) AS tt FROM uni),
    tp AS (SELECT CAST(sum(c_ab) AS BIGINT) AS tp FROM pairs)
    SELECT a, b, c_ab,
           round(ln((CAST(c_ab AS DOUBLE) / CAST(tp AS DOUBLE))
                    / ((CAST(ua.c AS DOUBLE) / CAST(tt AS DOUBLE))
                       * (CAST(ub.c AS DOUBLE) / CAST(tt AS DOUBLE)))), 6) AS pmi
    FROM pairs JOIN uni ua ON ua.w = a JOIN uni ub ON ub.w = b, tt, tp
    WHERE c_ab >= 5
    ORDER BY pmi DESC, a, b LIMIT 20
    """,
)
def doc_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PMI co-occurrence pairs within 4-token windows
    (text.pmi_pairs) — the word2vec/GloVe statistics stage, built by a
    linear (doc, pos+d) equi-join."""
    from imposm3_spark.datapipe import text as tx

    return tx.pmi_pairs(_t(spark, sf_dir, "documents"))


@register(
    "lineitem_join_size",
    """
    WITH cnt AS (
      SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY l_partkey
    ), p AS (
      SELECT l_partkey, cnt, cnt * cnt AS pairs FROM cnt
    ), t AS (SELECT CAST(sum(pairs) AS BIGINT) AS total FROM p)
    SELECT l_partkey, cnt, pairs,
           round(CAST(pairs AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share
    FROM p, t ORDER BY pairs DESC, l_partkey LIMIT 10
    """,
)
def lineitem_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality profile without the join (stats.join_size_
    profile): Σ c(k)² from one count aggregation — the skew/optimizer
    diagnostic that sizes a self-join before paying for it."""
    return st.join_size_profile(_t(spark, sf_dir, "lineitem"), "l_partkey")


@register(
    "doc_kfold",
    """
    WITH r AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, lang, CAST((rn - 1) % 5 AS INT) AS fold FROM r
    """,
)
def doc_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 5-fold assignment balanced EXACTLY within each lang
    stratum (sampling.stratified_kfold): rank-round-robin over the
    deterministic md5 draw, fold sizes within a stratum differ by at
    most one."""
    from imposm3_spark.datapipe.sampling import stratified_kfold

    return stratified_kfold(_t(spark, sf_dir, "documents"), "lang", "doc_id", k=5)


@register(
    "orders_backlog",
    """
    WITH ship AS (
      SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS shipmax
      FROM lineitem GROUP BY l_orderkey
    ), open_iv AS (
      SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS d0, s.shipmax,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN ship s ON s.l_orderkey = o.o_orderkey
      WHERE s.shipmax >= CAST(o.o_orderdate AS DATE)
    ), days AS (
      SELECT d0 + o * INTERVAL 1 DAY AS day, cents
      FROM open_iv, unnest(range(0, date_diff('day', d0, shipmax) + 1)) AS u(o)
    )
    SELECT CAST(day AS DATE) AS day, count(*) AS n_open,
           round(CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / 100.0, 2) AS open_value
    FROM days GROUP BY day
    """,
)
def orders_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog time series: every order is open from its
    order date to its last lineitem ship date; each day reports the
    count and exact value of in-flight orders — the interval-to-grid
    temporal aggregation (the order-level sibling of events_wau)."""
    from pyspark.sql import functions as F

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ship = li.groupBy("l_orderkey").agg(F.max(F.col("l_shipdate").cast("date")).alias("shipmax"))
    iv = (
        o.join(ship, o["o_orderkey"] == ship["l_orderkey"])
        .where(F.col("shipmax") >= F.col("o_orderdate").cast("date"))
        .select(
            F.col("o_orderdate").cast("date").alias("d0"),
            "shipmax",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
    )
    # spread before the ~interval-length x row-count date explode: AQE
    # coalesces the small pre-explode join output to ~1 partition (a
    # byte-based decision), serializing the 100x fanout + partial agg
    # onto one task (A/B 5.57 -> 2.63 s median at sf0.1, round 11)
    from imposm3_spark.datapipe.sampling import spread_small_input

    days = spread_small_input(iv).select(
        F.explode(
            F.sequence(F.col("d0"), F.col("shipmax"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
        "cents",
    )
    return days.groupBy("day").agg(
        F.count("*").alias("n_open"),
        F.round(F.sum("cents").cast("double") / 100.0, 2).alias("open_value"),
    )


@register(
    "events_ab_test",
    f"""
    WITH g AS (
      SELECT event_type,
             CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN user_id % 2 = 0
                           THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS sa,
             CAST(sum(CASE WHEN user_id % 2 = 0
                           THEN CAST(round(value * 100) AS BIGINT)
                                * CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS ssa,
             CAST(sum(CASE WHEN user_id % 2 != 0 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
             CAST(sum(CASE WHEN user_id % 2 != 0
                           THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS sb,
             CAST(sum(CASE WHEN user_id % 2 != 0
                           THEN CAST(round(value * 100) AS BIGINT)
                                * CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS ssb
      FROM events GROUP BY event_type
    )
    SELECT event_type, na, nb,
           round(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 100.0, 4) AS mean_a,
           round(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0, 4) AS mean_b,
           round({st.WELCH_T}, 6) AS t_stat,
           abs({st.WELCH_T}) > 1.96 AS significant_5pct
    FROM g WHERE na >= 2 AND nb >= 2
    """,
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample experiment readout per event type (stats.ab_test):
    Welch's t from exact integer sufficient statistics, the t expression
    shared textually with the oracle (stats.WELCH_T)."""
    return st.ab_test(_t(spark, sf_dir, "events"))


@register(
    "doc_make_batches",
    # end-to-end batch construction: Gopher gate -> exact dedup (keep
    # lowest id per text hash) -> token count -> 512-token greedy packs.
    r"""
    WITH toks AS (
      SELECT doc_id, text,
             CASE WHEN trim(text) = '' THEN []
                  ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tokens
      FROM documents
    ), f AS (
      SELECT doc_id, text, len(tokens) AS n_toks,
             CASE WHEN len(tokens) > 0
                  THEN CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) / len(tokens)
                  ELSE 0.0 END AS mean_len,
             CASE WHEN len(tokens) > 0
                  THEN CAST(len(list_filter(tokens, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE) / len(tokens)
                  ELSE 0.0 END AS alpha_ratio,
             CASE WHEN length(text) > 0
                  THEN CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS DOUBLE) / length(text)
                  ELSE 0.0 END AS symbol_ratio,
             len(list_distinct(list_filter(tokens,
                 t -> t IN ('the','and','of','to','a','in','is','that')))) AS dsw
      FROM toks
    ), gated AS (
      SELECT doc_id, text, n_toks FROM f
      WHERE n_toks >= 10 AND n_toks <= 100000
        AND mean_len >= 2.0 AND mean_len <= 12.0
        AND alpha_ratio >= 0.8 AND symbol_ratio < 0.1 AND dsw >= 2
    ), keep AS (
      SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)
    ), kept AS (
      SELECT g.doc_id, g.n_toks FROM gated g JOIN keep USING (doc_id)
    ), h AS (
      SELECT doc_id, n_toks,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS dh
      FROM kept
    ), c AS (
      SELECT doc_id, n_toks, dh % 8 AS bucket,
             coalesce(sum(n_toks) OVER (
               PARTITION BY dh % 8 ORDER BY dh, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM h
    )
    SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks, bucket,
           CAST(floor(cb / 512) AS BIGINT) AS pack_id,
           CAST(cb % 512 AS BIGINT) AS pack_offset
    FROM c
    """,
)
def doc_make_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-batch construction: Gopher quality gate ->
    exact dedup keeping the lowest id per text hash -> whitespace token
    count -> greedy 512-token sequence packing in 8 hash shards. The
    composed write path of a pre-training data loader; each stage keeps
    its individual physical shape (gate = expressions, dedup = one
    hash-keyed min, packing = one bucket-keyed window)."""
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe import text as tx
    from imposm3_spark.datapipe.sampling import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    gated = (
        tx.gopher_rules(docs)
        .filter(F.col("passes"))
        .select("doc_id")
        .join(docs, "doc_id")
        .select("doc_id", "text", tx.token_count(F.col("text")).alias("n_toks"))
    )
    keep = gated.groupBy(F.md5("text").alias("_h")).agg(F.min("doc_id").alias("doc_id"))
    kept = gated.join(keep.select("doc_id"), "doc_id").select("doc_id", "n_toks")
    return pack_sequences(kept, "doc_id", "n_toks", 512, n_buckets=8).select(
        "doc_id", "n_toks", "bucket", "pack_id", "pack_offset"
    )


@register(
    "emb_mips_topk",
    """
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5
    ), scored AS (
      SELECT q.query_id, e.vec_id AS cand_id,
             round(list_dot_product(CAST(q.qvec AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[])), 6) AS score
      FROM q CROSS JOIN embeddings e WHERE q.query_id != e.vec_id
    )
    SELECT query_id, cand_id AS vec_id, rank, score FROM (
      SELECT query_id, cand_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, cand_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def emb_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product top-k (the recommender retrieval scoring —
    UNNORMALIZED, so magnitude matters, unlike cosine): broadcast query
    side, one corpus scan, per-query heap."""
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe.similarity import Window, dot

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    c = e.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cvec"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("score", F.round(dot(F.col("qvec"), F.col("cvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", F.col("cand_id").alias("vec_id"), "rank", "score")
    )


@register(
    "orders_cohort_ltv",
    """
    WITH o AS (
      SELECT o_custkey,
             year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), first AS (
      SELECT o_custkey, min(m) AS cohort FROM o GROUP BY o_custkey
    ), cells AS (
      SELECT f.cohort, o.m - f.cohort AS offset_m,
             count(*) AS n_orders, CAST(sum(o.cents) AS BIGINT) AS cents
      FROM o JOIN first f USING (o_custkey)
      GROUP BY 1, 2
    )
    SELECT a.cohort, a.offset_m, a.n_orders,
           round(CAST(a.cents AS DOUBLE) / 100.0, 2) AS revenue,
           round(CAST(CAST(sum(b.cents) AS BIGINT) AS DOUBLE) / 100.0, 2) AS cum_revenue
    FROM cells a JOIN cells b
      ON b.cohort = a.cohort AND b.offset_m <= a.offset_m
    GROUP BY a.cohort, a.offset_m, a.n_orders, a.cents
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle: customers grouped by first-order month, exact
    revenue per (cohort, months-since) cell with the cumulative
    lifetime value — the revenue sibling of events_retention. The
    cumulative is a triangular join on the tiny cell table (never a
    global-order window)."""
    from pyspark.sql import functions as F

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    first = o.groupBy("o_custkey").agg(F.min("m").alias("cohort"))
    cells = (
        o.join(first, "o_custkey")
        .groupBy("cohort", (F.col("m") - F.col("cohort")).alias("offset_m"))
        .agg(F.count("*").alias("n_orders"), F.sum("cents").alias("cents"))
        .localCheckpoint(eager=False)
    )
    a, b = cells.alias("a"), cells.alias("b")
    return (
        a.join(
            b,
            (F.col("b.cohort") == F.col("a.cohort"))
            & (F.col("b.offset_m") <= F.col("a.offset_m")),
        )
        .groupBy(
            F.col("a.cohort").alias("cohort"),
            F.col("a.offset_m").alias("offset_m"),
            F.col("a.n_orders").alias("n_orders"),
            F.col("a.cents").alias("_c"),
        )
        .agg(F.sum(F.col("b.cents")).alias("_cum"))
        .select(
            "cohort",
            "offset_m",
            "n_orders",
            F.round(F.col("_c").cast("double") / 100.0, 2).alias("revenue"),
            F.round(F.col("_cum").cast("double") / 100.0, 2).alias("cum_revenue"),
        )
    )


def _sql_pq_recall() -> str:
    from imposm3_spark.benchqueries import ORACLES

    pq = ORACLES["emb_pq_topk"]
    return f"""
    WITH pq AS ({pq}),
    q2 AS (
      SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5
    ), brute AS (
      SELECT query_id, vec_id FROM (
        SELECT q2.query_id, e.vec_id,
               row_number() OVER (PARTITION BY q2.query_id ORDER BY
                 list_aggregate(list_transform(range(1, 65),
                   d -> (CAST(q2.qvec[d] AS DOUBLE) - CAST(e.embedding[d] AS DOUBLE))
                        * (CAST(q2.qvec[d] AS DOUBLE) - CAST(e.embedding[d] AS DOUBLE))),
                   'sum') ASC, e.vec_id) AS rank
        FROM q2 JOIN embeddings e ON e.vec_id != q2.query_id
      ) WHERE rank <= 3
    )
    SELECT b.query_id, CAST(count(p.vec_id) AS BIGINT) AS hits, 3 AS k,
           round(CAST(count(p.vec_id) AS DOUBLE) / 3.0, 6) AS recall
    FROM brute b LEFT JOIN pq p
      ON p.query_id = b.query_id AND p.vec_id = b.vec_id
    GROUP BY b.query_id
    """


@register("emb_pq_recall", _sql_pq_recall())
def emb_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation for the PQ path: recall@3 of asymmetric-
    distance PQ against the exact L2 top-3 — both deterministic (LCG
    codebooks, fixed-order folds), so the approximate index's QUALITY is
    value-checked, like emb_lsh_recall for the LSH path."""
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe.similarity import Window, pq_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    pq = pq_topk(e, q, k=3).select("query_id", "vec_id")
    qv = q.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    c = e.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cvec"))
    d2 = F.aggregate(
        F.zip_with(
            F.col("qvec"),
            F.col("cvec"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cand_id"))
    brute = (
        F.broadcast(qv)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("d2", d2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", F.col("cand_id").alias("vec_id"))
    )
    j = brute.join(
        pq.withColumnRenamed("vec_id", "pv"),
        (brute["query_id"] == pq["query_id"]) & (brute["vec_id"] == F.col("pv")),
        "left",
    ).select(brute["query_id"], F.col("pv"))
    return j.groupBy("query_id").agg(F.count("pv").alias("hits")).select(
        "query_id",
        "hits",
        F.lit(3).alias("k"),
        F.round(F.col("hits").cast("double") / 3.0, 6).alias("recall"),
    )


@register(
    "emb_matryoshka_recall",
    # recall@3 of the 16-dim PREFIX cosine ranking vs the full 64-dim
    # ranking — the Matryoshka-style truncation quality check. Both
    # rankings are exact and deterministic.
    """
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5
    ), full_rank AS (
      -- round to 6 before ranking: the Spark side (brute_force_topk)
      -- ranks on the rounded similarity
      SELECT query_id, vec_id FROM (
        SELECT q.query_id, e.vec_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 round(list_cosine_similarity(CAST(q.qvec AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])), 6) DESC,
                 e.vec_id) AS rank
        FROM q JOIN embeddings e ON e.vec_id != q.query_id
      ) WHERE rank <= 3
    ), pfx AS (
      SELECT query_id, vec_id FROM (
        SELECT q.query_id, e.vec_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 list_cosine_similarity(CAST(q.qvec[1:16] AS DOUBLE[]),
                                        CAST(e.embedding[1:16] AS DOUBLE[])) DESC,
                 e.vec_id) AS rank
        FROM q JOIN embeddings e ON e.vec_id != q.query_id
      ) WHERE rank <= 3
    )
    SELECT f.query_id, CAST(count(p.vec_id) AS BIGINT) AS hits, 3 AS k,
           round(CAST(count(p.vec_id) AS DOUBLE) / 3.0, 6) AS recall
    FROM full_rank f LEFT JOIN pfx p
      ON p.query_id = f.query_id AND p.vec_id = f.vec_id
    GROUP BY f.query_id
    """,
)
def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated-embedding quality check (Matryoshka-style): recall@3 of
    the 16-dim prefix cosine ranking against the full 64-dim ranking —
    quantifies what a 4x cheaper index loses, exactly."""
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe.similarity import Window, brute_force_topk, cosine

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    full = brute_force_topk(e, q, k=3).select("query_id", "vec_id")
    qv = q.select(F.col("vec_id").alias("query_id"), F.slice("embedding", 1, 16).alias("qp"))
    c = e.select(F.col("vec_id").alias("cand_id"), F.slice("embedding", 1, 16).alias("cp"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    pfx = (
        F.broadcast(qv)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("sim", cosine(F.col("qp"), F.col("cp")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", F.col("cand_id").alias("pv"))
    )
    j = full.join(
        pfx,
        (full["query_id"] == pfx["query_id"]) & (full["vec_id"] == F.col("pv")),
        "left",
    ).select(full["query_id"], F.col("pv"))
    return j.groupBy("query_id").agg(F.count("pv").alias("hits")).select(
        "query_id",
        "hits",
        F.lit(3).alias("k"),
        F.round(F.col("hits").cast("double") / 3.0, 6).alias("recall"),
    )


@register(
    "emb_hamming_recall",
    # 1-bit (sign) quantization: DuckDB states the hamming distance as
    # the count of sign-disagreeing dims; Spark computes the SAME number
    # via packed-BIGINT xor + bit_count (the production form — 64 dims
    # in one word). recall@3 vs the exact cosine ranking.
    """
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5
    ), full_rank AS (
      SELECT query_id, vec_id FROM (
        SELECT q.query_id, e.vec_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 round(list_cosine_similarity(CAST(q.qvec AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])), 6) DESC,
                 e.vec_id) AS rank
        FROM q JOIN embeddings e ON e.vec_id != q.query_id
      ) WHERE rank <= 3
    ), ham AS (
      SELECT query_id, vec_id FROM (
        SELECT q.query_id, e.vec_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 len(list_filter(range(1, 65),
                     d -> (q.qvec[d] >= 0) != (e.embedding[d] >= 0))) ASC,
                 e.vec_id) AS rank
        FROM q JOIN embeddings e ON e.vec_id != q.query_id
      ) WHERE rank <= 3
    )
    SELECT f.query_id, CAST(count(h.vec_id) AS BIGINT) AS hits, 3 AS k,
           round(CAST(count(h.vec_id) AS DOUBLE) / 3.0, 6) AS recall
    FROM full_rank f LEFT JOIN ham h
      ON h.query_id = f.query_id AND h.vec_id = f.vec_id
    GROUP BY f.query_id
    """,
)
def emb_hamming_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary (sign-bit) embedding quantization eval: 64 dims pack into
    ONE BIGINT, candidate distance is bit_count(xor) — a 512x memory
    reduction whose retrieval quality this query measures as recall@3
    against the exact cosine ranking."""
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe.similarity import Window, brute_force_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    full = brute_force_topk(e, q, k=3).select("query_id", "vec_id")
    pack = F.expr(
        "aggregate(transform(sequence(0, 63), "
        "i -> IF(embedding[i] >= 0, shiftleft(1L, i), 0L)), 0L, (a, b) -> a | b)"
    )
    qb = q.select(F.col("vec_id").alias("query_id"), pack.alias("qbits"))
    cb = e.select(F.col("vec_id").alias("cand_id"), pack.alias("cbits"))
    w = Window.partitionBy("query_id").orderBy(F.asc("hd"), F.asc("cand_id"))
    ham = (
        F.broadcast(qb)
        .crossJoin(cb)
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("hd", F.expr("bit_count(qbits ^ cbits)"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", F.col("cand_id").alias("hv"))
    )
    j = full.join(
        ham,
        (full["query_id"] == ham["query_id"]) & (full["vec_id"] == F.col("hv")),
        "left",
    ).select(full["query_id"], F.col("hv"))
    return j.groupBy("query_id").agg(F.count("hv").alias("hits")).select(
        "query_id",
        "hits",
        F.lit(3).alias("k"),
        F.round(F.col("hits").cast("double") / 3.0, 6).alias("recall"),
    )


@register(
    "events_peaks",
    """
    WITH h AS (
      SELECT event_type,
             date_diff('hour', TIMESTAMP '2001-01-01 00:00:00', ts) AS hr,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT event_type, hr, cents,
             lag(cents) OVER w AS prev, lead(cents) OVER w AS nxt
      FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr)
    )
    SELECT event_type, hr, cents
    FROM lagged WHERE prev IS NOT NULL AND nxt IS NOT NULL
      AND cents > prev AND cents > nxt
    """,
)
def events_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum detection on the hourly cents series per type (the
    signal-processing peak finder): strict peaks vs both neighbors of
    the OBSERVED series, exact integers, one keyed window."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    ev = _t(spark, sf_dir, "events")
    epoch0 = F.unix_timestamp(F.lit("2001-01-01 00:00:00").cast("timestamp"))
    hr = ((F.unix_timestamp(F.col("ts").cast("timestamp")) - epoch0) / 3600).cast("bigint")
    h = ev.select(
        "event_type", hr.alias("hr"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    ).groupBy("event_type", "hr").agg(F.sum("c").alias("cents"))
    w = W.partitionBy("event_type").orderBy("hr")
    lagged = h.select(
        "event_type", "hr", "cents",
        F.lag("cents").over(w).alias("prev"), F.lead("cents").over(w).alias("nxt"),
    )
    return lagged.filter(
        F.col("prev").isNotNull() & F.col("nxt").isNotNull()
        & (F.col("cents") > F.col("prev")) & (F.col("cents") > F.col("nxt"))
    ).select("event_type", "hr", "cents")


def _sql_silhouette() -> str:
    from imposm3_spark.datapipe import kmeans as km

    return km.oracle_sql_silhouette(k=8, iterations=3, dim=64, topn=20)


@register("emb_silhouette", _sql_silhouette())
def emb_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst-clustered points by simplified silhouette after the exact
    Lloyd run (kmeans.silhouette_worst): the boundary/misassignment
    review queue, bit-identical to the unrolled SQL oracle."""
    from imposm3_spark.datapipe import kmeans as km

    return km.silhouette_worst(_t(spark, sf_dir, "embeddings"), k=8, iterations=3)


@register(
    "orders_percent_rank",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS price,
           round(percent_rank() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS pct
    FROM orders
    """,
)
def orders_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global percent_rank without the single-task window: the two-phase
    row-number primitive + (rn-1)/(total-1) — completes the rank-family
    (row_number/ntile/percent_rank) on the distributed global-order
    backbone."""
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe.sampling import with_global_row_numbers

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    numbered = with_global_row_numbers(
        o, [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()]
    )
    total = numbered.count()
    pct = (F.col("rn") - 1).cast("double") / F.lit(float(total - 1))
    return numbered.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.round(pct, 6).alias("pct"),
    )


@register(
    "doc_source_similarity",
    r"""
    WITH v AS (
      SELECT DISTINCT source, unnest(
        CASE WHEN trim(text) = '' THEN []
             ELSE regexp_split_to_array(trim(lower(text)), '\s+') END) AS w
      FROM documents
    ), n AS (
      SELECT source, count(*) AS n FROM v GROUP BY source
    ), inter AS (
      SELECT a.source AS source_a, b.source AS source_b, count(*) AS inter
      FROM v a JOIN v b ON a.w = b.w AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b, i.inter,
           na.n + nb.n - i.inter AS uni,
           round(CAST(i.inter AS DOUBLE) / CAST(na.n + nb.n - i.inter AS DOUBLE), 6)
             AS jaccard
    FROM inter i JOIN n na ON na.source = i.source_a
                JOIN n nb ON nb.source = i.source_b
    """,
)
def doc_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source vocabulary similarity matrix: exact Jaccard of
    distinct-token sets via the token equi-join (any pair with J > 0
    shares a token — recall 1, no source×source cross join). The
    corpus-level sibling of doc_ppjoin."""
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe.text import tokens

    docs = _t(spark, sf_dir, "documents")
    v = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("w")
    ).distinct()
    n = v.groupBy("source").agg(F.count("*").alias("n"))
    a = v.select(F.col("source").alias("source_a"), "w")
    b = v.select(F.col("source").alias("source_b"), "w")
    inter = (
        a.join(b, "w")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("inter"))
    )
    na = n.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    nb = n.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    uni = F.col("na") + F.col("nb") - F.col("inter")
    return (
        inter.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            "inter",
            uni.alias("uni"),
            F.round(F.col("inter").cast("double") / uni.cast("double"), 6).alias(
                "jaccard"
            ),
        )
    )


@register(
    "events_heatmap",
    """
    WITH h AS (
      SELECT event_type, isodow(ts) - 1 AS dow, hour(ts) AS hour,
             count(*) AS n
      FROM events GROUP BY 1, 2, 3
    ), t AS (
      SELECT event_type, CAST(sum(n) AS BIGINT) AS total FROM h GROUP BY event_type
    )
    SELECT h.event_type, h.dow, h.hour, h.n,
           round(CAST(h.n AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS share
    FROM h JOIN t USING (event_type)
    """,
)
def events_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour activity heatmap per type with within-type
    share — the calendar-profile rollup (weekday(): 0 = Monday on both
    sides). One aggregation + a broadcast of type totals."""
    from pyspark.sql import functions as F

    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type",
        F.expr("weekday(ts)").alias("dow"),
        F.hour(F.col("ts").cast("timestamp")).alias("hour"),
    ).agg(F.count("*").alias("n"))
    t = h.groupBy("event_type").agg(F.sum("n").alias("total"))
    return h.join(F.broadcast(t), "event_type").select(
        "event_type",
        "dow",
        "hour",
        "n",
        F.round(F.col("n").cast("double") / F.col("total").cast("double"), 6).alias(
            "share"
        ),
    )


@register(
    "lineitem_weighted_median",
    # weighted median: collapse to price LEVELS first (tiny), then the
    # cumulative-weight pick runs on the level table — the keyed window
    # never sees raw lineitem rows.
    """
    WITH lv AS (
      SELECT l_returnflag, l_extendedprice AS price,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ), c AS (
      SELECT l_returnflag, price, w,
             CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY price
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cw,
             CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
      FROM lv
    )
    SELECT l_returnflag, round(min(price), 2) AS weighted_median
    FROM c WHERE 2 * cw >= tw GROUP BY l_returnflag
    """,
)
def lineitem_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median price per return flag: aggregate to
    price levels first, cumulate weights over the level table, pick the
    first level covering half the total weight."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    li = _t(spark, sf_dir, "lineitem")
    lv = li.groupBy(
        "l_returnflag", F.col("l_extendedprice").alias("price")
    ).agg(F.sum(F.round("l_quantity").cast("bigint")).alias("w"))
    wc = W.partitionBy("l_returnflag").orderBy("price").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wt = W.partitionBy("l_returnflag")
    c = lv.select(
        "l_returnflag",
        "price",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )
    return (
        c.where(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(F.round(F.min("price"), 2).alias("weighted_median"))
    )


@register(
    "orders_priority_drift",
    # categorical-distribution drift between the two order-year halves:
    # chi-square contribution per priority from exact counts; the
    # categorical sibling of emb_drift.
    """
    WITH c AS (
      SELECT o_orderpriority AS pri,
             CASE WHEN year(o_orderdate) <= 2000 THEN 0 ELSE 1 END AS half,
             count(*) AS n
      FROM orders GROUP BY 1, 2
    ), m AS (
      SELECT pri,
             CAST(coalesce(sum(CASE WHEN half = 0 THEN n END), 0) AS BIGINT) AS n0,
             CAST(coalesce(sum(CASE WHEN half = 1 THEN n END), 0) AS BIGINT) AS n1
      FROM c GROUP BY pri
    ), t AS (
      SELECT CAST(sum(n0) AS BIGINT) AS t0, CAST(sum(n1) AS BIGINT) AS t1 FROM m
    )
    SELECT pri, n0, n1,
           round(CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE)
                 - CAST(n0 AS DOUBLE) / CAST(t0 AS DOUBLE), 6) AS share_shift,
           round(
             (CAST(n1 AS DOUBLE) - CAST(t1 AS DOUBLE)
                * (CAST(n0 AS DOUBLE) / CAST(t0 AS DOUBLE)))
             * (CAST(n1 AS DOUBLE) - CAST(t1 AS DOUBLE)
                * (CAST(n0 AS DOUBLE) / CAST(t0 AS DOUBLE)))
             / (CAST(t1 AS DOUBLE) * (CAST(n0 AS DOUBLE) / CAST(t0 AS DOUBLE))),
             6) AS chi2_term
    FROM m, t WHERE n0 > 0
    """,
)
def orders_priority_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical drift monitor: order-priority mix shift between the
    two halves of the order history, with per-category chi-square terms
    against the first half's distribution — the categorical sibling of
    emb_drift, from exact counts."""
    from pyspark.sql import functions as F

    o = _t(spark, sf_dir, "orders")
    c = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.when(F.year("o_orderdate") <= 2000, 0).otherwise(1).alias("half"),
    ).agg(F.count("*").alias("n"))
    m = c.groupBy("pri").agg(
        F.coalesce(F.sum(F.when(F.col("half") == 0, F.col("n"))), F.lit(0)).alias("n0"),
        F.coalesce(F.sum(F.when(F.col("half") == 1, F.col("n"))), F.lit(0)).alias("n1"),
    )
    t = m.agg(F.sum("n0").alias("t0"), F.sum("n1").alias("t1"))
    d = lambda c_: F.col(c_).cast("double")  # noqa: E731
    p0 = d("n0") / d("t0")
    exp1 = d("t1") * p0
    return (
        m.crossJoin(F.broadcast(t))
        .where(F.col("n0") > 0)
        .select(
            "pri",
            "n0",
            "n1",
            F.round(d("n1") / d("t1") - p0, 6).alias("share_shift"),
            F.round((d("n1") - exp1) * (d("n1") - exp1) / exp1, 6).alias("chi2_term"),
        )
    )


@register(
    "events_growth_accounting",
    # growth accounting: per day, new / retained / resurrected actives
    # and churned (active yesterday, absent today) from the deduplicated
    # activity table and its day+1 shift.
    """
    WITH active AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id AS k
      FROM events
    ), first AS (
      SELECT k, min(d) AS d0 FROM active GROUP BY k
    ), today AS (
      SELECT a.d, a.k,
             CASE WHEN f.d0 = a.d THEN 'new'
                  WHEN y.k IS NOT NULL THEN 'retained'
                  ELSE 'resurrected' END AS status
      FROM active a
      JOIN first f ON f.k = a.k
      LEFT JOIN active y ON y.k = a.k AND y.d = a.d - INTERVAL 1 DAY
    ), churn AS (
      SELECT y.d + INTERVAL 1 DAY AS d, count(*) AS churned
      FROM active y LEFT JOIN active t ON t.k = y.k AND t.d = y.d + INTERVAL 1 DAY
      WHERE t.k IS NULL
      GROUP BY 1
    ), s AS (
      SELECT d,
             CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
             CAST(sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS retained,
             CAST(sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS resurrected
      FROM today GROUP BY d
    )
    SELECT s.d AS day, s.new_users, s.retained, s.resurrected,
           CAST(coalesce(c.churned, 0) AS BIGINT) AS churned
    FROM s LEFT JOIN churn c ON CAST(c.d AS DATE) = s.d
    """,
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting (new / retained / resurrected / churned per
    day): the activity table self-joined against its day-shift — the
    standard product-growth decomposition, exact counts."""
    from pyspark.sql import functions as F

    ev = _t(spark, sf_dir, "events")
    active = ev.select(
        F.date_trunc("DAY", F.col("ts").cast("timestamp")).cast("date").alias("d"),
        F.col("user_id").alias("k"),
    ).distinct().localCheckpoint(eager=False)
    first = active.groupBy("k").agg(F.min("d").alias("d0"))
    y = active.select(F.col("k").alias("k"), F.date_add("d", 1).alias("d"), F.lit(1).alias("_y"))
    today = (
        active.join(first, "k")
        .join(y, ["k", "d"], "left")
        .select(
            "d",
            F.when(F.col("d0") == F.col("d"), "new")
            .when(F.col("_y").isNotNull(), "retained")
            .otherwise("resurrected")
            .alias("status"),
        )
    )
    s = today.groupBy("d").agg(
        F.sum(F.when(F.col("status") == "new", 1).otherwise(0)).alias("new_users"),
        F.sum(F.when(F.col("status") == "retained", 1).otherwise(0)).alias("retained"),
        F.sum(F.when(F.col("status") == "resurrected", 1).otherwise(0)).alias("resurrected"),
    )
    t2 = active.select("k", "d", F.lit(1).alias("_t"))
    churn = (
        active.select("k", F.date_add("d", 1).alias("d"))
        .join(t2, ["k", "d"], "left")
        .where(F.col("_t").isNull())
        .groupBy("d")
        .agg(F.count("*").alias("churned"))
    )
    return s.join(churn, s["d"] == churn["d"], "left").select(
        s["d"].alias("day"),
        "new_users",
        "retained",
        "resurrected",
        F.coalesce("churned", F.lit(0)).alias("churned"),
    )


def _sql_lsh_pr() -> str:
    from imposm3_spark.benchqueries import _sql_minhash_bands
    from imposm3_spark.benchqueries_exact import _PPJOIN_ORACLE

    lsh = (
        _sql_minhash_bands()
        + """
    SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc < b.doc
    """
    )
    return f"""
    WITH lsh AS ({lsh}),
    truth AS (SELECT id_a, id_b FROM ({_PPJOIN_ORACLE})),
    tp AS (SELECT count(*) AS tp FROM lsh JOIN truth USING (id_a, id_b)),
    nl AS (SELECT count(*) AS n_cand FROM lsh),
    nt AS (SELECT count(*) AS n_truth FROM truth)
    SELECT n_truth, n_cand, tp,
           CASE WHEN n_cand > 0
                THEN round(CAST(tp AS DOUBLE) / CAST(n_cand AS DOUBLE), 6)
           END AS precision,
           CASE WHEN n_truth > 0
                THEN round(CAST(tp AS DOUBLE) / CAST(n_truth AS DOUBLE), 6)
           END AS recall
    FROM tp, nl, nt
    """



@register("doc_lsh_pr", _sql_lsh_pr())
def doc_lsh_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-level precision/recall of the MinHash-LSH candidate set
    against the exact Jaccard >= 0.5 truth (ppjoin) — the band-tuning
    readout that says whether the sketch over- or under-generates,
    value-checked because both sides are deterministic."""
    return _lsh_pr(_t(spark, sf_dir, "documents"))


@register("doc_lsh_pr_sampled", sampled_docs_sql(_sql_lsh_pr()))
def doc_lsh_pr_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_lsh_pr on the deterministic 1/2 document sample — the
    sample_frac scale path: exact pairwise truth (ppjoin) is quadratic
    in corpus size, so at 100 TB the eval runs on a hash-deterministic
    subsample (pair cost /4; raise mod with corpus size) while staying oracle-checkable bit-for-bit
    (datapipe.evaluation.deterministic_sample; see docs/SCALE.md)."""
    from imposm3_spark.datapipe.evaluation import deterministic_sample

    return _lsh_pr(deterministic_sample(_t(spark, sf_dir, "documents"), mod=2))


def _lsh_pr(docs: DataFrame) -> DataFrame:
    """Candidate-vs-truth precision/recall in ONE plan: a full-outer join
    of the two distinct pair sets with presence flags, rolled up by a
    single aggregation (n_cand = cand rows, n_truth = truth rows, tp =
    rows present on both sides — the same three counts the round-2
    formulation computed from two pinned sides and three aggregates).

    Shape rationale (round 10): under AQE, ``localCheckpoint(eager=False)``
    is NOT lazy — Dataset.localCheckpoint calls queryExecution.toRdd,
    and AdaptiveSparkPlanExec.doExecute materializes every non-final
    query stage THEN, so the old cand/truth pins executed the minhash
    and ppjoin pipelines SERIALLY at build time, one pin blocking the
    driver before the next. Referencing each subtree exactly once needs
    no pin at all, and AQE materializes the two independent subtrees'
    stages CONCURRENTLY inside the one job (thread-dump evidence +
    measured build 3.7 s of serial pin wall removed; values identical —
    oracle-verified)."""
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe import dedup as dd
    from imposm3_spark.datapipe import simjoin as sj

    cand = dd.minhash_lsh_pairs(docs).select("id_a", "id_b", F.lit(1).alias("_c"))
    truth = sj.ppjoin_pairs(docs, threshold=0.5, k=3).select(
        "id_a", "id_b", F.lit(1).alias("_t")
    )
    j = cand.join(truth, ["id_a", "id_b"], "full_outer")
    counts = j.agg(
        F.coalesce(F.sum("_t"), F.lit(0)).cast("long").alias("n_truth"),
        F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_cand"),
        F.coalesce(
            F.sum(F.when(F.col("_c").isNotNull() & F.col("_t").isNotNull(), 1)),
            F.lit(0),
        ).cast("long").alias("tp"),
    )
    return counts.select(
        "n_truth",
        "n_cand",
        "tp",
        F.when(
            F.col("n_cand") > 0,
            F.round(F.col("tp").cast("double") / F.col("n_cand").cast("double"), 6),
        ).alias("precision"),
        F.when(
            F.col("n_truth") > 0,
            F.round(F.col("tp").cast("double") / F.col("n_truth").cast("double"), 6),
        ).alias("recall"),
    )


@register(
    "events_cuped",
    f"""
    WITH pk AS (
      SELECT user_id AS k,
             CAST(sum(CASE WHEN dayofmonth(ts) <= 15
                           THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(sum(CASE WHEN dayofmonth(ts) > 15
                           THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY user_id
    ), g AS (
      SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM pk
    ), v AS (
      SELECT k % 2 = 0 AS is_a, count(*) AS nv,
             CAST(sum(x) AS BIGINT) AS sxv, CAST(sum(y) AS BIGINT) AS syv
      FROM pk GROUP BY 1
    )
    SELECT CASE WHEN is_a THEN 'A' ELSE 'B' END AS variant,
           nv AS n_keys,
           round(CAST(syv AS DOUBLE) / CAST(nv AS DOUBLE) / 100.0, 4) AS mean_post,
           round({st.CUPED_ADJ}, 4) AS mean_post_adj,
           round({st.CUPED_THETA}, 6) AS theta
    FROM v, g
    """,
)
def events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (stats.cuped): pre-period
    cents as the control covariate, pooled theta, adjusted per-variant
    post means — the shared CUPED_* expression strings make the floats
    bit-identical."""
    return st.cuped(_t(spark, sf_dir, "events"))


def _sql_purity() -> str:
    from imposm3_spark.datapipe import kmeans as km

    base = km.oracle_sql(k=8, iterations=3, dim=64)
    return f"""
    WITH assign AS ({base}),
    j AS (
      SELECT a.cluster, e.label, count(*) AS n
      FROM assign a JOIN embeddings e USING (vec_id)
      GROUP BY 1, 2
    ), tot AS (
      SELECT cluster, CAST(sum(n) AS BIGINT) AS n_members FROM j GROUP BY cluster
    ), maj AS (
      SELECT cluster, label AS majority_label, n AS n_majority FROM (
        SELECT cluster, label, n,
               row_number() OVER (PARTITION BY cluster ORDER BY n DESC, label) AS rn
        FROM j
      ) WHERE rn = 1
    )
    SELECT t.cluster, t.n_members, m.majority_label, m.n_majority,
           round(CAST(m.n_majority AS DOUBLE) / CAST(t.n_members AS DOUBLE), 6)
             AS purity
    FROM tot t JOIN maj m USING (cluster)
    """


@register("emb_cluster_purity", _sql_purity())
def emb_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External clustering validation: per-cluster majority-label purity
    after the exact Lloyd run — the label-agreement readout that says
    whether unsupervised structure tracks the known classes. Majority
    tie-breaks on the lowest label; everything else exact counts."""
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe import kmeans as km

    emb = _t(spark, sf_dir, "embeddings")
    assign = km.lloyd_kmeans(emb, k=8, iterations=3)
    j = (
        assign.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("cluster", "label")
        .agg(F.count("*").alias("n"))
    )
    # One rollup instead of pin + per-cluster window + join (round 10):
    # min(struct(-n, label)) picks exactly the window's (n DESC, label
    # ASC) first row — labels are non-null ints, so the struct order IS
    # the row_number order — and the member total rides the same
    # aggregate. The j subtree is referenced once, so the lazy pin (which
    # under AQE ran the whole Lloyd chain serially at build) is gone.
    g = j.groupBy("cluster").agg(
        F.sum("n").alias("n_members"),
        F.min(F.struct((-F.col("n")).alias("negn"), F.col("label").alias("l"))).alias(
            "_m"
        ),
    )
    return g.select(
        "cluster",
        "n_members",
        F.col("_m.l").alias("majority_label"),
        (-F.col("_m.negn")).alias("n_majority"),
        F.round(
            (-F.col("_m.negn")).cast("double") / F.col("n_members").cast("double"), 6
        ).alias("purity"),
    )


def _sql_lsh_pr_curve() -> str:
    from imposm3_spark.benchqueries import _sql_minhash_bands
    from imposm3_spark.benchqueries_exact import _PPJOIN_ORACLE

    truth04 = _PPJOIN_ORACLE.replace(
        "WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5",
        "WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.4",
    )
    lsh = (
        _sql_minhash_bands()
        + """
    SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc < b.doc
    """
    )
    return f"""
    WITH lsh AS ({lsh}),
    truth04 AS (SELECT id_a, id_b, jaccard FROM ({truth04})),
    thr AS (SELECT unnest([CAST(0.4 AS DOUBLE), CAST(0.5 AS DOUBLE),
                           CAST(0.6 AS DOUBLE)]) AS threshold),
    t AS (
      SELECT thr.threshold, tr.id_a, tr.id_b
      FROM truth04 tr JOIN thr ON tr.jaccard >= thr.threshold
    ), nt AS (
      SELECT threshold, count(*) AS n_truth FROM t GROUP BY threshold
    ), tp AS (
      SELECT t.threshold, count(*) AS tp
      FROM t JOIN lsh USING (id_a, id_b) GROUP BY t.threshold
    ), nc AS (SELECT count(*) AS n_cand FROM lsh)
    SELECT nt.threshold, nt.n_truth, nc.n_cand,
           CAST(coalesce(tp.tp, 0) AS BIGINT) AS tp,
           CASE WHEN nc.n_cand > 0
                THEN round(CAST(coalesce(tp.tp, 0) AS DOUBLE)
                           / CAST(nc.n_cand AS DOUBLE), 6)
           END AS precision,
           round(CAST(coalesce(tp.tp, 0) AS DOUBLE) / CAST(nt.n_truth AS DOUBLE), 6)
             AS recall
    FROM nt LEFT JOIN tp USING (threshold), nc
    """


@register("doc_lsh_pr_curve", _sql_lsh_pr_curve())
def doc_lsh_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall CURVE of the fixed MinHash-LSH candidate set
    against exact Jaccard truths at 0.4/0.5/0.6 — the threshold-sweep
    readout for band tuning (one ppjoin at the loosest threshold feeds
    all three truth sets)."""
    return _lsh_pr_curve(_t(spark, sf_dir, "documents"))


@register("doc_lsh_pr_curve_sampled", sampled_docs_sql(_sql_lsh_pr_curve()))
def doc_lsh_pr_curve_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_lsh_pr_curve on the deterministic 1/2 document sample — the
    sample_frac scale path for the quadratic exact-truth sweep
    (datapipe.evaluation.deterministic_sample; see docs/SCALE.md)."""
    from imposm3_spark.datapipe.evaluation import deterministic_sample

    return _lsh_pr_curve(deterministic_sample(_t(spark, sf_dir, "documents"), mod=2))


def _lsh_pr_curve(docs: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe import dedup as dd
    from imposm3_spark.datapipe import simjoin as sj

    # One plan, no pins (see _lsh_pr: lazy checkpoints execute serially
    # at build under AQE): full-outer the distinct pair sets once, fan
    # the few |cand ∪ truth| rows out over the 3 broadcast thresholds,
    # and take every per-threshold counter from ONE conditional
    # aggregation. A threshold keeps a row exactly when >=1 truth pair
    # clears it — identical to the round-2 groupBy-over-filtered-truth
    # base (cand-only rows have NULL jaccard, so they count toward
    # n_cand and never toward n_truth/tp). Oracle-verified identical.
    cand = dd.minhash_lsh_pairs(docs).select("id_a", "id_b", F.lit(1).alias("_c"))
    truth04 = sj.ppjoin_pairs(docs, threshold=0.4, k=3).select(
        "id_a", "id_b", "jaccard"
    )
    j = cand.join(truth04, ["id_a", "id_b"], "full_outer")
    thr = docs.sparkSession.createDataFrame(
        [(0.4,), (0.5,), (0.6,)], "threshold double"
    )
    agg = (
        j.crossJoin(F.broadcast(thr))
        .groupBy("threshold")
        .agg(
            F.sum(
                F.when(F.col("jaccard") >= F.col("threshold"), 1).otherwise(0)
            ).cast("long").alias("n_truth"),
            F.sum(F.coalesce("_c", F.lit(0))).cast("long").alias("n_cand"),
            F.sum(
                F.when(
                    (F.col("jaccard") >= F.col("threshold"))
                    & F.col("_c").isNotNull(),
                    1,
                ).otherwise(0)
            ).cast("long").alias("tp"),
        )
        .where(F.col("n_truth") > 0)
    )
    return agg.select(
        "threshold",
        "n_truth",
        "n_cand",
        "tp",
        F.when(
            F.col("n_cand") > 0,
            F.round(F.col("tp").cast("double") / F.col("n_cand").cast("double"), 6),
        ).alias("precision"),
        F.round(
            F.col("tp").cast("double") / F.col("n_truth").cast("double"), 6
        ).alias("recall"),
    )


@register(
    "events_hazard",
    # discrete-time survival: per day-offset since first signup, users
    # still unconverted entering the day (at risk), conversions that
    # day, hazard = conv/at_risk. Every number is an exact integer from
    # the per-user offset table + a triangular suffix count; the
    # Kaplan-Meier cumulative PRODUCT is deliberately not emitted (float
    # products over data-dependent sets are aggregation-order-dependent).
    """
    WITH su AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), pu AS (
      SELECT e.user_id, min(e.ts) AS tp
      FROM events e JOIN su ON su.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= su.t0
      GROUP BY e.user_id
    ), off AS (
      SELECT su.user_id,
             CASE WHEN pu.tp IS NULL THEN NULL
                  ELSE date_diff('day', CAST(su.t0 AS DATE), CAST(pu.tp AS DATE))
             END AS conv_day
      FROM su LEFT JOIN pu ON pu.user_id = su.user_id
    ), days AS (
      SELECT DISTINCT conv_day AS d FROM off WHERE conv_day IS NOT NULL
    ), conv AS (
      SELECT conv_day AS d, count(*) AS conversions FROM off
      WHERE conv_day IS NOT NULL GROUP BY conv_day
    ), risk AS (
      SELECT days.d,
             (SELECT count(*) FROM off
              WHERE conv_day IS NULL OR conv_day >= days.d) AS n_at_risk
      FROM days
    )
    SELECT r.d AS day_offset, CAST(r.n_at_risk AS BIGINT) AS n_at_risk,
           CAST(c.conversions AS BIGINT) AS conversions,
           round(CAST(c.conversions AS DOUBLE) / CAST(r.n_at_risk AS DOUBLE), 6)
             AS hazard
    FROM risk r JOIN conv c USING (d)
    """,
)
def events_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time conversion hazard: per day-offset since first
    signup, the fraction of still-unconverted users who convert that day
    — the survival-analysis readout, exact integers throughout (the K-M
    cumulative product is deliberately omitted: float products over
    data-dependent sets are order-dependent; the hazard table carries
    the same information).

    Scale: one keyed aggregation per event class, a user-sized left
    join, and a triangular suffix count on the tiny distinct-offset
    table."""
    from pyspark.sql import functions as F

    ev = _t(spark, sf_dir, "events")
    su = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("t0")
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .where(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    off = su.join(pu, "user_id", "left").select(
        "user_id",
        F.when(
            F.col("tp").isNotNull(),
            F.datediff(F.col("tp").cast("date"), F.col("t0").cast("date")),
        ).alias("conv_day"),
    ).localCheckpoint(eager=False)
    conv = (
        off.where(F.col("conv_day").isNotNull())
        .groupBy(F.col("conv_day").alias("d"))
        .agg(F.count("*").alias("conversions"))
    )
    # triangular suffix count over the DAY HISTOGRAM (distinct offsets +
    # one null bucket — tiny), never the user-sized table: at risk on
    # day d = never-converted + users with conv_day >= d
    hist = off.groupBy("conv_day").agg(F.count("*").alias("n"))
    a = conv.select("d")
    risk = (
        a.crossJoin(F.broadcast(hist))
        .where(F.col("conv_day").isNull() | (F.col("conv_day") >= F.col("d")))
        .groupBy("d")
        .agg(F.sum("n").alias("n_at_risk"))
    )
    return conv.join(risk, "d").select(
        F.col("d").alias("day_offset"),
        "n_at_risk",
        "conversions",
        F.round(
            F.col("conversions").cast("double") / F.col("n_at_risk").cast("double"), 6
        ).alias("hazard"),
    )


def _sql_pii() -> str:
    from imposm3_spark.datapipe.text import EMAIL_RE, LONG_NUM_RE, URL_RE

    url, email, num = URL_RE, EMAIL_RE, LONG_NUM_RE
    return f"""
    WITH m AS (
      SELECT source,
             len(regexp_extract_all(text, '{url}')) AS urls,
             len(regexp_extract_all(text, '{email}')) AS emails,
             len(regexp_extract_all(text, '{num}')) AS long_nums
      FROM documents
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN urls > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_url,
           CAST(sum(CASE WHEN emails > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
           CAST(sum(CASE WHEN long_nums > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_num,
           CAST(sum(urls) AS BIGINT) AS url_matches,
           CAST(sum(emails) AS BIGINT) AS email_matches,
           CAST(sum(long_nums) AS BIGINT) AS num_matches
    FROM m GROUP BY source
    """


@register("doc_pii_report", _sql_pii())
def doc_pii_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII exposure report per source (text.pii_report): documents and
    occurrences per pattern class using the SAME regexes scrub_pii
    redacts — the before/after audit artifact of a scrub pass."""
    from imposm3_spark.datapipe import text as tx

    return tx.pii_report(_t(spark, sf_dir, "documents"))


@register(
    "orders_dup_payments",
    """
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(o_orderdate AS DATE) AS d
      FROM orders
    )
    SELECT a.o_custkey AS custkey, a.o_orderkey AS order_a,
           b.o_orderkey AS order_b,
           round(CAST(a.cents AS DOUBLE) / 100.0, 2) AS amount_a,
           abs(a.cents - b.cents) AS cents_delta,
           a.cents = b.cents AS exact_dup
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey AND a.d = b.d
     AND a.o_orderkey < b.o_orderkey
    """,
)
def orders_dup_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen: pairs of orders from the SAME customer
    on the SAME day, with the exact cents delta and an exact-duplicate
    flag — the double-charge/split-payment review queue as a (customer,
    day) equi-join (no date-range fanout; the pair volume is bounded by
    per-customer daily order counts)."""
    from pyspark.sql import functions as F

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    a, b = o.alias("a"), o.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.d") == F.col("b.d"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("order_a"),
            F.col("b.o_orderkey").alias("order_b"),
            F.round(F.col("a.cents").cast("double") / 100.0, 2).alias("amount_a"),
            F.abs(F.col("a.cents") - F.col("b.cents")).alias("cents_delta"),
            (F.col("a.cents") == F.col("b.cents")).alias("exact_dup"),
        )
    )


@register(
    "orders_cycle_time",
    """
    WITH ship AS (
      SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS shipmax
      FROM lineitem GROUP BY l_orderkey
    ), ct AS (
      SELECT o.o_orderpriority AS priority,
             date_diff('day', CAST(o.o_orderdate AS DATE), s.shipmax) AS days
      FROM orders o JOIN ship s ON s.l_orderkey = o.o_orderkey
      WHERE s.shipmax >= CAST(o.o_orderdate AS DATE)
    )
    SELECT priority, count(*) AS n,
           round(quantile_cont(days, 0.5), 4) AS p50_days,
           round(quantile_cont(days, 0.9), 4) AS p90_days,
           max(days) AS max_days
    FROM ct GROUP BY priority
    """,
)
def orders_cycle_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order fulfilment cycle time per priority: order date to last
    lineitem ship date, exact p50/p90 (percentile/quantile_cont parity)
    and the worst case — the operations SLA readout."""
    from pyspark.sql import functions as F

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ship = li.groupBy("l_orderkey").agg(
        F.max(F.col("l_shipdate").cast("date")).alias("shipmax")
    )
    ct = (
        o.join(ship, o["o_orderkey"] == ship["l_orderkey"])
        .where(F.col("shipmax") >= F.col("o_orderdate").cast("date"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(F.col("shipmax"), F.col("o_orderdate").cast("date")).alias("days"),
        )
    )
    return ct.groupBy("priority").agg(
        F.count("*").alias("n"),
        F.round(F.expr("percentile(days, 0.5D)"), 4).alias("p50_days"),
        F.round(F.expr("percentile(days, 0.9D)"), 4).alias("p90_days"),
        F.max("days").alias("max_days"),
    )


@register(
    "emb_ball_query",
    """
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5
    )
    SELECT q.query_id, e.vec_id, 
           round(list_cosine_similarity(CAST(q.qvec AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])), 6) AS sim
    FROM q JOIN embeddings e ON e.vec_id != q.query_id
    WHERE round(list_cosine_similarity(CAST(q.qvec AS DOUBLE[]),
                                       CAST(e.embedding AS DOUBLE[])), 6) >= 0.35
    """,
)
def emb_ball_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (ball) similarity search: ALL vectors within cosine >=
    0.35 of each query — the range-query sibling of top-k retrieval
    (result size is data-dependent, so the scan filter replaces the
    per-query heap)."""
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe.similarity import cosine

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    c = e.select(F.col("vec_id").alias("vec_id"), F.col("embedding").alias("cvec"))
    sim = F.round(cosine(F.col("qvec"), F.col("cvec")), 6)
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("sim", sim)
        .filter(F.col("sim") >= 0.35)
        .select("query_id", "vec_id", "sim")
    )


@register(
    "supplier_hhi",
    # exact Herfindahl-Hirschman concentration: HHI = sum(share_i^2) =
    # (sum c_i^2) / T^2 — the squared-cents sum accumulates in
    # DECIMAL/HUGEINT, so the float division happens ONCE.
    """
    WITH s AS (
      SELECT l_suppkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS c
      FROM lineitem GROUP BY l_suppkey
    ), a AS (
      SELECT count(*) AS n_suppliers,
             CAST(sum(c) AS HUGEINT) AS t,
             sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS ss
      FROM s
    )
    SELECT n_suppliers,
           round(CAST(ss AS DOUBLE) / (CAST(t AS DOUBLE) * CAST(t AS DOUBLE)), 9)
             AS hhi,
           round(1.0 / CAST(n_suppliers AS DOUBLE), 9) AS hhi_uniform
    FROM a
    """,
)
def supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration index: exact HHI of supplier revenue shares
    via the decimal-exact Σc² / T² identity (one float division — no
    order-dependent float share sum), with the uniform-market baseline
    1/n for calibration."""
    from pyspark.sql import functions as F

    li = _t(spark, sf_dir, "lineitem")
    s = li.groupBy("l_suppkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("c")
    )
    a = s.agg(
        F.count("*").alias("n_suppliers"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("t"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c").cast("decimal(38,0)")).alias(
            "ss"
        ),
    )
    return a.select(
        "n_suppliers",
        F.round(
            F.col("ss").cast("double") / (F.col("t").cast("double") * F.col("t").cast("double")),
            9,
        ).alias("hhi"),
        F.round(F.lit(1.0) / F.col("n_suppliers").cast("double"), 9).alias("hhi_uniform"),
    )


def _sql_mmr(nq: int = 3, ncand: int = 10, nsel: int = 3, lam: float = 0.7) -> str:
    """Unrolled MMR greedy oracle: each pick is a (penalty, argmax) CTE
    pair — the exact sequential algorithm. The redundancy weight embeds
    the PYTHON double repr of 1.0-lam so both engines multiply by the
    bit-identical constant."""
    lam_s, mu_s = repr(lam), repr(1.0 - lam)
    cos = (
        lambda a, b: f"round(list_cosine_similarity(CAST({a} AS DOUBLE[]), "
        f"CAST({b} AS DOUBLE[])), 6)"
    )
    parts = [
        f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
      WHERE vec_id < {nq}
    ), scored AS (
      SELECT q.query_id, e.vec_id, e.embedding AS cvec,
             {cos('q.qvec', 'e.embedding')} AS sim
      FROM q JOIN embeddings e ON e.vec_id != q.query_id
    ), cand AS MATERIALIZED (
      SELECT query_id, vec_id, cvec, sim FROM (
        SELECT query_id, vec_id, cvec, sim,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
        FROM scored) WHERE rn <= {ncand}
    ), p1 AS MATERIALIZED (
      SELECT query_id, vec_id, sim AS mmr_score, cvec FROM (
        SELECT query_id, vec_id, sim, cvec,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
        FROM cand) WHERE rn = 1
    )"""
    ]
    for k in range(2, nsel + 1):
        prior = " UNION ALL ".join(
            f"SELECT query_id, vec_id, cvec FROM p{j}" for j in range(1, k)
        )
        parts.append(
            f""", pri{k} AS ({prior}), pen{k} AS (
      SELECT c.query_id, c.vec_id, any_value(c.sim) AS sim,
             any_value(c.cvec) AS cvec,
             max({cos('c.cvec', 'p.cvec')}) AS maxp
      FROM cand c JOIN pri{k} p ON p.query_id = c.query_id
      WHERE NOT EXISTS (SELECT 1 FROM pri{k} x
                        WHERE x.query_id = c.query_id AND x.vec_id = c.vec_id)
      GROUP BY c.query_id, c.vec_id
    ), p{k} AS MATERIALIZED (
      SELECT query_id, vec_id, score AS mmr_score, cvec FROM (
        SELECT query_id, vec_id, cvec,
               round({lam_s} * sim - {mu_s} * maxp, 6) AS score,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY round({lam_s} * sim - {mu_s} * maxp, 6) DESC, vec_id) AS rn
        FROM pen{k}) WHERE rn = 1
    )"""
        )
    finals = "\n    UNION ALL\n    ".join(
        f"SELECT query_id, {k} AS pick_order, vec_id, mmr_score FROM p{k}"
        for k in range(1, nsel + 1)
    )
    return "".join(parts) + "\n    " + finals


@register("emb_mmr_select", _sql_mmr())
def emb_mmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-ranking (similarity.mmr_select): 3 greedy picks
    from each query's top-10 — relevance minus redundancy, no driver
    collect (the greedy chain is n_select DataFrame stages over bounded
    candidate sets), bit-identical to the unrolled-greedy oracle."""
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe.similarity import mmr_select

    e = _t(spark, sf_dir, "embeddings")
    return mmr_select(e, e.filter(F.col("vec_id") < 3), n_candidates=10, n_select=3)
