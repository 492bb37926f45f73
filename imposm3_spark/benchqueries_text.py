"""Span-dedup / chunking / TF-IDF / inverted-index / moving-window queries.

Registered into the shared QUERIES/ORACLES registry. Each Spark
implementation (datapipe.chunking) has a line-for-line ANSI-SQL oracle
here: identical tokenization (regexp split of trimmed lowered text),
identical span/chunk arithmetic, identical rounding — so the driver's
sorted-column value hash matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from imposm3_spark.benchqueries import _cents_sum, _t, register
from imposm3_spark.datapipe import chunking as ck

# shared tokenizer CTE: one row per non-empty document with its token array
_TOKS = """
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents
  WHERE length(trim(text)) > 0
)
"""


@register(
    "doc_span_dedup",
    f"""
    WITH {_TOKS},
    spans AS (
      SELECT doc_id, t,
             unnest(range(0, CAST(ceil(len(t) / 20.0) AS BIGINT))) AS span_idx
      FROM toks
    ),
    sel AS (
      SELECT doc_id, span_idx,
             array_to_string(t[span_idx*20+1 : span_idx*20+20], ' ') AS span
      FROM spans
    ),
    ranked AS (
      SELECT doc_id, span_idx, span,
             row_number() OVER (PARTITION BY span ORDER BY doc_id, span_idx) AS rn
      FROM sel
    )
    SELECT doc_id,
           count(*) AS n_spans,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           coalesce(
             array_to_string(list(span ORDER BY span_idx) FILTER (WHERE rn = 1), ' '),
             '') AS dedup_text
    FROM ranked
    GROUP BY doc_id
    """,
)
def doc_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style span-level dedup: 20-token windows, corpus-global
    keep-first, documents reassembled from surviving spans."""
    return ck.span_dedup(_t(spark, sf_dir, "documents"), width=20)


@register(
    "doc_chunk_overlap",
    f"""
    WITH {_TOKS},
    idx AS (
      SELECT doc_id, t,
             unnest(range(0,
               1 + CAST(ceil(greatest(len(t) - 40, 0) / 30.0) AS BIGINT))) AS chunk_id
      FROM toks
    )
    SELECT doc_id, chunk_id,
           len(t[chunk_id*30+1 : chunk_id*30+40]) AS n_chunk_tokens,
           array_to_string(t[chunk_id*30+1 : chunk_id*30+40], ' ') AS chunk_text
    FROM idx
    """,
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-budget training chunks: 40 tokens per chunk, stride 30
    (10-token overlap). Zero-shuffle expression + posexplode."""
    return ck.chunk_overlap(
        _t(spark, sf_dir, "documents"), chunk_size=40, stride=30
    )


@register(
    "doc_tfidf_topk",
    f"""
    WITH {_TOKS},
    tc AS (SELECT doc_id, unnest(t) AS term FROM toks),
    cnts AS (SELECT doc_id, term, count(*) AS cnt FROM tc GROUP BY 1, 2),
    dfs AS (SELECT term, count(*) AS df FROM cnts GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, cnts.term, cnt, df,
             round(cnt * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
      FROM cnts JOIN dfs USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
      FROM scored
    )
    SELECT doc_id, term, cnt, df, tfidf FROM ranked WHERE rn <= 5
    """,
)
def doc_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 terms by tf*ln(N/df); one corpus text pass
    (df reuses the grouped counts), map-side partial aggregation."""
    return ck.tfidf_topk(_t(spark, sf_dir, "documents"), k=5)


@register(
    "doc_inverted_index",
    f"""
    WITH {_TOKS},
    pairs AS (SELECT DISTINCT doc_id, unnest(t) AS term FROM toks)
    SELECT term, count(*) AS df,
           array_to_string(
             list_slice(list(doc_id ORDER BY doc_id), 1, 20), ',') AS postings
    FROM pairs
    GROUP BY term
    """,
)
def doc_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term -> ascending doc_id posting list (first 20): the retrieval
    artifact of a corpus build. Only (term, doc_id) pairs shuffle.

    The posting list is rendered as a comma-joined string: the driver's
    comparator canonicalizes with pandas ``sort_values``, which cannot
    hash ArrayType cells (round-8 forensics — ``TypeError: unhashable
    type: 'list'``). Integer->string casts are engine-identical, so the
    flattening is lossless for the hash gate."""
    idx = ck.inverted_index(_t(spark, sf_dir, "documents"), max_postings=20)
    return idx.select(
        "term",
        "df",
        F.array_join(
            F.transform(F.col("postings"), lambda x: x.cast("string")), ","
        ).alias("postings"),
    )


@register(
    "events_moving_avg",
    """
    SELECT event_id, user_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE)
             / count(*) OVER w / 100.0 AS mavg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing moving average (current + 3 preceding rows):
    single hash exchange on user_id, frame evaluated in one sorted pass."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-3, 0)
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    return ev.select(
        "event_id",
        "user_id",
        (
            F.sum(cents).over(w).cast("double") / F.count("*").over(w) / F.lit(100.0)
        ).alias("mavg"),
    )


@register(
    "events_session_window",
    """
    WITH flagged AS (
      SELECT event_type, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ), sess AS (
      SELECT event_type, ts, value,
             sum(is_new) OVER (PARTITION BY event_type ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT event_type,
           min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS total_value
    FROM sess GROUP BY event_type, sid
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (30-min gap) in batch mode, hash-checked
    against the gaps-and-islands SQL formulation — pins that
    `F.session_window`'s merge semantics (end = last event + gap) match
    the classic lag/running-sum sessionization. One exchange on the key."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(F.count("*").alias("n"), _cents_sum("value").alias("total_value"))
        .select(
            "event_type",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
            "total_value",
        )
    )


@register(
    "events_json_props",
    """
    SELECT event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
             / count(*) / 100.0 AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the JSON `props` column with a
    typed schema (from_json is codegen'd JVM-side — no UDF), bucket the
    extracted field, aggregate. The JSON parse happens once per row at
    scan speed; only the (type, bucket) aggregate shuffles."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "k", F.from_json(F.col("props"), "k BIGINT")["k"]
    )
    return parsed.groupBy(
        "event_type", (F.col("k") % 10).alias("k_bucket")
    ).agg(
        F.count("*").alias("n"),
        (
            F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("double")
            / F.count("*")
            / F.lit(100.0)
        ).alias("avg_value"),
    )


@register(
    "events_cube_distinct",
    """
    WITH ev AS (
      SELECT event_type, CAST(date_part('day', ts) AS INT) AS d, user_id
      FROM events
    )
    SELECT event_type, d,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users,
           CAST(grouping(event_type) AS INT) AS g_type,
           CAST(grouping(d) AS INT) AS g_day
    FROM ev GROUP BY CUBE (event_type, d)
    """,
)
def events_cube_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE lattice with an exact distinct-count: exercises the expand +
    two-phase distinct aggregation (partial on (gid, keys, user), final
    count) — the shape that keeps exact COUNT(DISTINCT) scalable instead
    of collecting per-group sets."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.dayofmonth("ts").cast("int").alias("d"), "user_id"
    )
    return ev.cube("event_type", "d").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.grouping("event_type").cast("int").alias("g_type"),
        F.grouping("d").cast("int").alias("g_day"),
    )


@register(
    "emb_label_centroids",
    """
    WITH dims AS (
      SELECT label, unnest(range(0, len(embedding))) AS dim, embedding AS e
      FROM embeddings
    )
    SELECT label, dim,
           CAST(sum(CAST(floor(CAST(e[dim + 1] AS DOUBLE) * 1000000.0) AS BIGINT))
                AS DOUBLE) / count(*) / 1000000.0 AS c
    FROM dims GROUP BY label, dim
    """,
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid (the class-prototype / IVF-training
    primitive) as (label, dim, c) rows: posexplode -> partial-agg avg.
    The (label, dim) key spreads one vector across dim-many reducers, so
    no single task ever holds a label's full vector set — at 100 TB the
    alternative groupBy(label) + UDF mean concentrates each label's
    vectors in one task."""
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            (
                F.sum(
                    F.floor(F.col("v").cast("double") * F.lit(1000000.0)).cast("bigint")
                ).cast("double")
                / F.count("*")
                / F.lit(1000000.0)
            ).alias("c")
        )
    )


@register(
    "events_retention",
    """
    WITH firsts AS (
      SELECT user_id, min(CAST(date_part('day', ts) AS INT)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             CAST(date_part('day', e.ts) AS INT) - f.cohort_day AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_day, day_offset, count(*) AS n_users
    FROM activity WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    per day-offset for the first week. The cohort table is user-sized and
    broadcasts back onto events; distinct (user, offset) pairs
    partial-aggregate before the final matrix."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.dayofmonth("ts").cast("int").alias("d")
    )
    firsts = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    activity = (
        ev.join(F.broadcast(firsts), "user_id")
        .select("user_id", "cohort_day", (F.col("d") - F.col("cohort_day")).alias("day_offset"))
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "doc_split_assign",
    """
    WITH h AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS bucket
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN bucket % 100 < 98 THEN 'train'
                WHEN bucket % 100 < 99 THEN 'valid'
                ELSE 'test' END AS split
    FROM h
    """,
)
def doc_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment (98/1/1): a salted md5 of
    the id decides the split — stable across runs, engines, partitionings,
    and corpus growth (a document never migrates between splits). Pure
    expression, zero shuffle."""
    d = _t(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    return d.select(
        "doc_id",
        "lang",
        F.when(bucket % 100 < 98, "train")
        .when(bucket % 100 < 99, "valid")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "doc_budget_select",
    """
    WITH scored AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS n_tokens,
             round(len(string_split(text, 'a')) / 10.0, 6) AS pri
      FROM documents WHERE length(trim(text)) > 0
    ),
    ranked AS (
      SELECT doc_id, n_tokens, pri,
             CAST(sum(n_tokens) OVER (ORDER BY pri DESC, doc_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_tokens
      FROM scored
    )
    SELECT doc_id, n_tokens, pri, cum_tokens
    FROM ranked WHERE cum_tokens <= 10000
    """,
)
def doc_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget data selection: rank documents by a priority score and
    keep the prefix whose cumulative token count fits the budget (greedy
    'best data under N tokens'). Runs the DISTRIBUTED two-phase prefix
    sum (datapipe.sampling.budget_select): range partition + local sort,
    driver-sized partition-total prefix sum, per-partition offset filter —
    never a single-task global window. The unique-id tie-break makes the
    selected set partitioning-independent, which is exactly what the SQL
    oracle's global window pins."""
    from imposm3_spark.datapipe.sampling import budget_select

    d = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    scored = d.select(
        "doc_id",
        F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n_tokens"),
        F.round((F.size(F.split(F.col("text"), "a", -1)) / 10.0), 6).alias("pri"),
    )
    return budget_select(scored, "pri", "n_tokens", 10000)


@register(
    "doc_pairgraph_triangles",
    """
    WITH nodes AS (
      -- blocking-key graph: docs sharing (lang, size-bucket) are connected
      -- (a < b) — the SQL-reproducible stand-in for an LSH bucket graph
      SELECT doc_id, lang || '|' || CAST(n_chars % 50 AS VARCHAR) AS grp
      FROM documents
    ),
    edges AS (
      SELECT a.doc_id AS a, b.doc_id AS b
      FROM nodes a JOIN nodes b ON a.grp = b.grp AND a.doc_id < b.doc_id
    )
    SELECT count(*) AS n_triangles FROM (
      SELECT e1.a, e1.b, e2.b AS c
      FROM edges e1
      JOIN edges e2 ON e1.b = e2.a
      JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    """,
)
def doc_pairgraph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over a candidate-pair graph (a<b edges from a
    blocking key — deterministic, SQL-reproducible; 899 triangles at
    sf0.01). The classic distributed triple self-join: each join is an
    equi-join on one endpoint and the a<b<c orientation counts each
    triangle once. At scale the degree-ordering trick (orient edges
    low->high degree) bounds the intermediate; orientation here is by
    id, the same shape."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.col("lang"), F.lit("|"), (F.col("n_chars") % 50).cast("string")).alias("grp"),
    )
    a = d.select(F.col("grp"), F.col("doc_id").alias("a"))
    b = d.select(F.col("grp"), F.col("doc_id").alias("b"))
    edges = (
        a.join(b, "grp").filter(F.col("a") < F.col("b")).select("a", "b")
    )
    e1 = edges
    e2 = edges.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = edges.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        e1.join(e2, "b")
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
    )
    return tri.agg(F.count("*").alias("n_triangles"))


@register(
    "doc_corpus_diff",
    """
    WITH old AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
    ),
    new AS (
      SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN upper(text) ELSE text END AS text
      FROM documents WHERE doc_id % 7 <> 0
    )
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                ELSE 'changed' END AS change
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    WHERE o.doc_id IS NULL OR n.doc_id IS NULL
       OR md5(o.text) <> md5(n.text)
    """,
)
def doc_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (dataset-version CDC): classify documents as
    added / removed / changed between two corpus versions by a full outer
    join on id + content-hash compare — the incremental-ingest primitive
    (only the diff re-enters the dedup/curation pipeline downstream).
    Hashes, not full texts, feed the comparison; one co-partitioned
    join."""
    d = _t(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 10 != 0).select("doc_id", F.md5("text").alias("h"))
    new = (
        d.filter(F.col("doc_id") % 7 != 0)
        .select(
            "doc_id",
            F.md5(
                F.when(F.col("doc_id") % 13 == 0, F.upper("text")).otherwise(F.col("text"))
            ).alias("h"),
        )
    )
    j = old.withColumnsRenamed({"doc_id": "o_id", "h": "o_h"}).join(
        new.withColumnsRenamed({"doc_id": "n_id", "h": "n_h"}),
        F.col("o_id") == F.col("n_id"),
        "full_outer",
    )
    return (
        j.filter(
            F.col("o_id").isNull() | F.col("n_id").isNull() | (F.col("o_h") != F.col("n_h"))
        )
        .select(
            F.coalesce("o_id", "n_id").alias("doc_id"),
            F.when(F.col("o_id").isNull(), "added")
            .when(F.col("n_id").isNull(), "removed")
            .otherwise("changed")
            .alias("change"),
        )
    )


@register(
    "events_funnel",
    """
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
      FROM events GROUP BY user_id
    )
    SELECT
      count(*) AS n_users,
      CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_view,
      CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
               THEN 1 ELSE 0 END) AS BIGINT) AS step_click,
      CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_buy > t_click
               THEN 1 ELSE 0 END) AS BIGINT) AS step_purchase
    FROM per_user
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view -> click -> purchase): one
    conditional-min aggregation per user (a single map-side-combinable
    pass over the events — NOT a per-step self-join, which at 100 TB
    multiplies the fact table), then ordering predicates on the
    first-occurrence timestamps."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    reached_view = F.col("t_view").isNotNull()
    reached_click = reached_view & (F.col("t_click") > F.col("t_view"))
    reached_buy = reached_click & (F.col("t_buy") > F.col("t_click"))
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.sum(reached_view.cast("long")).alias("step_view"),
        F.sum(reached_click.cast("long")).alias("step_click"),
        F.sum(reached_buy.cast("long")).alias("step_purchase"),
    )


@register(
    "events_pivot",
    """
    SELECT CAST(date_part('day', ts) AS INT) AS d,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
    FROM events GROUP BY 1
    """,
)
def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (day x event_type count matrix) through the native
    `.pivot()` API with explicit values — explicit values keep it ONE
    aggregation pass (omitting them costs an extra distinct-values job
    at scale)."""
    ev = _t(spark, sf_dir, "events")
    out = (
        ev.groupBy(F.dayofmonth("ts").cast("int").alias("d"))
        .pivot("event_type", ["view", "click", "purchase", "signup", "error"])
        .count()
    )
    # pivot yields nullable counts: absent combos -> 0 to match the oracle
    return out.select(
        "d", *[F.coalesce(F.col(c), F.lit(0)).alias(c)
               for c in ("view", "click", "purchase", "signup", "error")]
    )


@register(
    "lineitem_unpivot",
    """
    SELECT l_orderkey, l_linenumber, measure, round(val, 2) AS val
    FROM (
      SELECT l_orderkey, l_linenumber,
             unnest(['quantity', 'extendedprice', 'discount']) AS measure,
             unnest([CAST(l_quantity AS DOUBLE), l_extendedprice, l_discount]) AS val
      FROM lineitem
    )
    WHERE l_orderkey % 100 = 0
    """,
)
def lineitem_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide measures -> long rows) via the native
    `unpivot` API — a zero-shuffle row expansion, the inverse of pivot."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("double").alias("quantity"),
            F.col("l_extendedprice").alias("extendedprice"),
            F.col("l_discount").alias("discount"),
        )
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["quantity", "extendedprice", "discount"],
            "measure",
            "raw",
        )
        .select(
            "l_orderkey", "l_linenumber", "measure", F.round("raw", 2).alias("val")
        )
    )


@register(
    "orders_price_deciles",
    """
    SELECT decile,
           count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM (
      SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    GROUP BY decile
    """,
)
def orders_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile banding with ntile semantics but WITHOUT the single-task
    global window: two-phase global row numbers (range partition + local
    sort + driver offset prefix sum — sampling.with_global_row_numbers),
    then the exact ntile bucket formula from (rn, total): the first
    total%10 buckets carry one extra row. The unique-key tie-break pins
    deterministic band edges across engines."""
    from imposm3_spark.datapipe.sampling import with_global_row_numbers

    o = _t(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    numbered = with_global_row_numbers(
        o, [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()]
    )
    total = numbered.count()
    q, r = divmod(total, 10)
    big = r * (q + 1)  # rows covered by the (q+1)-sized leading buckets
    decile = F.when(
        F.col("rn") <= big, ((F.col("rn") - 1) / (q + 1)).cast("long") + 1
    ).otherwise(((F.col("rn") - 1 - big) / q).cast("long") + 1 + r) if q else (
        F.col("rn")
    )
    return (
        numbered.select("o_totalprice", decile.cast("int").alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@register(
    "events_asof_nearest",
    """
    SELECT p.event_id, p.user_id,
           (SELECT min(abs(epoch_us(c.ts) - epoch_us(p.ts)))
            FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click') AS gap_us
    FROM events p WHERE p.event_type = 'purchase'
    """,
)
def events_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time join: for every purchase, the time gap to the
    user's closest click in EITHER direction — composed from two as-of
    merge-scan passes (backward latest-preceding + forward
    earliest-following), one key-partitioned sort each, never a per-row
    scan of the right side. The oracle's correlated min(abs()) pins the
    same value."""
    from imposm3_spark.datapipe.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    back = asof_join(
        purchases, clicks.withColumnRenamed("c_ts", "prev_ts"),
        on="user_id", left_time="ts", right_time="prev_ts",
        right_payload=["prev_ts"],
    )
    both = asof_join(
        back, clicks.withColumnRenamed("c_ts", "next_ts"),
        on="user_id", left_time="ts", right_time="next_ts",
        right_payload=["next_ts"], direction="forward",
    )
    # NTZ timestamps: cast before unix_micros; the (fixed) session-zone
    # offset cancels in the differences
    def us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    gap = F.least(us("ts") - us("prev_ts"), us("next_ts") - us("ts"))
    return both.select("event_id", "user_id", gap.alias("gap_us"))


@register(
    "emb_norm_stats",
    """
    WITH norms AS (
      SELECT label,
             sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                          x -> x * x))) AS nrm
      FROM embeddings
    )
    , q AS (
      SELECT label, CAST(floor(nrm * 1000000.0) AS BIGINT) AS nq FROM norms
    )
    SELECT label, count(*) AS n,
           CAST(sum(nq) AS DOUBLE) / count(*) / 1000000.0 AS avg_norm,
           CAST(min(nq) AS DOUBLE) / 1000000.0 AS min_norm,
           CAST(max(nq) AS DOUBLE) / 1000000.0 AS max_norm
    FROM q GROUP BY label
    """,
)
def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2-norm distribution per label: an in-row array fold
    (F.aggregate — JVM-side, zero shuffle) feeding one partial-agg
    group — the standard pre-normalization sanity scan of an embedding
    corpus."""
    e = _t(spark, sf_dir, "embeddings")
    nrm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    nq = F.floor(nrm * F.lit(1000000.0)).cast("bigint")
    return (
        e.select("label", nq.alias("nq"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            (F.sum("nq").cast("double") / F.count("*") / F.lit(1000000.0)).alias(
                "avg_norm"
            ),
            (F.min("nq").cast("double") / F.lit(1000000.0)).alias("min_norm"),
            (F.max("nq").cast("double") / F.lit(1000000.0)).alias("max_norm"),
        )
    )


@register(
    "doc_quality_matrix",
    """
    WITH toks AS (
      SELECT doc_id, lang,
             CASE WHEN trim(text) = '' THEN []
                  ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS tokens,
             text
      FROM documents
    ), feat AS (
      SELECT doc_id, lang,
             (CASE WHEN len(tokens) BETWEEN 10 AND 10000 THEN 1 ELSE 0 END)
           + (CASE WHEN len(tokens) > 0 AND
                 CAST(len(list_filter(tokens,
                     t -> t IN ('the','and','of','to','a','in','is','that'))) AS DOUBLE)
                 / len(tokens) > 0.01 THEN 1 ELSE 0 END)
           + (CASE WHEN length(text) = 0 OR
                 CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
                 / length(text) < 0.2 THEN 1 ELSE 0 END)
           + (CASE WHEN len(tokens) > 0 AND
                 CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
                 / len(tokens) BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END) AS band
      FROM toks
    )
    SELECT lang, band, count(*) AS n
    FROM feat GROUP BY lang, band
    """,
)
def doc_quality_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language x quality-band census (band = number of quality criteria
    met, 0-4 = quality_score/0.25): the corpus health dashboard query —
    zero-shuffle scoring, one tiny aggregate."""
    from imposm3_spark.datapipe.text import quality_score

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("lang", (quality_score(F.col("text")) / 0.25).cast("int").alias("band"))
        .groupBy("lang", "band")
        .agg(F.count("*").alias("n"))
    )
