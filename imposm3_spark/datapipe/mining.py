"""Market-basket co-occurrence mining: frequent item pairs over an
order/basket table (the candidate-pair generation step of Apriori / the
pair special-case of FP-growth).

Reference parity note: imposm3 has no mining surface; this is part of the
analytics-engine extension set for large-scale pipelines (co-purchase
graphs, co-occurrence statistics for feature engineering).

Scale design (100 TB):

* Pair generation is done per basket AFTER a distinct projection, so the
  blow-up per basket is C(b, 2) with b = basket size — bounded by the
  schema (TPC-H orders hold at most 7 lines), never by corpus size.
* The self-join runs on the SAME deduplicated DataFrame on the basket
  key, so Catalyst/AQE reuses one shuffle exchange for both sides and
  the join is co-partitioned — one shuffle for the join, one for the
  final pair aggregation (map-side partial combine applies).
* Support filtering happens in the aggregation (HAVING), so nothing
  rarer than `min_support` survives the shuffle boundary to the driver.
* Lift/confidence are computed from exact BIGINT counts with per-term
  double casts in a fixed order, so the DuckDB oracle hash-matches
  bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def frequent_item_pairs(
    baskets: DataFrame,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 2,
) -> DataFrame:
    """Frequent unordered item pairs: items co-occurring in at least
    `min_support` distinct baskets, with support counts, per-item counts,
    and lift relative to independent occurrence.

    Output columns: item_a, item_b (item_a < item_b), pair_count,
    count_a, count_b, lift — where lift = (pair_count * n_baskets) /
    (count_a * count_b), computed as one fixed-order float expression
    over exact integers.
    """
    items = baskets.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()

    # Both join sides come from the same `items` plan → one exchange,
    # reused; the equi-join on `basket` is co-partitioned.
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(b, on="basket")
        .where(F.col("a.item") < F.col("b.item"))
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= min_support)
    )

    item_counts = items.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    # Basket total as a 1-row aggregate folded into the same plan (no
    # separate driver count() job); Catalyst reuses the `items` exchange
    # for every consumer.
    nb = items.agg(F.count_distinct("basket").alias("_nb"))

    # Per-item counts are a small dimension relative to the pair table —
    # broadcast them onto the pairs.
    out = (
        pairs.join(
            F.broadcast(item_counts.withColumnRenamed("item", "item_a")
                        .withColumnRenamed("cnt", "count_a")),
            on="item_a",
        )
        .join(
            F.broadcast(item_counts.withColumnRenamed("item", "item_b")
                        .withColumnRenamed("cnt", "count_b")),
            on="item_b",
        )
        .join(F.broadcast(nb))
        .select(
            "item_a",
            "item_b",
            "pair_count",
            "count_a",
            "count_b",
            F.round(
                (F.col("pair_count").cast("double") * F.col("_nb").cast("double"))
                / (F.col("count_a").cast("double") * F.col("count_b").cast("double")),
                6,
            ).alias("lift"),
        )
    )
    return out


def rfm_segments(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    price_col: str = "o_totalprice",
    ref_date: str = "1999-01-01",
) -> DataFrame:
    """RFM customer segmentation: per-customer Recency (days from last
    order to `ref_date`), Frequency (order count), Monetary (exact cents),
    each scored 1-4 against the population's exact quartile thresholds,
    aggregated to segment cells.

    Scale design: ONE shuffle builds the per-customer table (map-side
    combinable agg); quartile thresholds are a 1-row aggregate broadcast
    back onto it (never a global sort / single-task ntile — threshold
    scoring replaces rank binning, the standard trade at corpus scale);
    the final segment rollup is a k<=64-group aggregate. Recency uses
    calendar-field day arithmetic (timezone-proof); Monetary stays in
    BIGINT cents so threshold comparisons are exact.
    """
    per_cust = (
        orders.select(
            F.col(cust_col).alias("cust"),
            F.to_date(date_col).alias("d"),
            F.round(F.col(price_col) * 100).cast("bigint").alias("cents"),
        )
        .groupBy("cust")
        .agg(
            F.datediff(F.lit(ref_date).cast("date"), F.max("d")).alias("recency"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("cents").alias("monetary"),
        )
    )
    qs = per_cust.agg(
        F.expr("percentile(recency, array(0.25D, 0.5D, 0.75D))").alias("rq"),
        F.expr("percentile(frequency, array(0.25D, 0.5D, 0.75D))").alias("fq"),
        F.expr("percentile(monetary, array(0.25D, 0.5D, 0.75D))").alias("mq"),
    )

    def score(col: str, arr: str) -> F.Column:
        v = F.col(col).cast("double")
        return (
            F.lit(1)
            + (v > F.element_at(F.col(arr), 1)).cast("int")
            + (v > F.element_at(F.col(arr), 2)).cast("int")
            + (v > F.element_at(F.col(arr), 3)).cast("int")
        )

    scored = per_cust.join(F.broadcast(qs)).select(
        "cust",
        "monetary",
        # low recency is GOOD: invert so 4 = most recent quartile
        (F.lit(5) - score("recency", "rq")).alias("r_score"),
        score("frequency", "fq").alias("f_score"),
        score("monetary", "mq").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                F.sum("monetary").cast("double") / F.lit(100.0), 2
            ).alias("total_monetary"),
        )
    )


def fuzzy_pairs_edit1(
    df: DataFrame,
    id_col: str,
    name_col: str,
) -> DataFrame:
    """Entity-resolution candidate pairs within edit distance 1, via
    deletion-neighbourhood blocking: two strings are within one
    substitution/insertion/deletion iff SOME single-character deletion
    (or the identity for the shorter side) makes them collide, so each
    row emits its L+1 deletion variants (plus the identity) and only rows
    sharing a variant are compared: a substitution pair collides on the
    same-position deletions, an insert/delete pair collides on
    longer-side-deletion == shorter-side-identity, an exact dupe on the
    identities — so recall is 1 for dist <= 1 by construction.

    Scale design (the point vs a naive cross join): replication is
    L+1 per row (bounded by string length), the join is a hash equi-join
    on xxhash64 of the variant (8 bytes per shuffle key instead of the
    L-char string; a hash collision can only ADD a candidate, and the
    exact verify removes it — recall unaffected, precision restored),
    and the exact `levenshtein` verify runs ONLY on block collisions —
    O(n * L) shuffle instead of O(n^2) comparisons. Block-skew (a hot
    variant) is bounded by how many strings share a deletion image;
    duplicate candidate pairs from multiple shared blocks are collapsed
    with one distinct before the verify.

    Output: (a_id, b_id, a_name, b_name, dist<=1), a_id < b_id.
    """
    from imposm3_spark.datapipe.sampling import spread_small_input

    # spread: the L+1-variant explode + per-variant substring/hash work
    # runs in the scan stage — one task on a sub-split source
    base = spread_small_input(df).select(
        F.col(id_col).alias("id"), F.col(name_col).alias("name")
    )
    n = F.length("name")
    # position 0 = identity (catches exact dupes and pure insert/delete),
    # position p>=1 = name with character p removed
    variants = base.select(
        "id",
        "name",
        F.explode(
            F.concat(
                F.array(F.struct(F.lit(0).alias("p"), F.col("name").alias("v"))),
                F.transform(
                    F.sequence(F.lit(1), n),
                    lambda p: F.struct(
                        p.cast("int").alias("p"),
                        F.concat(
                            F.substring(F.col("name"), 1, (p - 1).cast("int")),
                            F.col("name").substr(p + 1, n),
                        ).alias("v"),
                    ),
                ),
            )
        ).alias("blk"),
    ).select("id", "name", F.xxhash64(F.col("blk.v")).alias("v"))

    a = variants.alias("a")
    b = variants.alias("b")
    # verify BEFORE the dedup: the levenshtein filter is a cheap JVM
    # expression on the join output, so the expensive distinct runs on
    # true pairs (x block multiplicity) instead of every block collision
    return (
        a.join(b, on="v")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.col("a.name").alias("a_name"),
            F.col("b.name").alias("b_name"),
            F.levenshtein(F.col("a.name"), F.col("b.name")).alias("dist"),
        )
        .where(F.col("dist") <= 1)
        .distinct()
    )


def top_paths(
    df: DataFrame,
    key_col: str = "user_id",
    cat_col: str = "event_type",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    depth: int = 3,
    topn: int = 10,
) -> DataFrame:
    """Sequential path mining: the most common first-`depth` event-type
    journeys (the Sankey/onboarding-funnel aggregation). Keys with fewer
    than `depth` events are skipped so every path has equal length.

    Determinism: the per-key ordering ties on the unique second order
    column, the path folds in rank order via a sorted struct array, and
    the top-n tie-breaks on the path string itself.

    Scale: one keyed exchange for the rank window, one
    map-side-combinable count on the (tiny) path key space, and a
    TakeOrdered top-n (per-partition heaps — never a global sort).
    """
    w = Window.partitionBy(key_col).orderBy(*[F.asc(c) for c in order_cols])
    firstk = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= depth)
        .groupBy(key_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_rn", F.col(cat_col).alias("c")))),
                    lambda s: s["c"],
                ),
                ">",
            ).alias("path"),
            F.count("*").alias("_k"),
        )
        .filter(F.col("_k") == depth)
    )
    counts = firstk.groupBy("path").agg(F.count("*").alias("n_users"))
    return counts.orderBy(F.desc("n_users"), F.asc("path")).limit(topn)


def last_touch_attribution(
    df: DataFrame,
    key_col: str = "user_id",
    cat_col: str = "event_type",
    conversion: str = "purchase",
    value_col: str = "value",
    order_cols: tuple[str, str] = ("ts", "event_id"),
) -> DataFrame:
    """Marketing-style last-touch attribution: every conversion event is
    credited to the key's most recent NON-conversion event type strictly
    before it; conversions with no prior touch fall into the '(none)'
    channel. Returns per-channel conversion count and exact revenue.

    Exactness: revenue sums integer cents; the channel assignment is a
    deterministic keyed window (last non-null over an unbounded-preceding
    frame with a unique tie-break ordering).

    Scale: one keyed exchange for the window; the channel aggregation is
    map-side combinable on a category-sized key space.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col(cat_col) != conversion, F.col(cat_col)), ignorenulls=True
    ).over(w)
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    conv = (
        df.withColumn("channel", F.coalesce(touch, F.lit("(none)")))
        .filter(F.col(cat_col) == conversion)
        .withColumn("cents", cents)
    )
    return (
        conv.groupBy("channel")
        .agg(
            F.count("*").alias("conversions"),
            (F.sum("cents").cast("double") / 100.0).alias("revenue"),
        )
        .select("channel", "conversions", F.round("revenue", 2).alias("revenue"))
    )


def funnel_timebound(
    df: DataFrame,
    steps: tuple[str, str, str] = ("signup", "click", "purchase"),
    within_hours: int = 24,
    key_col: str = "user_id",
    cat_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Time-constrained conversion funnel: step N counts only if it
    happens strictly after step N-1's first qualifying occurrence and
    within ``within_hours`` of it — the realistic funnel (the unbounded
    variant, events_funnel, credits conversions months apart).

    Returns one row per user who completed step 1: (key, stage,
    convert_s) where stage is the deepest step reached (1..3) and
    convert_s the exact seconds from step-1 to step-3 (NULL below 3).

    Scale: three keyed conditional-min aggregations chained by joins —
    all on the SAME key partitioning, so the exchanges collapse to one
    shuffle of the filtered step streams; nothing iterates and no
    per-user event list is ever materialized.
    """
    s1, s2, s3 = steps
    within = F.expr(f"INTERVAL {within_hours} HOURS")
    ev = df.select(F.col(key_col).alias("k"), F.col(cat_col).alias("c"), F.col(ts_col).alias("t"))
    a1 = ev.filter(F.col("c") == s1).groupBy("k").agg(F.min("t").alias("t1"))
    a2 = (
        ev.filter(F.col("c") == s2)
        .join(a1, "k")
        .where((F.col("t") > F.col("t1")) & (F.col("t") <= F.col("t1") + within))
        .groupBy("k")
        .agg(F.min("t").alias("t2"))
    )
    a3 = (
        ev.filter(F.col("c") == s3)
        .join(a2, "k")
        .where((F.col("t") > F.col("t2")) & (F.col("t") <= F.col("t2") + within))
        .groupBy("k")
        .agg(F.min("t").alias("t3"))
    )
    out = a1.join(a2, "k", "left").join(a3, "k", "left")
    stage = (
        F.lit(1)
        + F.when(F.col("t2").isNotNull(), 1).otherwise(0)
        + F.when(F.col("t3").isNotNull(), 1).otherwise(0)
    )
    convert_s = F.unix_timestamp(F.col("t3")) - F.unix_timestamp(F.col("t1"))
    return out.select(
        F.col("k").alias(key_col), stage.alias("stage"), convert_s.alias("convert_s")
    )


def sequence_pair_support(
    df: DataFrame,
    key_col: str = "user_id",
    cat_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Sequential-pattern support (the GSP/PrefixSpan 2-sequence step):
    for every ordered category pair (a, b), how many keys exhibit "some
    a happens BEFORE some b". A key supports (a, b) iff its earliest a
    precedes its latest b — an exact reduction to the per-(key,
    category) interval table, so support counting never touches event
    pairs.

    Returns (type_a, type_b, support, support_frac) for a != b.

    Scale: one keyed aggregation to the (key, category) min/max table
    (categories-per-key rows), a per-key self-join bounded by
    categories², and a count on the category-pair key space; the raw
    event stream is scanned once.
    """
    iv = df.groupBy(F.col(key_col).alias("k"), F.col(cat_col).alias("c")).agg(
        F.min(ts_col).alias("tmin"), F.max(ts_col).alias("tmax")
    )
    total = df.select(key_col).distinct().count()
    a = iv.select("k", F.col("c").alias("type_a"), F.col("tmin").alias("ta"))
    b = iv.select("k", F.col("c").alias("type_b"), F.col("tmax").alias("tb"))
    sup = (
        a.join(b, "k")
        .where((F.col("type_a") != F.col("type_b")) & (F.col("ta") < F.col("tb")))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("support"))
    )
    return sup.select(
        "type_a",
        "type_b",
        "support",
        F.round(F.col("support").cast("double") / F.lit(float(total)), 6).alias(
            "support_frac"
        ),
    )


def _llr_xlx(k: str, row: str, col: str) -> str:
    """One Dunning LLR cell term: k * ln(k*N / (row*col)), zero-guarded."""
    return (
        f"(CASE WHEN {k} > 0 THEN CAST({k} AS DOUBLE)"
        f" * ln(CAST({k} AS DOUBLE) * CAST(nn AS DOUBLE)"
        f" / (CAST({row} AS DOUBLE) * CAST({col} AS DOUBLE)))"
        " ELSE 0.0 END)"
    )


# Dunning log-likelihood ratio over the 2x2 bigram contingency table
# (k11 bigram, k12 = first-word remainder, k21 = second-word remainder,
# k22 = everything else), summed in fixed cell order 11,12,21,22 — ONE
# shared expression string, evaluated identically by Spark and DuckDB.
LLR = (
    "round(2.0 * ("
    + _llr_xlx("k11", "k11 + k12", "k11 + k21")
    + " + "
    + _llr_xlx("k12", "k11 + k12", "k12 + k22")
    + " + "
    + _llr_xlx("k21", "k21 + k22", "k11 + k21")
    + " + "
    + _llr_xlx("k22", "k21 + k22", "k12 + k22")
    + "), 6)"
)


def llr_collocations(
    docs: DataFrame,
    topn: int = 30,
    min_count: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Statistically-surprising adjacent word pairs by Dunning's
    log-likelihood ratio (Dunning, "Accurate Methods for the Statistics
    of Surprise and Coincidence", CL'93) — the collocation detector
    behind phrase discovery ("new york", "machine learning") that raw
    bigram counts get wrong (they just find frequent words).

    Exactness: all four contingency cells are exact BIGINTs from two
    aggregations over the bigram table; the LLR is the ONE shared
    expression string (mining.LLR). Top-n orders by (llr DESC, w1, w2) —
    a total order because llr is bit-identical on both engines.

    Scale: tokens explode linearly; bigram counts and the two marginal
    aggregations are map-side combinable; the marginals join back on the
    word key (no skew beyond natural word frequency, which the k11 >=
    min_count filter prunes first); top-n is a TakeOrdered, not a global
    sort.
    """
    from imposm3_spark.datapipe.text import tokens

    toks = docs.select(tokens(F.lower(F.col(text_col))).alias("tk"))
    seq = F.when(
        F.size("tk") >= 2,
        F.expr(
            "transform(sequence(1, size(tk) - 1),"
            " i -> struct(element_at(tk, i) AS w1, element_at(tk, i + 1) AS w2))"
        ),
    ).otherwise(F.expr("array()"))
    pairs = toks.select(F.explode(seq).alias("p")).select("p.w1", "p.w2")
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("k11"))
    c1 = big.groupBy("w1").agg(F.sum("k11").alias("c1w"))
    c2 = big.groupBy("w2").agg(F.sum("k11").alias("c2w"))
    nn = big.agg(F.sum("k11").alias("nn"))
    tab = (
        big.where(F.col("k11") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(nn))
        .select(
            "w1",
            "w2",
            "k11",
            (F.col("c1w") - F.col("k11")).alias("k12"),
            (F.col("c2w") - F.col("k11")).alias("k21"),
            (F.col("nn") - F.col("c1w") - F.col("c2w") + F.col("k11")).alias("k22"),
            "nn",
        )
    )
    return (
        tab.select("w1", "w2", "k11", F.expr(LLR).alias("llr"))
        .orderBy(F.desc("llr"), F.asc("w1"), F.asc("w2"))
        .limit(topn)
    )


def llr_collocations_oracle(topn: int = 30, min_count: int = 3) -> str:
    r"""DuckDB oracle for llr_collocations: same tokenization, same
    contingency cells, the identical LLR string."""
    return rf"""
    WITH toks AS (
      SELECT CASE WHEN trim(text) = '' THEN []
                  ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
      FROM documents
    ), pairs AS (
      SELECT tk[i] AS w1, tk[i + 1] AS w2
      FROM toks, unnest(range(1, len(tk))) AS u(i)
    ), big AS (
      SELECT w1, w2, count(*) AS k11 FROM pairs GROUP BY w1, w2
    ), c1 AS (SELECT w1, CAST(sum(k11) AS BIGINT) AS c1w FROM big GROUP BY w1),
    c2 AS (SELECT w2, CAST(sum(k11) AS BIGINT) AS c2w FROM big GROUP BY w2),
    nt AS (SELECT CAST(sum(k11) AS BIGINT) AS nn FROM big),
    tab AS (
      SELECT big.w1, big.w2, k11,
             c1w - k11 AS k12, c2w - k11 AS k21,
             nn - c1w - c2w + k11 AS k22, nn
      FROM big JOIN c1 ON big.w1 = c1.w1
               JOIN c2 ON big.w2 = c2.w2, nt
      WHERE k11 >= {min_count}
    )
    SELECT w1, w2, k11, {LLR} AS llr
    FROM tab ORDER BY llr DESC, w1, w2 LIMIT {topn}
    """


# Zipf OLS shared expressions over the four fold sums + the top-k count:
# slope = (n*sxy - sx*sy) / (n*sxx - sx*sx); intercept = (sy - slope*sx)/n.
ZIPF_SLOPE = (
    "((CAST(n AS DOUBLE)*sxy - sx*sy) / (CAST(n AS DOUBLE)*sxx - sx*sx))"
)
ZIPF_INTERCEPT = f"((sy - {ZIPF_SLOPE} * sx) / CAST(n AS DOUBLE))"


def zipf_fit(
    docs: DataFrame,
    topk: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Zipf's-law fit over the term frequency distribution: OLS of
    ln(freq) on ln(rank) for the top-`topk` terms — slope near -1 is the
    natural-language signature; flat slopes flag templated/synthetic
    corpora (the corpus-health sibling of doc_ngram_diversity).

    Exactness: ranks come from the (freq DESC, term) total order; the
    four OLS sums are fixed-order folds over the top-k list (bounded,
    collected into ONE array row); slope/intercept are shared expression
    strings. The fold's ln terms are per-element — no order-dependent
    float aggregation anywhere.

    Scale: term counting is one map-side-combinable aggregation; top-k
    is a TakeOrdered (bounded by topk, never vocabulary-sized); only the
    k survivors reach the single-row fold.
    """
    from imposm3_spark.datapipe.text import tokens

    tf = (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    top = tf.orderBy(F.desc("f"), F.asc("t")).limit(topk)
    arr = top.agg(
        F.sort_array(
            F.collect_list(F.struct((-F.col("f")).alias("nf"), F.col("t").alias("t")))
        ).alias("a"),
        F.count(F.lit(1)).alias("n"),
    )
    folds = arr.select(
        "n",
        F.expr(
            "aggregate(sequence(1, cast(n AS INT)), 0.0D,"
            " (acc, i) -> acc + ln(CAST(i AS DOUBLE)))"
        ).alias("sx"),
        F.expr(
            "aggregate(sequence(1, cast(n AS INT)), 0.0D,"
            " (acc, i) -> acc + ln(CAST(-a[i-1].nf AS DOUBLE)))"
        ).alias("sy"),
        F.expr(
            "aggregate(sequence(1, cast(n AS INT)), 0.0D,"
            " (acc, i) -> acc + ln(CAST(i AS DOUBLE)) * ln(CAST(-a[i-1].nf AS DOUBLE)))"
        ).alias("sxy"),
        F.expr(
            "aggregate(sequence(1, cast(n AS INT)), 0.0D,"
            " (acc, i) -> acc + ln(CAST(i AS DOUBLE)) * ln(CAST(i AS DOUBLE)))"
        ).alias("sxx"),
    )
    return folds.select(
        F.col("n").alias("n_terms"),
        F.round(F.expr(ZIPF_SLOPE), 6).alias("slope"),
        F.round(F.expr(ZIPF_INTERCEPT), 6).alias("intercept"),
    )


def zipf_fit_oracle(topk: int = 100) -> str:
    r"""DuckDB oracle for zipf_fit: identical top-k order, identical
    fixed-order folds (list_reduce's first element == fold's 0.0 + t1),
    identical shared expressions."""
    return rf"""
    WITH tf AS (
      SELECT t, count(*) AS f FROM (
        SELECT unnest(CASE WHEN trim(text) = '' THEN []
                      ELSE regexp_split_to_array(trim(lower(text)), '\s+') END) AS t
        FROM documents
      ) GROUP BY t
    ), top AS (
      SELECT f, t FROM tf ORDER BY f DESC, t LIMIT {topk}
    ), arr AS (
      SELECT list(struct_pack(nf := -f, t := t) ORDER BY -f, t) AS a,
             count(*) AS n
      FROM top
    ), folds AS (
      SELECT n,
        list_reduce(list_transform(range(1, CAST(n + 1 AS BIGINT)),
          i -> ln(CAST(i AS DOUBLE))), (x, y) -> x + y) AS sx,
        list_reduce(list_transform(range(1, CAST(n + 1 AS BIGINT)),
          i -> ln(CAST(-a[i].nf AS DOUBLE))), (x, y) -> x + y) AS sy,
        list_reduce(list_transform(range(1, CAST(n + 1 AS BIGINT)),
          i -> ln(CAST(i AS DOUBLE)) * ln(CAST(-a[i].nf AS DOUBLE))), (x, y) -> x + y) AS sxy,
        list_reduce(list_transform(range(1, CAST(n + 1 AS BIGINT)),
          i -> ln(CAST(i AS DOUBLE)) * ln(CAST(i AS DOUBLE))), (x, y) -> x + y) AS sxx
      FROM arr
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           round({ZIPF_SLOPE}, 6) AS slope,
           round({ZIPF_INTERCEPT}, 6) AS intercept
    FROM folds
    """
