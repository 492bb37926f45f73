"""Streaming-style statistics operators for large-scale event pipelines:
rolling anomaly detection, count-min-sketch heavy hitters, and mergeable
approximate distinct counts.

Reference parity note: imposm3 itself carries only import counters
(stats/ in the reference); these operators are the analytics-engine
extensions a 100 TB event/training-data pipeline needs on top.

Design rules shared by the module:

* **Integer-exact float paths.** Anything the DuckDB oracle value-hashes
  is computed from integer aggregates (cents, counts, sums of squares)
  with ONE explicitly-ordered float expression at the end, so both
  engines produce bit-identical doubles — no reliance on float summation
  order inside window frames.
* **No global windows.** Every window is partitioned by a key (user_id);
  the sketch aggregations are plain groupBys with map-side combine.
"""

from __future__ import annotations

import weakref as _weakref

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_zscore(
    events: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
    window: int = 20,
    min_periods: int = 8,
) -> DataFrame:
    """Per-key rolling z-score anomaly detection: for each event, z =
    (value - mean) / stddev over the PREVIOUS `window` events of the same
    key (ordered by `order_cols`), emitted when at least `min_periods`
    history rows exist and the history is non-constant.

    Exactness: `value` is money-like (2 decimals), so the computation runs
    on integer cents. With s = sum(cents), ss = sum(cents^2), n = count
    over the frame — all exact BIGINTs — the z-score reduces to

        z = A / sqrt(B * n / (n - 1)),  A = cents*n - s,  B = n*ss - s^2

    (dev = A/n, var_samp = B / (n*(n-1))). A and B are exact integers, so
    the one float expression evaluates bit-identically in any IEEE-754
    engine — the DuckDB oracle hash-matches without tolerance.

    Scale: one window partitioned by key (shuffles on key once, no global
    sort); frames are row-bounded so state per key is O(window). Skewed
    keys are bounded by per-user event counts, not corpus size.
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(-window, -1)
    )
    df = events.withColumn("_c", cents).select(
        "event_id",
        key_col,
        F.col("_c").alias("cents"),
        F.count("_c").over(w).alias("n"),
        F.sum("_c").over(w).alias("s"),
        F.sum(F.col("_c") * F.col("_c")).over(w).alias("ss"),
    )
    A = F.col("cents") * F.col("n") - F.col("s")
    B = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    z = A.cast("double") / F.sqrt(
        B.cast("double") * F.col("n").cast("double") / (F.col("n") - F.lit(1)).cast("double")
    )
    return (
        df.filter((F.col("n") >= min_periods) & (B > 0))
        .withColumn("z", F.round(z, 4))
        .select("event_id", key_col, "n", "z")
    )


def anomalies(
    events: DataFrame,
    z_threshold: float = 3.0,
    **kwargs,
) -> DataFrame:
    """Rows whose rolling z-score exceeds the threshold in magnitude."""
    scored = rolling_zscore(events, **kwargs)
    return scored.filter(F.abs(F.col("z")) > z_threshold)


def group_ols_trend(
    df: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key closed-form OLS trend: slope of value (cents) over time
    (seconds), reported as cents/day — the distributed trend-detection
    primitive (one pass, no iterative solver). Returns (key, n,
    trend_per_day); keys with <2 points or zero time-variance drop out.

    Exactness: x is seconds shifted by the per-key minimum (keeps the
    sufficient statistics inside BIGINT), y is integer cents; the five
    sums n, Σx, Σy, Σxy, Σx² are exact integers, and the closed form
    slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) evaluates with per-term double
    casts in a fixed order — bit-identical across engines (the cast of
    an exact integer rounds identically everywhere).

    Scale: ONE hash exchange on the key — the min-x window and the
    aggregate ride the same partitioning; everything else is scan-speed
    expressions."""
    epoch0 = F.unix_timestamp(F.lit("2001-01-01 00:00:00").cast("timestamp"))
    x = F.unix_timestamp(F.col(time_col).cast("timestamp")) - epoch0
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    w = Window.partitionBy(key_col)
    shifted = df.select(
        F.col(key_col), cents.alias("y"), x.alias("_x")
    ).withColumn("xs", F.col("_x") - F.min("_x").over(w))
    a = shifted.groupBy(key_col).agg(
        F.count("*").alias("n"),
        F.sum("xs").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("xs") * F.col("y")).alias("sxy"),
        F.sum(F.col("xs") * F.col("xs")).alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    num = n_d * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    den = n_d * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    return (
        a.filter(den > 0)
        .select(
            key_col,
            "n",
            F.round(num / den * F.lit(86400.0), 6).alias("trend_per_day"),
        )
    )


def count_min_estimates(
    df: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 3,
) -> DataFrame:
    """Count-min-sketch frequency estimates per distinct key:
    (key, est, exact, overcount).

    The sketch is `depth` rows of `width` counters; row j hashes a key to
    bucket conv(md5(j || ':' || key)[:15], 16, 10) % width and the
    estimate is the MIN over rows of the bucket totals. Deterministic
    integer arithmetic end-to-end, so the DuckDB oracle rebuilds the
    sketch bit-for-bit; est >= exact always (CMS never undercounts).

    Scale shape: ONE map-side-combinable groupBy(key) produces exact
    per-key counts (at 100 TB the sketch exists precisely so you do NOT
    need this — here it doubles as the oracle's `exact` column); cell
    totals are a second tiny aggregate over depth*width cells, broadcast
    back onto the key table. For a pure-sketch pipeline, drop the exact
    column: cells are built directly by groupBy(j, bucket) on the raw
    stream — identical estimates, no per-key state at all.
    """
    # checkpoint the per-key counts: the depth cell aggregates and the
    # final join all reuse this table — without the pin, every sketch row
    # re-derives it and the source is scanned depth+1 times
    keys = (
        df.groupBy(F.col(key_col).alias("key"))
        .agg(F.count("*").alias("exact"))
        .localCheckpoint(eager=False)
    )

    def bucket(j: int):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{j}:"), F.col("key"))), 1, 15), 16, 10
            ).cast("bigint")
            % width
        )

    hashed = keys.select(
        "key",
        "exact",
        *[bucket(j).alias(f"b{j}") for j in range(depth)],
    )
    # cell totals per sketch row: sum of counts of every key in the bucket
    est = None
    for j in range(depth):
        cells = hashed.groupBy(F.col(f"b{j}").alias("cell")).agg(
            F.sum("exact").alias(f"cell_total_{j}")
        )
        hashed = hashed.join(F.broadcast(cells), hashed[f"b{j}"] == cells["cell"]).drop(
            "cell"
        )
        e = F.col(f"cell_total_{j}")
        est = e if est is None else F.least(est, e)
    return hashed.select(
        F.col("key").alias(key_col),
        est.alias("est"),
        "exact",
        (est - F.col("exact")).alias("overcount"),
    )


def hll_merge_check(
    df: DataFrame,
    group_col: str,
    time_col: str,
    distinct_col: str,
    bound: float = 0.15,
) -> DataFrame:
    """Hierarchical sketch rollup: per-(group, day) HLL sketches
    (hll_sketch_agg) UNIONED up to per-group estimates (hll_union_agg),
    validated against the exact distinct count: (group, n_days,
    exact_distinct, merged_within_bound).

    This pins the property that makes sketches work on a cluster —
    MERGEABILITY: daily shards can be sketched independently (e.g. one
    partition per day at ingest) and combined later without re-reading
    the raw data; the merged estimate must still land within `bound` of
    exact. The sketch bytes are implementation-defined and excluded from
    the hashed output; the oracle asserts the invariant flag."""
    daily = df.groupBy(
        F.col(group_col), F.to_date(F.col(time_col)).alias("_day")
    ).agg(F.hll_sketch_agg(distinct_col).alias("sk"))
    rolled = daily.groupBy(group_col).agg(
        F.count("*").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx"),
    )
    exact = df.groupBy(group_col).agg(
        F.countDistinct(distinct_col).alias("exact_distinct")
    )
    joined = rolled.join(F.broadcast(exact), group_col)
    rel_err = F.abs(F.col("approx") - F.col("exact_distinct")).cast(
        "double"
    ) / F.col("exact_distinct")
    return joined.select(
        group_col,
        "n_days",
        "exact_distinct",
        (rel_err <= bound).alias("merged_within_bound"),
    )


def approx_distinct_check(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    rsd: float = 0.05,
    bound: float = 0.15,
) -> DataFrame:
    """Mergeable approximate distinct counts (HyperLogLog++ via
    approx_count_distinct) validated against the exact count:
    (group, exact_distinct, within_bound).

    `within_bound` is the value-checkable invariant — HLL++ at rsd=0.05
    must land within `bound` relative error (3x the target rsd); the
    oracle asserts TRUE per group, so a sketch regression flips the hash.
    The approximate value itself is implementation-defined and therefore
    not part of the hashed output.

    Scale: approx_count_distinct is a mergeable sketch — map-side partial
    aggregation ships one ~1.5 KB HLL register set per partition per
    group instead of the distinct values; the exact count here exists
    only to ground the invariant (it is the thing you could NOT afford at
    100 TB).
    """
    agg = df.groupBy(F.col(group_col)).agg(
        F.approx_count_distinct(distinct_col, rsd).alias("approx"),
        F.countDistinct(distinct_col).alias("exact_distinct"),
    )
    rel_err = F.abs(F.col("approx") - F.col("exact_distinct")).cast("double") / F.col(
        "exact_distinct"
    )
    return agg.select(
        group_col,
        "exact_distinct",
        (rel_err <= bound).alias("within_bound"),
    )


def hll_intersect_estimate(
    df: DataFrame,
    set_col: str,
    member_a,
    member_b,
    distinct_col: str,
    bound: float = 0.2,
) -> DataFrame:
    """Sketch ALGEBRA: estimate |A ∩ B| for two cohorts via
    inclusion-exclusion over mergeable HLL sketches,

        |A ∩ B| ≈ est(A) + est(B) - est(A ∪ B)

    where est(A ∪ B) merges the two sketches WITHOUT re-reading raw data
    — the set-operation layer on top of hll_merge_check's mergeability.
    Intersection error compounds (three estimates), so the validated
    bound is looser and checked against the exact intersection on
    absolute-relative terms vs |A ∪ B| (the stable denominator: the
    intersection itself can be near zero).

    Output: one row (exact_a, exact_b, exact_both, approx_both_ok).
    """
    a = df.where(F.col(set_col) == member_a)
    b = df.where(F.col(set_col) == member_b)
    ska = a.agg(F.hll_sketch_agg(distinct_col).alias("sk")).select(
        F.lit("a").alias("side"), "sk"
    )
    skb = b.agg(F.hll_sketch_agg(distinct_col).alias("sk")).select(
        F.lit("b").alias("side"), "sk"
    )
    union_est = (
        ska.unionByName(skb)
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("u"),
        )
    )
    each = ska.unionByName(skb).select(
        "side", F.hll_sketch_estimate("sk").alias("est")
    )
    ests = each.groupBy().pivot("side", ["a", "b"]).sum("est")
    exact = df.agg(
        F.countDistinct(F.when(F.col(set_col) == member_a, F.col(distinct_col))).alias("exact_a"),
        F.countDistinct(F.when(F.col(set_col) == member_b, F.col(distinct_col))).alias("exact_b"),
        F.countDistinct(
            F.when(F.col(set_col).isin(member_a, member_b), F.col(distinct_col))
        ).alias("exact_union"),
    ).select(
        "exact_a",
        "exact_b",
        "exact_union",
        (F.col("exact_a") + F.col("exact_b") - F.col("exact_union")).alias(
            "exact_both"
        ),
    )
    j = exact.join(F.broadcast(ests)).join(F.broadcast(union_est))
    approx_both = F.col("a") + F.col("b") - F.col("u")
    err = F.abs(approx_both - F.col("exact_both").cast("double")) / F.col(
        "exact_union"
    ).cast("double")
    return j.select(
        "exact_a",
        "exact_b",
        "exact_both",
        (err <= bound).alias("approx_both_ok"),
    )


def categorical_entropy(
    df: DataFrame,
    key_col: str,
    cat_col: str,
    categories: list[str],
    weight_col: str | None = None,
) -> DataFrame:
    """Per-key Shannon entropy (nats) of a categorical distribution with
    a KNOWN category set: H = ln(n) - (sum_c count_c * ln(count_c)) / n.

    Exactness: counts are integers from one aggregation; the entropy is
    ONE fixed-order expression — the per-category c*ln(c) terms fold
    left-to-right in the given ``categories`` order, so the float result
    is bit-identical on any engine with a correctly-rounded ln (the same
    term-order-fold discipline as datapipe/nb.py).

    With ``weight_col`` the counts become weight sums (entropy of a
    pre-aggregated count table — e.g. transition counts — without
    re-exploding to rows).

    The closed category set keeps the expression static; discovering it
    first (a tiny distinct aggregation) is the dynamic variant. One
    map-side-combinable shuffle on the key; the category dimension is
    pivoted into conditional counts, not a second shuffle.
    """
    w = F.lit(1) if weight_col is None else F.col(weight_col)
    aggs = [F.sum(w).alias("n")] + [
        F.sum(F.when(F.col(cat_col) == c, w).otherwise(0)).alias(f"_c{i}")
        for i, c in enumerate(categories)
    ]
    g = df.groupBy(key_col).agg(*aggs)
    term = lambda i: F.when(  # noqa: E731
        F.col(f"_c{i}") > 0,
        F.col(f"_c{i}").cast("double") * F.log(F.col(f"_c{i}").cast("double")),
    ).otherwise(F.lit(0.0))
    s = term(0)
    for i in range(1, len(categories)):
        s = s + term(i)
    h = F.log(F.col("n").cast("double")) - s / F.col("n").cast("double")
    return g.select(key_col, "n", F.round(h, 6).alias("entropy"))


# Shared Cramer-rule expression strings for the two-feature OLS closed form.
# Spark SQL and DuckDB parse the identical grammar, so registering the SAME
# string on both sides guarantees the float expression tree (and therefore
# every IEEE-754 rounding step) matches bit-for-bit.
def _ols2_det(c1: str, c2: str, c3: str) -> str:
    """3x3 determinant by cofactor expansion along the first column, where
    c1/c2/c3 name the three column triples '(a1,a2,a3)' etc. laid out
    column-major: det [[a1,b1,c1],[a2,b2,c2],[a3,b3,c3]]."""
    a1, a2, a3 = (f"CAST({c} AS DOUBLE)" for c in c1.split(","))
    b1, b2, b3 = (f"CAST({c} AS DOUBLE)" for c in c2.split(","))
    d1, d2, d3 = (f"CAST({c} AS DOUBLE)" for c in c3.split(","))
    return (
        f"({a1}*({b2}*{d3} - {b3}*{d2})"
        f" - {b1}*({a2}*{d3} - {a3}*{d2})"
        f" + {d1}*({a2}*{b3} - {a3}*{b2}))"
    )


OLS2_DET = _ols2_det("n,s1,s2", "s1,s11,s12", "s2,s12,s22")
OLS2_DET0 = _ols2_det("sy,s1y,s2y", "s1,s11,s12", "s2,s12,s22")
OLS2_DET1 = _ols2_det("n,s1,s2", "sy,s1y,s2y", "s2,s12,s22")
OLS2_DET2 = _ols2_det("n,s1,s2", "s1,s11,s12", "sy,s1y,s2y")


def group_ols2(
    df: DataFrame,
    key_col: str = "event_type",
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key TWO-feature least squares (multiple regression) in closed
    form: cents ~ b0 + b1*hour_of_day + b2*day_index, solved per key from
    the 3x3 normal equations by Cramer's rule — no iterative solver, no
    feature matrix materialization, ONE map-side-combinable aggregation.

    Exactness: x1 (hour) and x2 (calendar day index vs 2001-01-01) are
    exact integers, y is integer cents, so the nine sufficient statistics
    are exact BIGINTs; each determinant is a single fixed-order double
    expression SHARED TEXTUALLY with the oracle (OLS2_DET*), giving
    bit-identical coefficients.

    Scale: this is the canonical "closed-form ML at 100 TB" shape — the
    corpus never leaves the scan, the shuffle carries one 9-number row
    per key, and adding features grows the statistics quadratically but
    never adds passes. Keys with a singular design matrix drop out.
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    x1 = F.hour(F.col(time_col).cast("timestamp")).cast("bigint")
    x2 = F.datediff(F.col(time_col).cast("date"), F.lit("2001-01-01").cast("date")).cast(
        "bigint"
    )
    c = df.select(
        F.col(key_col), cents.alias("y"), x1.alias("x1"), x2.alias("x2")
    )
    a = c.groupBy(key_col).agg(
        F.count("*").alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    det = F.expr(OLS2_DET)
    return (
        a.filter(F.expr(f"abs({OLS2_DET}) > 1e-6"))
        .select(
            key_col,
            "n",
            F.round(F.expr(OLS2_DET0) / det, 6).alias("b0_cents"),
            F.round(F.expr(OLS2_DET1) / det, 6).alias("b1_cents_per_hour"),
            F.round(F.expr(OLS2_DET2) / det, 6).alias("b2_cents_per_day"),
        )
    )


# coefficient of variation from exact (n, s, ss) — shared with the oracle.
CADENCE_CV = (
    "sqrt((CAST(n AS DOUBLE)*CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*CAST(s AS DOUBLE))"
    " / (CAST(n AS DOUBLE)*CAST(n - 1 AS DOUBLE)))"
    " / (CAST(s AS DOUBLE)/CAST(n AS DOUBLE))"
)


def cadence_stats(
    df: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    min_gaps: int = 8,
) -> DataFrame:
    """Per-key inter-arrival cadence profile — the bot/automation signal
    of an event pipeline: gap count, exact median gap (seconds), and the
    coefficient of variation of gaps. Highly regular actors (cv -> 0)
    are schedulers; humans are bursty (cv >= 1).

    Exactness: gaps are integer seconds from a keyed lag; the median is
    Spark's exact `percentile` (linear interpolation — quantile_cont
    parity proven in events_mad_outliers), and cv comes from exact
    BIGINT (n, s, ss) through the shared CADENCE_CV expression string.

    Scale: one keyed exchange shared by the lag window and the
    aggregation; per-key state is the gap list only inside the exact
    percentile (swap for percentile_approx at extreme key skew).
    """
    epoch0 = F.unix_timestamp(F.lit("2001-01-01 00:00:00").cast("timestamp"))
    sec = F.unix_timestamp(F.col(time_col).cast("timestamp")) - epoch0
    w = Window.partitionBy(key_col).orderBy("sec", "event_id")
    gaps = (
        df.select(F.col(key_col), sec.alias("sec"), "event_id")
        .withColumn("gap", F.col("sec") - F.lag("sec").over(w))
        .filter(F.col("gap").isNotNull())
    )
    a = gaps.groupBy(key_col).agg(
        F.count("*").alias("n"),
        F.sum("gap").alias("s"),
        F.sum(F.col("gap") * F.col("gap")).alias("ss"),
        F.expr("percentile(gap, 0.5D)").alias("median_gap_s"),
    )
    return (
        a.filter((F.col("n") >= min_gaps) & (F.col("s") > 0))
        .select(
            key_col,
            "n",
            F.round("median_gap_s", 4).alias("median_gap_s"),
            F.round(F.expr(CADENCE_CV), 6).alias("cv"),
            (F.expr(CADENCE_CV) < 0.5).alias("is_regular"),
        )
    )


def misra_gries_summary(
    df: DataFrame,
    key_col: str,
    k: int = 6,
) -> DataFrame:
    """Per-partition Misra-Gries (SpaceSaving-family) frequent-items
    summaries: each partition keeps at most `k` counters in the merge
    formulation of Agarwal et al.'s *Mergeable Summaries* — batch counts
    fold into the counter set, and whenever more than `k` keys survive,
    the (k+1)-th largest count is subtracted from every counter and the
    non-positive ones dropped. Emits (key, c, 0) per surviving counter
    plus one (NULL, 0, err) row carrying the partition's total decrement.

    Guarantee carried to the merged estimate: with E = Σ partition errs,
    every key satisfies  est_lower <= true <= est_lower + E, and any key
    with true > N/(k+1) is GUARANTEED present (each trim of d removes at
    least d*(k+1) mass, so per-partition error is bounded by n_p/(k+1)).

    Scale: one linear pass, O(k) state per partition, and the summary —
    not the stream — crosses the wire: this is the sketch to use when
    the key space itself is too large to shuffle.
    """
    out_schema = f"{key_col} string, c long, err long"

    def summarize(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        dec = 0
        for pdf in batches:
            vc = pdf[key_col].value_counts()
            for key, cnt in vc.items():
                counters[key] = counters.get(key, 0) + int(cnt)
            if len(counters) > k:
                # subtract the (k+1)-th largest from everyone
                d = sorted(counters.values(), reverse=True)[k]
                dec += d
                counters = {key: c - d for key, c in counters.items() if c - d > 0}
        rows = [(key, c, 0) for key, c in counters.items()]
        rows.append((None, 0, dec))
        yield pd.DataFrame(rows, columns=[key_col, "c", "err"])

    return df.select(key_col).mapInPandas(summarize, out_schema)


def heavy_hitters_check(
    df: DataFrame,
    key_col: str,
    k: int = 6,
) -> DataFrame:
    """Value-checkable Misra-Gries heavy hitters: merge the per-partition
    summaries, then verify the sketch guarantees against the exact
    counts for every key that MUST be present (exact*(k+1) > N):

    * present   — the key survived in the merged sketch
    * bound_ok  — est_lower <= exact <= est_lower + E

    The oracle states the same deterministic key set with both flags
    TRUE; the sketch content itself is partitioning-dependent and never
    hashed directly (the events_cms_heavy / approx-distinct pattern).
    """
    mg = misra_gries_summary(df, key_col, k).localCheckpoint(eager=False)
    merged = mg.filter(F.col(key_col).isNotNull()).groupBy(key_col).agg(
        F.sum("c").alias("est_lower")
    )
    err = mg.agg(F.sum("err").alias("E"))
    exact = df.groupBy(key_col).agg(F.count("*").alias("exact"))
    total = exact.agg(F.sum("exact").alias("N"))
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("exact") * (k + 1) > F.col("N"))
        .join(merged, key_col, "left")
        .crossJoin(F.broadcast(err))
        .select(
            key_col,
            "exact",
            F.col("est_lower").isNotNull().alias("present"),
            (
                (F.col("est_lower") <= F.col("exact"))
                & (F.col("exact") <= F.col("est_lower") + F.col("E"))
            ).alias("bound_ok"),
        )
    )


def rolling_active_users(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Per-day engagement curve: exact DAU, exact rolling
    ``window_days``-day active users (WAU), and the DAU/WAU stickiness
    ratio. The canonical product-analytics rollup.

    Exact distinct-over-sliding-window without a window function: the
    deduplicated (day, key) activity table explodes each row to the
    `window_days` grid days it contributes to (bounded by the data's max
    day), and ONE countDistinct aggregation per grid day does the rest.
    Counts are exact integers; stickiness is one double division.

    Scale: the activity table is |active pairs|, the explode a
    window_days-factor fanout of THAT (not of raw events), and the
    aggregation map-side partial on (day) — the same budget a
    time-partitioned ingest pays daily. For month windows at extreme
    cardinality swap countDistinct for HLL (events_hll_rollup pattern).
    """
    day = F.date_trunc("DAY", F.col(ts_col).cast("timestamp"))
    active = df.select(day.alias("d"), F.col(key_col).alias("k")).distinct()
    cap = active.agg(F.max("d").alias("dmax"))
    grid = (
        active.crossJoin(F.broadcast(cap))
        .withColumn(
            "g",
            F.explode(
                F.sequence(
                    F.col("d"),
                    F.least(
                        F.col("d") + F.expr(f"INTERVAL {window_days - 1} DAYS"),
                        F.col("dmax"),
                    ),
                    F.expr("INTERVAL 1 DAY"),
                )
            ),
        )
    )
    wau = grid.groupBy("g").agg(F.countDistinct("k").alias("wau"))
    dau = active.groupBy(F.col("d").alias("g")).agg(F.countDistinct("k").alias("dau"))
    return (
        wau.join(dau, "g", "left")
        .select(
            F.col("g").cast("date").alias("day"),
            F.coalesce("dau", F.lit(0)).alias("dau"),
            "wau",
            F.round(
                F.coalesce("dau", F.lit(0)).cast("double") / F.col("wau").cast("double"), 6
            ).alias("stickiness"),
        )
    )


def pareto_curve(
    df: DataFrame,
    key_col: str,
    cents_col: str,
    buckets: int = 10,
) -> DataFrame:
    """Revenue-concentration (Pareto/ABC) curve: keys ranked by exact
    cents descending, banded into `buckets` rank-deciles, each with its
    member count, exact revenue, and the CUMULATIVE revenue share — the
    "top 10% of customers carry X% of revenue" report.

    Global ranking uses the two-phase row-number primitive (range
    repartition + driver offset prefix sum — sampling.with_global_row_
    numbers), never a single-task window; the cumulative share is a
    triangular self-join on the BUCKET table (buckets² = 100 rows), so
    no global-order window exists anywhere in the plan.

    Exactness: integer cents end-to-end; the share is one double
    division rounded at the end.
    """
    from imposm3_spark.datapipe.sampling import with_global_row_numbers

    numbered = with_global_row_numbers(
        df, [F.col(cents_col).desc(), F.col(key_col).asc()]
    )
    total = numbered.count()
    q, r = divmod(total, buckets)
    big = r * (q + 1)
    bucket = (
        F.when(F.col("rn") <= big, ((F.col("rn") - 1) / (q + 1)).cast("long") + 1)
        .otherwise(((F.col("rn") - 1 - big) / q).cast("long") + 1 + r)
        if q
        else F.col("rn")
    )
    agg = (
        numbered.select(F.col(cents_col).alias("cents"), bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("customers"), F.sum("cents").alias("cents"))
        .localCheckpoint(eager=False)
    )
    tot = agg.agg(F.sum("cents").alias("tot"))
    a, b = agg.alias("a"), agg.alias("b")
    cum = (
        a.join(b, F.col("b.bucket") <= F.col("a.bucket"))
        .groupBy(F.col("a.bucket").alias("bucket"))
        .agg(
            F.max(F.col("a.customers")).alias("customers"),
            F.max(F.col("a.cents")).alias("cents"),
            F.sum(F.col("b.cents")).alias("cum_cents"),
        )
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "customers",
        F.round(F.col("cents").cast("double") / 100.0, 2).alias("revenue"),
        F.round(F.col("cum_cents").cast("double") / F.col("tot").cast("double"), 6).alias(
            "cum_share"
        ),
    )


def join_size_profile(
    df: DataFrame,
    key_col: str,
    topn: int = 10,
) -> DataFrame:
    """Self-join cardinality profile WITHOUT running the join: for an
    equi-join on `key_col`, the output size is the frequency-vector dot
    product Σ_k c(k)², computed from one aggregation — the optimizer /
    skew-diagnosis primitive that answers "which keys dominate the join
    output" before anyone pays for the shuffle.

    Returns the `topn` keys by pair contribution with their share of the
    total join output — exact integers and one double division.

    Scale: one map-side-combinable count, a 1-row broadcast total, and a
    TakeOrdered — the join itself (quadratic in the hot keys) never
    runs. The same profile drives the salting fanout choice in
    datapipe/skew.py.
    """
    cnt = df.groupBy(key_col).agg(F.count("*").alias("cnt"))
    pairs = cnt.withColumn("pairs", F.col("cnt") * F.col("cnt"))
    total = pairs.agg(F.sum("pairs").alias("total"))
    return (
        pairs.crossJoin(F.broadcast(total))
        .select(
            key_col,
            "cnt",
            "pairs",
            F.round(F.col("pairs").cast("double") / F.col("total").cast("double"), 6).alias(
                "share"
            ),
        )
        .orderBy(F.desc("pairs"), F.asc(key_col))
        .limit(topn)
    )


# Welch t-statistic from exact per-group (n, s, ss) — shared textually
# with the oracle so the float expression tree matches bit-for-bit.
WELCH_T = (
    "(CAST(sa AS DOUBLE)/CAST(na AS DOUBLE) - CAST(sb AS DOUBLE)/CAST(nb AS DOUBLE))"
    " / sqrt("
    "((CAST(na AS DOUBLE)*CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE)*CAST(sa AS DOUBLE))"
    " / (CAST(na AS DOUBLE)*CAST(na - 1 AS DOUBLE))) / CAST(na AS DOUBLE)"
    " + "
    "((CAST(nb AS DOUBLE)*CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE)*CAST(sb AS DOUBLE))"
    " / (CAST(nb AS DOUBLE)*CAST(nb - 1 AS DOUBLE))) / CAST(nb AS DOUBLE)"
    ")"
)


def ab_test(
    df: DataFrame,
    group_col: str = "event_type",
    variant_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Two-sample A/B comparison per group: variant A/B assigned by the
    key's parity (stand-in for an experiment bucket column), Welch's
    t-statistic computed from exact integer sufficient statistics — the
    experimentation-readout primitive (report the statistic; p-value
    lookup is a driver-side table, not a data-scale problem).

    Exactness: cents are integers, so (n, s, ss) per (group, variant)
    are exact BIGINTs; the t-statistic is ONE shared expression string
    (WELCH_T) evaluated identically by Spark and the oracle.

    Scale: one map-side-combinable aggregation on (group, variant) —
    the corpus never shuffles; adding metrics adds columns, not passes.
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    variant = (F.col(variant_col) % 2 == 0)
    g = df.select(
        F.col(group_col).alias("grp"), variant.alias("is_a"), cents.alias("c")
    ).groupBy("grp").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("is_a"), F.col("c"))).alias("sa"),
        F.sum(F.when(F.col("is_a"), F.col("c") * F.col("c"))).alias("ssa"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("nb"),
        F.sum(F.when(~F.col("is_a"), F.col("c"))).alias("sb"),
        F.sum(F.when(~F.col("is_a"), F.col("c") * F.col("c"))).alias("ssb"),
    )
    t = F.expr(WELCH_T)
    return (
        g.filter((F.col("na") >= 2) & (F.col("nb") >= 2))
        .select(
            F.col("grp").alias(group_col),
            "na",
            "nb",
            F.round(F.col("sa").cast("double") / F.col("na").cast("double") / 100.0, 4).alias(
                "mean_a"
            ),
            F.round(F.col("sb").cast("double") / F.col("nb").cast("double") / 100.0, 4).alias(
                "mean_b"
            ),
            F.round(t, 6).alias("t_stat"),
            (F.abs(t) > 1.96).alias("significant_5pct"),
        )
    )


# CUPED shared expression strings (evaluated identically by Spark and
# DuckDB): theta from pooled exact sums, adjusted mean per variant.
CUPED_THETA = (
    "((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))"
    " / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)))"
)
CUPED_ADJ = (
    "(CAST(syv AS DOUBLE)/CAST(nv AS DOUBLE)"
    f" - {CUPED_THETA} * (CAST(sxv AS DOUBLE)/CAST(nv AS DOUBLE)"
    " - CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))) / 100.0"
)


def cuped(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    split_day: int = 15,
) -> DataFrame:
    """CUPED variance-reduced experiment readout: each key's PRE-period
    metric (cents on days <= `split_day`) is the control covariate for
    its POST-period metric; theta = cov(pre, post)/var(pre) is estimated
    on the pooled population and the per-variant post means are adjusted
    by -theta*(pre_v - pre_pooled) — the industry-standard variance
    reduction for A/B tests (Deng et al., WSDM'13).

    Exactness: per-key pre/post cents are exact BIGINTs; the pooled
    (n, Σx, Σy, Σxy, Σx²) and per-variant (nv, Σxv, Σyv) are one
    aggregation each; theta and the adjusted means are the shared
    CUPED_* expression strings.

    Scale: one keyed aggregation to the per-key table, one global and
    one per-variant rollup (both tiny), broadcast combine.
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    day = F.dayofmonth(F.col(ts_col).cast("timestamp"))
    per_key = (
        df.select(
            F.col(key_col).alias("k"),
            F.when(day <= split_day, cents).otherwise(F.lit(0)).alias("pre"),
            F.when(day > split_day, cents).otherwise(F.lit(0)).alias("post"),
        )
        .groupBy("k")
        .agg(F.sum("pre").alias("x"), F.sum("post").alias("y"))
        .localCheckpoint(eager=False)
    )
    g = per_key.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    v = per_key.groupBy((F.col("k") % 2 == 0).alias("is_a")).agg(
        F.count("*").alias("nv"), F.sum("x").alias("sxv"), F.sum("y").alias("syv")
    )
    out = v.crossJoin(F.broadcast(g))
    return out.select(
        F.when(F.col("is_a"), "A").otherwise("B").alias("variant"),
        F.col("nv").alias("n_keys"),
        F.round(F.col("syv").cast("double") / F.col("nv").cast("double") / 100.0, 4).alias(
            "mean_post"
        ),
        F.round(F.expr(CUPED_ADJ), 4).alias("mean_post_adj"),
        F.round(F.expr(CUPED_THETA), 6).alias("theta"),
    )


# Gini shared expression string: G = (2*Sum(i*v) - (n+1)*Sum(v)) / (n*Sum(v))
# over columns n (BIGINT), sv (BIGINT), s2iv (exact wide integer). Both
# engines evaluate the identical parse tree, and the wide-integer ->
# double casts are correctly rounded on both.
GINI = (
    "round((CAST(s2iv AS DOUBLE) - CAST(n + 1 AS DOUBLE) * CAST(sv AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(sv AS DOUBLE)), 6)"
)


def gini_coefficient(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Exact Gini concentration coefficient of an integer value per key:
    0 = perfectly equal, (n-1)/n = one key holds everything. The
    inequality readout for spend/revenue/token-budget concentration.

    Exactness: with values sorted ascending and 1-based ranks i,
    G = (2*Sum(i*v_i) - (n+1)*Sum(v)) / (n*Sum(v)). Every sum is an
    exact integer — Sum(2*i*v) accumulates in DECIMAL(38,0) (HUGEINT in
    the oracle) — and G is ONE shared expression (stats.GINI). Rank ties
    cannot perturb the result: swapping equal values across adjacent
    ranks leaves Sum(i*v) unchanged.

    Scale: one keyed aggregation to the per-key table, then the
    two-phase global-rank primitive (range exchange + local sort +
    driver prefix offsets — no single-task window), then one global
    rollup. The per-key table is keys-sized, not rows-sized.
    """
    from imposm3_spark.datapipe.sampling import with_global_row_numbers

    per_key = (
        df.select(F.col(key_col).alias("k"), F.col(value_col).alias("v"))
        .groupBy("k")
        .agg(F.sum("v").alias("v"))
    )
    ranked = with_global_row_numbers(per_key, ["v", "k"], rn_col="rn")
    g = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.sum(
            F.col("rn").cast("decimal(38,0)") * F.lit(2) * F.col("v")
        ).alias("s2iv"),
    )
    return g.select(
        F.col("n").alias("n_keys"),
        F.col("sv").alias("total"),
        F.expr(GINI).alias("gini"),
    )


def benford_probs() -> list[tuple[int, float]]:
    """Benford first-digit expected shares log10(1 + 1/d), d = 1..9, as
    python doubles — embedded as literals on BOTH engine sides so the
    floats are bit-identical."""
    import math

    return [(d, math.log10(1.0 + 1.0 / d)) for d in range(1, 10)]


# chi-square contribution per digit from exact counts + the literal p:
# (obs - total*p)^2 / (total*p), over columns obs, total (BIGINT), p.
BENFORD_CHI = (
    "round((CAST(obs AS DOUBLE) - CAST(total AS DOUBLE) * p)"
    " * (CAST(obs AS DOUBLE) - CAST(total AS DOUBLE) * p)"
    " / (CAST(total AS DOUBLE) * p), 6)"
)


def benford_digits(
    df: DataFrame,
    value_col: str = "value",
) -> DataFrame:
    """Benford's-law first-digit audit — the classic anomaly/fraud screen
    for naturally-occurring amounts: observed first-significant-digit
    counts of the positive cent amounts vs the Benford expectation
    log10(1+1/d), with the per-digit chi-square contribution.

    Exactness: the first digit comes from the decimal STRING rendering
    of the exact BIGINT cents (no float log10 edge cases at powers of
    ten); counts are exact; expected shares are shared python-double
    literals; the chi term is the shared BENFORD_CHI expression.

    Scale: one map-side-combinable 9-group aggregation + a broadcast of
    the 9-row expectation table. Nothing else moves.
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    obs = (
        df.select(cents.alias("c"))
        .where(F.col("c") > 0)
        .select(F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    spark = df.sparkSession
    probs = spark.createDataFrame(benford_probs(), "digit int, p double")
    tot = obs.agg(F.sum("obs").alias("total"))
    return (
        probs.join(obs, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("obs", F.lit(0)).alias("obs"),
            "total",
            "p",
        )
        .select(
            "digit",
            "obs",
            F.round(F.col("obs").cast("double") / F.col("total").cast("double"), 6).alias(
                "share"
            ),
            F.round("p", 6).alias("expected"),
            F.expr(BENFORD_CHI).alias("chi_term"),
        )
    )


def benford_oracle(value_sql: str, table: str, where: str = "TRUE") -> str:
    """DuckDB oracle for benford_digits: identical literals + the shared
    chi expression."""
    ds = ", ".join(str(d) for d, _ in benford_probs())
    ps = ", ".join(repr(p) for _, p in benford_probs())
    return f"""
    WITH src AS (
      SELECT CAST(round(({value_sql}) * 100) AS BIGINT) AS c
      FROM {table} WHERE {where}
    ), o AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit,
             count(*) AS obs
      FROM src WHERE c > 0 GROUP BY 1
    ), probs AS (
      -- CAST: duckdb parses bare decimal literals as DECIMAL, not DOUBLE
      SELECT unnest([{ds}]) AS digit,
             unnest(list_transform([{ps}], v -> CAST(v AS DOUBLE))) AS p
    ), t AS (SELECT CAST(sum(obs) AS BIGINT) AS total FROM o)
    SELECT probs.digit,
           CAST(coalesce(o.obs, 0) AS BIGINT) AS obs,
           round(CAST(coalesce(o.obs, 0) AS DOUBLE) / CAST(total AS DOUBLE), 6)
             AS share,
           round(p, 6) AS expected,
           {BENFORD_CHI.replace("obs", "coalesce(o.obs, 0)")} AS chi_term
    FROM probs LEFT JOIN o USING (digit), t
    """


# Spearman rho from exact tie-averaged rank sufficient statistics:
# a = 2*avg_rank_x, b = 2*avg_rank_y (both exact integers), so
# rho = (n*Sab - Sa*Sb) / sqrt((n*Saa - Sa^2) * (n*Sbb - Sb^2)) — the
# factor 2 cancels. Wide-integer sums cast to double once, identically.
SPEARMAN_RHO = (
    "round((CAST(n AS DOUBLE)*CAST(sab AS DOUBLE)"
    " - CAST(sa AS DOUBLE)*CAST(sb AS DOUBLE))"
    " / sqrt((CAST(n AS DOUBLE)*CAST(saa AS DOUBLE)"
    " - CAST(sa AS DOUBLE)*CAST(sa AS DOUBLE))"
    " * (CAST(n AS DOUBLE)*CAST(sbb AS DOUBLE)"
    " - CAST(sb AS DOUBLE)*CAST(sb AS DOUBLE))), 6)"
)


def _double_avg_ranks(
    base: DataFrame, group: str, col: str, out: str
) -> DataFrame:
    """Per (group, value): 2*tie-averaged-rank as an exact BIGINT —
    2*avg_rank = 2*(number of strictly smaller rows) + c + 1 where c is
    the value's multiplicity. The window rides the (group, DISTINCT
    value) table, which is value-cardinality-sized, not row-sized."""
    from pyspark.sql import Window as W

    vg = base.groupBy(group, col).agg(F.count(F.lit(1)).alias("_c"))
    w = (
        W.partitionBy(group)
        .orderBy(col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return vg.select(
        group,
        col,
        (
            F.lit(2) * F.coalesce(F.sum("_c").over(w), F.lit(0))
            + F.col("_c")
            + F.lit(1)
        ).alias(out),
    )


def spearman_by_group(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    min_n: int = 3,
) -> DataFrame:
    """Exact Spearman rank correlation of two columns within each group —
    the monotone-association readout Pearson misses (outlier-robust,
    captures any monotone relation). Ties take the standard average
    rank.

    Exactness: doubled tie-averaged ranks are exact integers; the five
    sufficient sums accumulate in DECIMAL(38,0)/HUGEINT; rho is the ONE
    shared expression SPEARMAN_RHO. Groups with zero rank variance on
    either side (all-equal values) are excluded by an exact integer
    predicate, never a float compare.

    Scale: two (group, distinct-value) aggregations + keyed cumulative
    windows on those value tables, two row-table equi-joins back, one
    final per-group rollup. No global sort, no single-task window.
    """
    base = df.select(
        F.col(group_col).alias("g"), F.col(x_col).alias("x"), F.col(y_col).alias("y")
    )
    ra = _double_avg_ranks(base, "g", "x", "a")
    rb = _double_avg_ranks(base, "g", "y", "b")
    joined = base.join(ra, ["g", "x"]).join(rb, ["g", "y"])
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = joined.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(dec(F.col("a")) * F.col("b")).alias("sab"),
        F.sum(dec(F.col("a")) * F.col("a")).alias("saa"),
        F.sum(dec(F.col("b")) * F.col("b")).alias("sbb"),
    )
    var_x = F.col("n").cast("decimal(38,0)") * F.col("saa") - dec(F.col("sa")) * F.col("sa")
    var_y = F.col("n").cast("decimal(38,0)") * F.col("sbb") - dec(F.col("sb")) * F.col("sb")
    return (
        g.where((F.col("n") >= min_n) & (var_x > 0) & (var_y > 0))
        .select(
            F.col("g").alias(group_col),
            "n",
            F.expr(SPEARMAN_RHO).alias("spearman_rho"),
        )
    )


def mi_term_expr(n_cats: int) -> str:
    """Shared mutual-information contribution expression over pivoted
    columns c0..c{n-1} (per-group category counts), h0..h{n-1} (global
    category totals), n (group total) and nn (grand total):
    sum_i c_i * ln(c_i*nn / (n*h_i)) / nn, terms added left-to-right in
    category order — one string, identical parse tree on both engines."""
    terms = [
        (
            f"(CASE WHEN c{i} > 0 THEN CAST(c{i} AS DOUBLE)"
            f" * ln(CAST(c{i} AS DOUBLE) * CAST(nn AS DOUBLE)"
            f" / (CAST(n AS DOUBLE) * CAST(h{i} AS DOUBLE)))"
            " ELSE 0.0 END)"
        )
        for i in range(n_cats)
    ]
    return "round((" + " + ".join(terms) + ") / CAST(nn AS DOUBLE), 6)"


def mutual_information_by_group(
    df: DataFrame,
    group_col: str,
    cat_col: str,
    categories: list,
) -> DataFrame:
    """Per-group mutual-information contribution between the group column
    and a categorical column with a KNOWN category set: the rows sum to
    I(group; cat) in nats — the feature-association strength readout
    (which groups have a distinctive category profile and how much they
    carry of the total dependence).

    Exactness: counts pivot into static per-category columns (the
    categorical_entropy discipline); the contribution is the ONE shared
    generated expression (mi_term_expr), a fixed-order fold over the
    closed category set. Zero cells short-circuit before any division.

    Scale: one map-side-combinable aggregation on the group key plus one
    global rollup broadcast back — the category dimension is columns,
    not a shuffle.
    """
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.when(F.col(cat_col) == c, 1).otherwise(0)).alias(f"c{i}")
        for i, c in enumerate(categories)
    ]
    g = df.groupBy(group_col).agg(*aggs)
    tot = g.agg(
        F.sum("n").alias("nn"),
        *[F.sum(f"c{i}").alias(f"h{i}") for i in range(len(categories))],
    )
    return g.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n",
        F.expr(mi_term_expr(len(categories))).alias("mi_term"),
    )


# Dispersion index (variance-to-mean ratio) from exact integer sums over
# per-bucket counts: sample variance ((n*scc - sc^2)/(n*(n-1))) divided
# by the mean (sc/n). 1 = Poisson; >1 overdispersed (bursty); <1
# underdispersed (regular). One shared string.
DISPERSION = (
    "round(((CAST(n AS DOUBLE)*CAST(scc AS DOUBLE)"
    " - CAST(sc AS DOUBLE)*CAST(sc AS DOUBLE))"
    " / (CAST(n AS DOUBLE)*CAST(n - 1 AS DOUBLE)))"
    " / (CAST(sc AS DOUBLE)/CAST(n AS DOUBLE)), 6)"
)


def dispersion_index(
    df: DataFrame,
    group_col: str,
    bucket_col,
    min_buckets: int = 2,
) -> DataFrame:
    """Per-group Poisson overdispersion test over bucket counts (e.g.
    events per day): the variance-to-mean ratio of the per-bucket
    arrival counts — the burstiness/regularity screen for rate data.
    Buckets are the OBSERVED bucket values (zero-count buckets are not
    imputed; document the bucket universe if you need them).

    Exactness: per-bucket counts are integers; (n, Σc, Σc²) are exact
    BIGINTs; the index is the shared DISPERSION expression. Groups with
    fewer than `min_buckets` buckets or zero total drop out by integer
    predicates.

    Scale: two map-side-combinable aggregations (bucket counts, then
    group sums) — the rows never shuffle twice.
    """
    per_bucket = (
        df.select(F.col(group_col).alias("g"), bucket_col.alias("b"))
        .groupBy("g", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    g = per_bucket.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
    )
    return (
        g.where((F.col("n") >= min_buckets) & (F.col("sc") > 0))
        .select(
            F.col("g").alias(group_col),
            F.col("n").alias("n_buckets"),
            F.col("sc").alias("n_events"),
            F.expr(DISPERSION).alias("dispersion"),
        )
    )


# Burstiness B = (sigma - mu)/(sigma + mu) of inter-arrival gaps from
# exact integer sums, population sigma: with A = n*ss - s*s (exact),
# sigma = sqrt(A)/n and mu = s/n, so B = (sqrt(A) - s) / (sqrt(A) + s)
# after multiplying through by n. -1 = perfectly regular, 0 = Poisson,
# -> 1 = bursty (Goh & Barabasi, EPL'08).
BURSTINESS = (
    "round((sqrt(CAST(n AS DOUBLE)*CAST(ss AS DOUBLE)"
    " - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)) - CAST(s AS DOUBLE))"
    " / (sqrt(CAST(n AS DOUBLE)*CAST(ss AS DOUBLE)"
    " - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)) + CAST(s AS DOUBLE)), 6)"
)


def burstiness_by_key(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    min_gaps: int = 2,
) -> DataFrame:
    """Per-key burstiness of inter-arrival times: B = (σ−μ)/(σ+μ) over
    the key's consecutive gaps in seconds — the bot/scheduler-vs-human
    signature (B near -1 = clockwork, near 0 = Poisson, positive =
    bursty). Keys need >= min_gaps gaps and a positive gap sum.

    Exactness: gaps are exact integer seconds from a keyed lag window;
    (n, Σg, Σg²) are exact BIGINTs; B is the shared BURSTINESS
    expression (the n factors cancel, so only one sqrt of an exact
    integer enters).

    Scale: one keyed window (the same exchange the aggregation reuses),
    no global sort.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("k").orderBy("_t", "_i")
    gaps = (
        df.select(
            F.col(key_col).alias("k"),
            F.unix_timestamp(F.col(ts_col).cast("timestamp")).alias("_t"),
            F.col(id_col).alias("_i"),
        )
        .withColumn("_g", F.col("_t") - F.lag("_t").over(w))
        .where(F.col("_g").isNotNull())
    )
    g = gaps.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_g").alias("s"),
        F.sum(F.col("_g") * F.col("_g")).alias("ss"),
    )
    return (
        g.where((F.col("n") >= min_gaps) & (F.col("s") > 0))
        .select(
            F.col("k").alias(key_col),
            F.col("n").alias("n_gaps"),
            F.expr(BURSTINESS).alias("burstiness"),
        )
    )


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the value
    distributions of two groups: D = max over x of |F_a(x) - F_b(x)| —
    the standard distribution-shift test (feature drift, A/B sanity,
    train/serve skew).

    Exactness: with per-value counts c_a, c_b and their cumulative sums
    over the merged value order, D = max |cum_a*n_b - cum_b*n_a| /
    (n_a*n_b): the numerator is an exact BIGINT for every distinct
    value, so the argmax (tie -> lowest value) never touches a float;
    ONE final division produces the statistic. Returns (n_a, n_b,
    d_stat, at_value — the location of the maximum gap).

    Scale: one aggregation to the (value, c_a, c_b) table (distinct-
    value-sized), then the two-phase global-cumsum primitive over it
    (range exchange + driver prefix offsets — NO single-task window),
    one max_by. The cumsum rides the value table, not the row table;
    for continuous data at extreme cardinality, pre-bin values first
    (the usual KS-on-histogram practice).
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    per_val = (
        df.where(F.col(group_col).isin([group_a, group_b]))
        .select(
            cents.alias("v"),
            F.when(F.col(group_col) == group_a, 1).otherwise(0).alias("ia"),
            F.when(F.col(group_col) == group_b, 1).otherwise(0).alias("ib"),
        )
        .groupBy("v")
        .agg(F.sum("ia").alias("ca"), F.sum("ib").alias("cb"))
    )
    from imposm3_spark.datapipe.sampling import with_global_cumsums

    cum = with_global_cumsums(per_val, ["v"], ["ca", "cb"]).select(
        "v",
        F.col("cum_ca").alias("cuma"),
        F.col("cum_cb").alias("cumb"),
    )
    tot = per_val.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    gaps = cum.crossJoin(F.broadcast(tot)).select(
        "v",
        "na",
        "nb",
        F.abs(
            F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na")
        ).alias("num"),
    )
    pick = F.max_by(
        F.struct(F.col("v").alias("at"), F.col("num").alias("num")),
        F.struct(F.col("num"), (-F.col("v")).alias("_neg")),
    )
    out = gaps.groupBy("na", "nb").agg(pick.alias("_p"))
    return out.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(
            F.col("_p.num").cast("double")
            / (F.col("na").cast("double") * F.col("nb").cast("double")),
            6,
        ).alias("d_stat"),
        F.round(F.col("_p.at").cast("double") / 100.0, 2).alias("at_value"),
    )


# Wilson 95% score interval for a binomial proportion from exact counts
# (k successes / n trials), z = 1.96 embedded as a literal: the
# experimentation-grade CI that stays inside [0,1] at small n (unlike
# the normal approximation). Shared strings over columns k, n.
_WILSON_Z = "1.96"
_WILSON_CENTER = (
    f"((CAST(k AS DOUBLE) + {_WILSON_Z}*{_WILSON_Z}/2.0)"
    f" / (CAST(n AS DOUBLE) + {_WILSON_Z}*{_WILSON_Z}))"
)
_WILSON_HALF = (
    f"(({_WILSON_Z} * sqrt(CAST(k AS DOUBLE)*(CAST(n AS DOUBLE)-CAST(k AS DOUBLE))"
    f"/CAST(n AS DOUBLE) + {_WILSON_Z}*{_WILSON_Z}/4.0))"
    f" / (CAST(n AS DOUBLE) + {_WILSON_Z}*{_WILSON_Z}))"
)
WILSON_LO = f"round({_WILSON_CENTER} - {_WILSON_HALF}, 6)"
WILSON_HI = f"round({_WILSON_CENTER} + {_WILSON_HALF}, 6)"


def conversion_wilson(
    df: DataFrame,
    key_col: str,
    user_col: str,
    event_col: str,
    from_event: str,
    to_event: str,
) -> DataFrame:
    """Per-key conversion rate with a Wilson 95% score interval: users
    who did `from_event` (trials) and the subset who also did `to_event`
    (successes), CI from the shared WILSON_* expressions — the readout a
    conversion dashboard needs to stop over-reading small cells.

    Exactness: k and n are exact distinct-user counts; the CI is one
    shared expression over them.

    Scale: one aggregation to the (key, user) activity pair table, one
    rollup per key — both map-side combinable.
    """
    per_user = (
        df.where(F.col(event_col).isin([from_event, to_event]))
        .groupBy(F.col(key_col).alias("k"), F.col(user_col).alias("u"))
        .agg(
            F.max(F.when(F.col(event_col) == from_event, 1).otherwise(0)).alias("f"),
            F.max(F.when(F.col(event_col) == to_event, 1).otherwise(0)).alias("t"),
        )
        .where(F.col("f") == 1)
    )
    g = per_user.groupBy(F.col("k").alias("_key")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("t").alias("k")
    )
    return g.where(F.col("n") > 0).select(
        F.col("_key").alias(key_col),
        F.col("n").alias("n_trials"),
        F.col("k").alias("n_conv"),
        F.round(F.col("k").cast("double") / F.col("n").cast("double"), 6).alias("rate"),
        F.expr(WILSON_LO).alias("ci_lo"),
        F.expr(WILSON_HI).alias("ci_hi"),
    )


# Kendall tau-b final expression over exact integer aggregates:
# tau = (C - D) / sqrt((n0 - n1) * (n0 - n2)). One shared string.
KENDALL_TAU_B = (
    "round((CAST(c AS DOUBLE) - CAST(d AS DOUBLE))"
    " / sqrt((CAST(n0 AS DOUBLE) - CAST(n1 AS DOUBLE))"
    " * (CAST(n0 AS DOUBLE) - CAST(n2 AS DOUBLE))), 6)"
)


_KENDALL_EXPRS: "_weakref.WeakKeyDictionary" = None  # lazy-initialized below


def _kendall_exprs_for(spark, n_y: int) -> dict:
    """Per-(session, n_y) memo of kendall_tau_b's Column trees — keyed on
    the live SparkSession (WeakKeyDictionary, the registry table-handle
    pattern) so a restarted session can never see stale py4j references."""
    global _KENDALL_EXPRS
    if _KENDALL_EXPRS is None:
        _KENDALL_EXPRS = _weakref.WeakKeyDictionary()
    per = _KENDALL_EXPRS.setdefault(spark, {})
    if n_y not in per:
        per[n_y] = _build_kendall_exprs(n_y)
    return per[n_y]


def _build_kendall_exprs(n_y: int) -> dict:
    """DataFrame-independent Column trees for kendall_tau_b, built once
    per (session, n_y) and reused across calls (Columns are unresolved
    expressions — freely reusable across DataFrames, the same memo class
    as the import pipeline's match-expression cache). Construction is
    O(n_y^2) py4j round trips (~2.8 s of the query's 3.6 s driver build
    at n_y=24, round-10 cProfile), pure waste to repeat per invocation."""
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    aggs = [F.count(F.lit(1)).alias("t")] + [
        F.sum(F.when(F.col("y") == j, 1).otherwise(0)).alias(f"c{j}")
        for j in range(n_y)
    ]
    s = [(F.col(f"cum_c{j}") - F.col(f"c{j}")).alias(f"s{j}") for j in range(n_y)]
    H: list = [None] * n_y
    H[n_y - 1] = F.lit(0).cast("long")
    for j in range(n_y - 2, -1, -1):
        H[j] = H[j + 1] + F.col(f"s{j + 1}")
    T = None
    for j in range(n_y):
        T = F.col(f"s{j}") if T is None else T + F.col(f"s{j}")
    conc = None
    disc = None
    for j in range(n_y):
        cterm = dec(F.col(f"c{j}")) * H[j]
        dterm = dec(F.col(f"c{j}")) * (T - F.col(f"s{j}") - H[j])
        conc = cterm if conc is None else conc + cterm
        disc = dterm if disc is None else disc + dterm
    u = [F.sum(f"c{j}").alias(f"u{j}") for j in range(n_y)]
    n2 = None
    for j in range(n_y):
        term = F.expr(f"(u{j} * (u{j} - 1)) div 2").cast("decimal(38,0)")
        n2 = term if n2 is None else n2 + term
    return {"aggs": aggs, "s": s, "conc": conc, "disc": disc, "u": u, "n2": n2}


def kendall_tau_b(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_y: int,
) -> DataFrame:
    """Exact Kendall tau-b rank correlation between a high-cardinality
    integer column x and a SMALL-category integer column y (0..n_y-1) —
    the concordance statistic (robust monotone association with a
    proper tie correction), exact at any scale.

    Method: pivot to the (distinct-x, per-y-count) table; strict suffix
    sums S_j(x) = #{x' > x, y' = j} come from the two-phase global
    cumsum over x DESC (no single-task window); then per row
    C-contribution = sum_j c_j * H_j (H_j = sum_{j'>j} S_j') and
    D-contribution = sum_j c_j * (T - S_j - H_j) with T = sum_j S_j —
    ALL integer arithmetic (order-free, no float discipline needed),
    accumulated in DECIMAL(38,0). Tie terms n1 = sum_x t(t-1)/2,
    n2 = sum_j u(u-1)/2, n0 = n(n-1)/2. tau-b is the one shared final
    expression (KENDALL_TAU_B).

    Returns ONE row: (n, concordant, discordant, tau_b) — the pair
    counts as doubles (exact below 2^53; the tau itself only ever uses
    the double casts both engines share).

    Scale: one keyed aggregation to the distinct-x table, one range
    exchange for the suffix sums, one global rollup. The y dimension is
    columns, never a shuffle.
    """
    from imposm3_spark.datapipe.sampling import with_global_cumsums

    ex = _kendall_exprs_for(df.sparkSession, n_y)
    xr = (
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .groupBy("x")
        .agg(*ex["aggs"])
        .withColumn("negx", -F.col("x"))
    )
    cum = with_global_cumsums(xr, ["negx"], [f"c{j}" for j in range(n_y)])
    # strict suffix: points with x' > x (inclusive cumsum minus own row)
    base = cum.select("t", *[f"c{j}" for j in range(n_y)], *ex["s"])

    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = base.agg(
        F.sum("t").alias("n"),
        F.sum(F.expr("(t * (t - 1)) div 2")).alias("n1"),
        F.sum(ex["conc"]).alias("c"),
        F.sum(ex["disc"]).alias("d"),
        *ex["u"],
    )
    n2 = ex["n2"]
    full = agg.select(
        "n",
        "c",
        "d",
        (
            dec(F.col("n")) * (F.col("n") - 1) / F.lit(2)
        ).cast("decimal(38,0)").alias("n0"),
        F.col("n1").cast("decimal(38,0)").alias("n1"),
        n2.alias("n2"),
    )
    # zero rank variance on either side (all-tied x or y) has no defined
    # tau: exclude by EXACT integer predicates before the float division
    return (
        full.where((F.col("n0") > F.col("n1")) & (F.col("n0") > F.col("n2")))
        .select(
            "n",
            F.col("c").cast("double").alias("concordant"),
            F.col("d").cast("double").alias("discordant"),
            F.expr(KENDALL_TAU_B).alias("tau_b"),
        )
    )


# Difference-in-differences from four exact cell sums: the treatment
# effect estimate (post - pre)_treated - (post - pre)_control, each mean
# a cents/100 double from exact integers. One shared string over columns
# (st_pre, nt_pre, st_post, nt_post, sc_pre, nc_pre, sc_post, nc_post).
# Deliberately UNROUNDED: every op (int->double cast of exact <2^53
# sums, division, subtraction) is IEEE-deterministic and engine-free;
# a round(double, 4) here could hit a .5-at-digit tie where Spark
# (BigDecimal HALF_UP) and DuckDB disagree.
DID_EFFECT = (
    "((CAST(st_post AS DOUBLE)/CAST(nt_post AS DOUBLE)"
    " - CAST(st_pre AS DOUBLE)/CAST(nt_pre AS DOUBLE))"
    " - (CAST(sc_post AS DOUBLE)/CAST(nc_post AS DOUBLE)"
    " - CAST(sc_pre AS DOUBLE)/CAST(nc_pre AS DOUBLE))) / CAST(100.0 AS DOUBLE)"
)


def diff_in_diff(
    df: DataFrame,
    unit_col: str,
    ts_col: str,
    value_col: str,
    cutover: str,
    group_col: str | None = None,
) -> DataFrame:
    """Difference-in-differences effect estimate: treated units (odd
    unit key — the stand-in for an assignment column) vs control, before
    vs after the `cutover` date; the causal-inference workhorse for
    staggered rollouts where a plain pre/post comparison absorbs the
    trend.

    Exactness: the four cell (sum, n) pairs are exact integers from ONE
    aggregation; the effect and the four cell means are shared
    expression strings. Optionally grouped by `group_col` for per-segment
    effects.

    Scale: one map-side-combinable aggregation; the cells are columns.
    """
    cut = F.to_date(F.lit(cutover))
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    treated = F.col(unit_col) % 2 == 1
    post = F.col(ts_col).cast("date") > cut
    keys = [F.col(group_col).alias("g")] if group_col else []

    def cell(p, t, agg):
        cond = (post == F.lit(p)) & (treated == F.lit(t))
        if agg == "s":
            return F.sum(F.when(cond, cents).otherwise(0))
        return F.sum(F.when(cond, 1).otherwise(0))

    g = df.groupBy(*keys).agg(
        cell(False, True, "s").alias("st_pre"),
        cell(False, True, "n").alias("nt_pre"),
        cell(True, True, "s").alias("st_post"),
        cell(True, True, "n").alias("nt_post"),
        cell(False, False, "s").alias("sc_pre"),
        cell(False, False, "n").alias("nc_pre"),
        cell(True, False, "s").alias("sc_post"),
        cell(True, False, "n").alias("nc_post"),
    )
    nonzero = (
        (F.col("nt_pre") > 0)
        & (F.col("nt_post") > 0)
        & (F.col("nc_pre") > 0)
        & (F.col("nc_post") > 0)
    )
    out_cols = ([F.col("g")] if group_col else []) + [
        F.col("nt_pre"),
        F.col("nt_post"),
        F.col("nc_pre"),
        F.col("nc_post"),
        F.expr(DID_EFFECT).alias("did_effect"),
    ]
    res = g.where(nonzero).select(*out_cols)
    return res.withColumnRenamed("g", group_col) if group_col else res


def eta_squared_expr(n_cats: int) -> str:
    """Shared ANOVA eta-squared expression over pivoted columns t0..t{n-1}
    (per-category value sums), m0..m{n-1} (per-category counts), s (group
    value sum), ss (group sum of squares, wide-int), n (group count):
    eta2 = (sum_j t_j^2/m_j - s^2/n) / (ss - s^2/n), terms in fixed
    category order — identical parse tree on both engines."""
    between = " + ".join(
        f"(CASE WHEN m{j} > 0 THEN CAST(t{j} AS DOUBLE)*CAST(t{j} AS DOUBLE)"
        f"/CAST(m{j} AS DOUBLE) ELSE 0.0 END)"
        for j in range(n_cats)
    )
    return (
        f"round((({between})"
        " - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/CAST(n AS DOUBLE))"
        " / (CAST(ss AS DOUBLE)"
        " - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/CAST(n AS DOUBLE)), 6)"
    )


def eta_squared_by_group(
    df: DataFrame,
    group_col: str,
    cat_col: str,
    value_col,
    categories: list,
) -> DataFrame:
    """Per-group ANOVA effect size (eta-squared) of a categorical factor
    on an integer value: the share of the value's variance the category
    explains — the seasonality-strength / factor-importance readout
    (eta2 near 0: the factor is noise; near 1: the factor determines the
    value).

    Exactness: per-(group, category) sums and counts are exact BIGINTs,
    the sum of squares is DECIMAL(38,0)/HUGEINT, and eta2 is the ONE
    generated shared expression (eta_squared_expr) — fixed-order terms,
    zero-variance groups excluded by an exact integer predicate.

    Scale: one map-side-combinable aggregation; the category dimension
    is columns.
    """
    dec = "decimal(38,0)"
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("s"),
        F.sum(value_col.cast(dec) * value_col).alias("ss"),
    ]
    for j, c in enumerate(categories):
        cond = F.col(cat_col) == c
        aggs.append(F.sum(F.when(cond, value_col).otherwise(0)).alias(f"t{j}"))
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"m{j}"))
    g = df.groupBy(group_col).agg(*aggs)
    var_pos = (
        F.col("n").cast(dec) * F.col("ss")
        - F.col("s").cast(dec) * F.col("s")
    ) > 0
    return g.where((F.col("n") >= 2) & var_pos).select(
        group_col,
        "n",
        F.expr(eta_squared_expr(len(categories))).alias("eta_sq"),
    )


# Wald-Wolfowitz runs-test z from exact integers: with r runs, n1 above-
# median rows and n2 below, mu = 2*n1*n2/(n1+n2) + 1 and
# var = 2*n1*n2*(2*n1*n2 - n1 - n2) / ((n1+n2)^2 * (n1+n2-1)).
RUNS_Z = (
    "round((CAST(r AS DOUBLE)"
    " - (2.0*CAST(n1 AS DOUBLE)*CAST(n2 AS DOUBLE)/CAST(n1 + n2 AS DOUBLE) + 1.0))"
    " / sqrt(2.0*CAST(n1 AS DOUBLE)*CAST(n2 AS DOUBLE)"
    "*(2.0*CAST(n1 AS DOUBLE)*CAST(n2 AS DOUBLE) - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))"
    " / (CAST(n1 + n2 AS DOUBLE)*CAST(n1 + n2 AS DOUBLE)*CAST(n1 + n2 - 1 AS DOUBLE))), 6)"
)


def runs_test_by_group(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Wald-Wolfowitz runs test per group: are the above/below-median
    excursions of the value sequence random, or do they clump (trend/
    regime) or alternate (negative feedback/oscillation)? z < 0 = fewer
    runs than chance (clumping), z > 0 = more (alternation).

    Exactness: the dichotomizing median is the exact lower median from
    the (group, distinct-cents) cumulative table (ties with the median
    drop, the standard treatment); the run count is an exact keyed-lag
    sum; z is the ONE shared expression (RUNS_Z) over exact integers.
    Degenerate groups (one-sided, or variance zero) excluded by integer
    predicates.

    Scale: one keyed window on the distinct-value table (median), one
    row-table join, one keyed-lag window, one rollup — all partitioned
    by the group key.
    """
    from pyspark.sql import Window as W

    cents = F.round(F.col(value_col) * 100).cast("bigint")
    base = df.select(
        F.col(group_col).alias("g"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        cents.alias("v"),
    )
    vc = base.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))
    wc = W.partitionBy("g").orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    wt = W.partitionBy("g")
    med = (
        vc.select(
            "g",
            "v",
            F.sum("c").over(wc).alias("cum"),
            F.sum("c").over(wt).alias("tot"),
        )
        .where(2 * F.col("cum") >= F.col("tot"))
        .groupBy("g")
        .agg(F.min("v").alias("med"))
    )
    signed = (
        base.join(med, "g")
        .where(F.col("v") != F.col("med"))
        .select("g", "_ts", "_id", (F.col("v") > F.col("med")).alias("up"))
    )
    wl = W.partitionBy("g").orderBy("_ts", "_id")
    flagged = signed.withColumn(
        "_chg",
        F.when(
            F.lag("up").over(wl).isNull() | (F.lag("up").over(wl) != F.col("up")),
            1,
        ).otherwise(0),
    )
    g = flagged.groupBy("g").agg(
        F.sum("_chg").alias("r"),
        F.sum(F.when(F.col("up"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(~F.col("up"), 1).otherwise(0)).alias("n2"),
    )
    var_pos = (
        F.lit(2) * F.col("n1") * F.col("n2") - F.col("n1") - F.col("n2")
    ) > 0
    return (
        g.where((F.col("n1") > 0) & (F.col("n2") > 0) & var_pos)
        .select(
            F.col("g").alias(group_col),
            F.col("r").alias("n_runs"),
            "n1",
            "n2",
            F.expr(RUNS_Z).alias("z"),
        )
    )


# Palma ratio from exact rank-partitioned sums: top-10% share divided by
# bottom-40% share of the total. Columns: s_top, s_bot (BIGINT), sv.
PALMA = (
    "round(CAST(s_top AS DOUBLE) / CAST(sv AS DOUBLE)"
    " / (CAST(s_bot AS DOUBLE) / CAST(sv AS DOUBLE)), 6)"
)


def palma_ratio(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Palma inequality ratio of an integer value per key: the share
    held by the top 10% of keys divided by the share of the bottom 40% —
    the inequality readout that tracks the distribution's TAILS, where
    Gini is least sensitive (Palma, 2011; Cobham & Sumner 2013).

    Cutoffs: with keys ranked ascending by (value, key), the bottom-40%
    set is ranks 1..floor(0.4*n) and the top-10% set is ranks
    n - floor(0.1*n) + 1..n — exact integer rank predicates, so both
    partitions and their sums are exact.

    Scale: one keyed aggregation, the two-phase global-rank primitive,
    one rollup. Keys-sized, never rows-sized.
    """
    from imposm3_spark.datapipe.sampling import with_global_row_numbers

    per_key = (
        df.select(F.col(key_col).alias("k"), F.col(value_col).alias("v"))
        .groupBy("k")
        .agg(F.sum("v").alias("v"))
    )
    ranked = with_global_row_numbers(per_key, ["v", "k"], rn_col="rn")
    g = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
    )
    j = ranked.crossJoin(F.broadcast(g))
    bot = F.col("rn") <= F.floor(F.lit(0.4) * F.col("n"))
    top = F.col("rn") > F.col("n") - F.floor(F.lit(0.1) * F.col("n"))
    agg = j.groupBy("n", "sv").agg(
        F.sum(F.when(bot, F.col("v")).otherwise(0)).alias("s_bot"),
        F.sum(F.when(top, F.col("v")).otherwise(0)).alias("s_top"),
    )
    return agg.where((F.col("s_bot") > 0) & (F.col("sv") > 0)).select(
        F.col("n").alias("n_keys"),
        "s_top",
        "s_bot",
        F.expr(PALMA).alias("palma"),
    )


def group_deciles(
    df: DataFrame,
    group_col: str,
    value_col,
    n_q: int = 10,
) -> DataFrame:
    """Exact lower quantile values per group: for q = 1..n_q-1, the
    smallest value whose cumulative count covers q/n_q of the group —
    from the (group, distinct-value) cumulative table (the
    weighted-median discipline; the window rides value cardinality,
    never rows). Returns (group, q, v)."""
    from pyspark.sql import Window as W

    vc = (
        df.select(F.col(group_col).alias("g"), value_col.alias("v"))
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wc = W.partitionBy("g").orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    wt = W.partitionBy("g")
    cum = vc.select(
        "g",
        "v",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(wt).alias("tot"),
    )
    qs = df.sparkSession.range(1, n_q).select(F.col("id").alias("q"))
    return (
        cum.crossJoin(F.broadcast(qs))
        .where(F.lit(n_q) * F.col("cum") >= F.col("q") * F.col("tot"))
        .groupBy("g", "q")
        .agg(F.min("v").alias("v"))
    )
