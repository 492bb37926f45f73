"""Time-series densification: gap-fill a per-key hourly series and
linearly interpolate missing buckets (the timescaledb `time_bucket_gapfill
+ interpolate` shape, built from Spark primitives).

Reference parity note: imposm3 has no time-series surface; this is part
of the analytics-engine extension set for event pipelines.

Exactness: bucket sums run on integer cents; the interpolated value is
ONE fixed-order float expression over exact BIGINTs,

    value = double(prev_c*(next_h-h) + next_c*(h-prev_h))
          / double((next_h-prev_h) * 100)

so the DuckDB oracle hash-matches bit-for-bit. Hour indexing is pure
calendar-field math (days-since-epoch * 24 + hour) — no timezone or
epoch-conversion dependence, robust to how the driver session reads
parquet timestamps (the round-2 q12 lesson).

Scale design (100 TB):

* One shuffle to the (key, hour) aggregation (map-side combine), one
  shuffle for the dense-grid join, and key-partitioned windows — no
  global sort, no driver loop.
* The dense grid is generated per key with `sequence` + explode: grid
  size is bounded by the key's own time span, never by corpus size.
* Gap lookups are `last/first IGNORE NULLS` running windows — O(1) state
  per row, no self-join of the series against itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_EPOCH_NTZ = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"


def gapfill_hourly(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    exact: bool = False,
) -> DataFrame:
    """Dense hourly series per key over each key's own [min, max] hour
    range: observed hours carry the exact bucket sum, missing hours the
    linear interpolation between the neighbouring observed hours.

    Output: (key, hour_ts, value, filled), or with ``exact=True`` the
    exact form (key, hour_ts, value_num, value_den, filled) where
    value == value_num / value_den exactly (num/den are the interpolation
    numerator and denominator in cents) — the representation the oracle
    gate compares, immune to float-rounding and engine-version skew
    (round-5 forensics: at sf0.01 the interpolated tie 33.0115625 rounds
    HALF_UP to 33.011563 in Spark but to 33.011562 in DuckDB).
    """
    hr = (
        F.unix_date(F.to_date(ts_col)) * F.lit(24) + F.hour(ts_col)
    ).cast("long")
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    hourly = (
        events.select(F.col(key_col).alias("key"), hr.alias("hr"), cents.alias("c"))
        .groupBy("key", "hr")
        .agg(F.sum("c").alias("c"))
    )

    bounds = hourly.groupBy("key").agg(
        F.min("hr").alias("mn"), F.max("hr").alias("mx")
    )
    dense = bounds.select(
        "key", F.explode(F.sequence("mn", "mx")).alias("hr")
    )
    series = dense.join(hourly, on=["key", "hr"], how="left")

    back = (
        Window.partitionBy("key")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("key")
        .orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_c = F.last(F.col("c"), ignorenulls=True).over(back)
    prev_h = F.last(F.when(F.col("c").isNotNull(), F.col("hr")), ignorenulls=True).over(back)
    next_c = F.first(F.col("c"), ignorenulls=True).over(fwd)
    next_h = F.first(F.when(F.col("c").isNotNull(), F.col("hr")), ignorenulls=True).over(fwd)

    num = prev_c * (next_h - F.col("hr")) + next_c * (F.col("hr") - prev_h)
    den = (next_h - prev_h) * F.lit(100)
    interp = num.cast("double") / den.cast("double")
    observed = F.col("c").cast("double") / F.lit(100.0)

    if exact:
        return series.select(
            F.col("key").alias(key_col),
            F.expr(f"timestampadd(HOUR, hr, {_EPOCH_NTZ})").alias("hour_ts"),
            F.when(F.col("c").isNotNull(), F.col("c"))
            .otherwise(num)
            .cast("bigint")
            .alias("value_num"),
            F.when(F.col("c").isNotNull(), F.lit(100))
            .otherwise(den)
            .cast("bigint")
            .alias("value_den"),
            F.col("c").isNull().alias("filled"),
        )

    out = series.select(
        F.col("key").alias(key_col),
        F.expr(f"timestampadd(HOUR, hr, {_EPOCH_NTZ})").alias("hour_ts"),
        F.round(
            F.when(F.col("c").isNotNull(), observed).otherwise(interp), 6
        ).alias("value"),
        F.col("c").isNull().alias("filled"),
    )
    return out


def _step_major_scan(
    src: DataFrame, init, step, n_out: int, out_names, n_buckets: int,
    require_nonneg: bool = False,
):
    """Run a per-key integer recurrence VECTORIZED ACROSS KEYS.

    ``src`` must have columns (id, key, _o1, _o2, c). Per key, rows are
    ordered by (_o1, _o2) and a recurrence advances over them; the naive
    shape (one applyInPandas group per key, Python loop per row) pays per-
    group pandas overhead plus a Python-interpreter op per ROW. This runs
    the IDENTICAL op order in step-major form instead:

    * keys are hash-bucketed so each applyInPandas group holds MANY keys
      (one keyed exchange, n_buckets-way parallelism; bucket size = rows /
      n_buckets — raise n_buckets with data volume, the kernel is O(rows)
      memory);
    * inside a bucket, rows sort by (key, _o1, _o2), keys are ranked by
      run LENGTH DESCENDING so the keys still active at step t are always
      a PREFIX of the state arrays, and rows re-order step-major;
    * the recurrence then advances with ONE numpy int64 slice op per TIME
      STEP across all keys (numpy ``//`` floors exactly like Python's),
      so the per-key arithmetic sequence — and therefore the result — is
      bit-identical to the per-row reference, ~(rows/steps)x fewer
      interpreter ops (the kmeans Arrow-kernel playbook).

    ``init(c0) -> [state arrays]`` seeds step 0; ``step(ct, states) ->
    None`` advances the length-m prefix views in place.
    """
    import numpy as np
    import pandas as pd

    schema = "id long, key long, " + ", ".join(f"{n} long" for n in out_names)

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n == 0:
            return pd.DataFrame({c: [] for c in ("id", "key", *out_names)})
        key = pdf["key"].to_numpy()
        order = np.lexsort((pdf["_o2"].to_numpy(), pdf["_o1"].to_numpy(), key))
        cvals = pdf["c"].to_numpy()
        # NULL cents arrive as NaN in a float64 column; astype(int64) on
        # NaN is silent garbage — fail loudly like the old per-row int(c).
        if pd.isna(cvals).any():
            raise ValueError(
                "_step_major_scan: NULL value in 'c' — filter or fill "
                "nulls upstream, the recurrence has no NULL semantics"
            )
        c = cvals[order].astype(np.int64)
        if require_nonneg and (c < 0).any():
            # numpy // floors; callers whose oracle uses DuckDB's
            # truncate-toward-zero // (e.g. the EWMA CTE) only agree on
            # non-negative values — diverge loudly, not silently.
            raise ValueError(
                "_step_major_scan: negative value with require_nonneg — "
                "floor (numpy //) and truncating (DuckDB //) division "
                "disagree on negatives"
            )
        ks = key[order]
        newgrp = np.empty(n, dtype=bool)
        newgrp[0] = True
        newgrp[1:] = ks[1:] != ks[:-1]
        gidx = np.cumsum(newgrp) - 1
        starts = np.flatnonzero(newgrp)
        lens = np.diff(np.append(starts, n))
        ng = len(lens)
        rn = np.arange(n) - starts[gidx]
        # rank groups by length desc (stable on group order) -> at any
        # step t the active groups are ranks [0, counts[t])
        grp_order = np.lexsort((np.arange(ng), -lens))
        grp_rank = np.empty(ng, dtype=np.int64)
        grp_rank[grp_order] = np.arange(ng)
        pos = np.lexsort((grp_rank[gidx], rn))
        c_sm = c[pos]
        counts = np.bincount(rn)
        back = order[pos]  # step-major row j -> original pdf row
        outs = [np.empty(n, dtype=np.int64) for _ in range(n_out)]
        states = init(c_sm[:ng])
        for i in range(n_out):
            outs[i][back[:ng]] = states[i]
        off = ng
        for t in range(1, len(counts)):
            m = counts[t]
            step(c_sm[off : off + m], [s[:m] for s in states])
            for i in range(n_out):
                outs[i][back[off : off + m]] = states[i][:m]
            off += m
        res = {"id": pdf["id"].to_numpy(), "key": key}
        for name, arr in zip(out_names, outs):
            res[name] = arr
        return pd.DataFrame(res)

    bucket = F.pmod(F.hash(F.col("key")), F.lit(n_buckets))
    return src.groupBy(bucket.alias("_bkt")).applyInPandas(scan, schema)


def ewma_fixed_point(
    events: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
    id_col: str = "event_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Per-key exponentially weighted moving average (alpha = 1/4) as an
    exact integer recursion:

        e_1 = c_1,   e_t = (3*e_{t-1} + c_t) div 4      (cents BIGINT)

    EWMA is inherently sequential per key, but NOT across keys: the scan
    runs step-major, one vectorized numpy int64 op per time step across
    every key in a hash bucket (see _step_major_scan) — bit-identical to
    the oracle's recursive CTE (same multiply-add + floor division in the
    same order; values are non-negative so truncating and flooring
    division agree — ENFORCED via require_nonneg, which raises on any
    negative cent value instead of silently diverging from the oracle),
    with one keyed exchange and no per-row Python.

    Output: (id, key, ewma) with ewma = e/100 as ONE fixed division.
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    src = events.select(
        F.col(id_col).alias("id"),
        F.col(key_col).alias("key"),
        F.col(order_cols[0]).alias("_o1"),
        F.col(order_cols[1]).alias("_o2"),
        cents.alias("c"),
    )

    def init(c0):
        return [c0.copy()]

    def step(ct, states):
        (e,) = states
        e *= 3
        e += ct
        e //= 4

    scanned = _step_major_scan(
        src, init, step, 1, ("e",), n_buckets, require_nonneg=True
    )
    return scanned.select(
        "id",
        "key",
        F.round(F.col("e").cast("double") / F.lit(100.0), 4).alias("ewma"),
    )


def scd2_intervals(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) build from a change stream:
    collapse each key's consecutive runs of the same attribute value into
    validity intervals (key, value, valid_from, valid_to, is_current) —
    valid_to is the next change's timestamp, NULL while current.

    The standard warehouse pattern from Spark primitives: one keyed
    window detects change points (lag), a running count assigns run ids
    (cumulative sum of change flags — still the same keyed window), and
    one aggregation per (key, run) takes the interval bounds. Two keyed
    exchanges total (window + group), no global sort.

    Ties at the same timestamp break on `order_tiebreak`, so the build
    is deterministic under replay.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.asc(ts_col), F.asc(order_tiebreak)
    )
    run = (
        events.select(key_col, ts_col, order_tiebreak, attr_col)
        .withColumn(
            "_chg",
            F.when(
                F.lag(attr_col).over(w).isNull()
                | (F.lag(attr_col).over(w) != F.col(attr_col)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "_run",
            F.sum("_chg").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    iv = run.groupBy(key_col, "_run").agg(
        F.min_by(attr_col, F.struct(ts_col, order_tiebreak)).alias("value"),
        F.min(ts_col).alias("valid_from"),
    )
    w2 = Window.partitionBy(key_col).orderBy("_run")
    return iv.select(
        key_col,
        "value",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


def cusum_changepoint(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Exact CUSUM changepoint per key: the position maximizing
    |S_i| with S_i = sum_{j<=i}(x_j - mean) over the key's series in
    (ts, id) order — the classic mean-shift detector (Page 1954).

    Exactness: values become integer cents; the rational
    S_i = cs_i - i*s/n is scaled by n to the integer
    D_i = n*cs_i - i*s, compared in DECIMAL(38,0) (the oracle uses
    HUGEINT) — no float enters the argmax. Ties break to the earliest
    position. The reported statistic converts once at the end:
    round(D / (n * 100), 6) in value units.

    Scale: one keyed window (cumulative sum + row number + per-key
    totals share the same exchange) and one max_by aggregation — two
    key-partitioned shuffles, no global sort.
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy(key_col)
    dec = "decimal(38,0)"
    rows = (
        events.select(key_col, ts_col, id_col, cents.alias("_c"))
        .withColumn("_cs", F.sum("_c").over(wcum))
        .withColumn("_i", F.row_number().over(w))
        .withColumn("_s", F.sum("_c").over(wall))
        .withColumn("_n", F.count("*").over(wall))
        .withColumn(
            "_d",
            F.col("_n").cast(dec) * F.col("_cs").cast(dec)
            - F.col("_i").cast(dec) * F.col("_s").cast(dec),
        )
        .withColumn("_score", F.abs(F.col("_d")))
    )
    # argmax score, tie -> earliest position: max_by over (score, -i)
    pick = F.max_by(
        F.struct(
            F.col(ts_col).alias("cp_ts"),
            F.col("_i").alias("cp_index"),
            F.col("_d").alias("d"),
            F.col("_n").alias("n"),
        ),
        F.struct(F.col("_score"), (-F.col("_i")).alias("_neg")),
    )
    out = rows.groupBy(key_col).agg(pick.alias("_p"))
    return out.select(
        key_col,
        F.col("_p.cp_ts").alias("cp_ts"),
        F.col("_p.cp_index").alias("cp_index"),
        F.col("_p.n").alias("n"),
        F.round(
            F.col("_p.d").cast("double")
            / (F.col("_p.n").cast("double") * F.lit(100.0)),
            6,
        ).alias("cusum"),
    )


def hourly_lag_autocorr(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    lag_hours: int = 1,
) -> DataFrame:
    """Per-key lag-k autocorrelation of the hourly value series: Pearson
    r between hour t's total (integer cents) and hour t+k's, over hours
    where BOTH exist — the distributed seasonality/persistence detector.

    Exactness: hourly totals are BIGINT cent sums; the six sufficient
    statistics (n, sx, sy, sxy, sxx, syy) accumulate in DECIMAL(38,0)
    (cent-squared products outgrow 64 bits at scale), and r is one
    fixed-order expression over per-term double casts — the same
    discipline as stats.py's Pearson. Keys with zero variance on either
    side are dropped (r undefined).

    Scale: one keyed aggregation to hours, one (key, hour+k) equi-join
    (hour-sized tables), one keyed aggregation for the moments.
    """
    dec = "decimal(38,0)"
    hours = (
        events.select(
            F.col(key_col).alias("k"),
            F.date_trunc("hour", F.col(ts_col).cast("timestamp")).alias("h"),
            F.round(F.col(value_col) * 100).cast("bigint").alias("c"),
        )
        .groupBy("k", "h")
        .agg(F.sum("c").alias("tot"))
    )
    nxt = hours.select(
        F.col("k").alias("k2"),
        (F.col("h") - F.expr(f"INTERVAL {lag_hours} HOURS")).alias("h2"),
        F.col("tot").alias("tot2"),
    )
    pairs = hours.join(
        nxt, (F.col("k") == F.col("k2")) & (F.col("h") == F.col("h2"))
    ).select(
        "k",
        F.col("tot").cast(dec).alias("x"),
        F.col("tot2").cast(dec).alias("y"),
    )
    a = pairs.groupBy("k").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    vx = d("n") * d("sxx") - d("sx") * d("sx")
    vy = d("n") * d("syy") - d("sy") * d("sy")
    r = F.round((d("n") * d("sxy") - d("sx") * d("sy")) / F.sqrt(vx * vy), 6)
    return (
        a.withColumn("_vx", vx)
        .withColumn("_vy", vy)
        .where((F.col("_vx") > 0) & (F.col("_vy") > 0))
        .select(F.col("k").alias(key_col), "n", r.alias("r"))
    )


def holt_fixed_point(
    events: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
    id_col: str = "event_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Per-key Holt double exponential smoothing (level + trend) as an
    exact integer recursion with alpha = 1/4, beta = 1/2:

        l_1 = c_1, b_1 = 0
        l_t = (c_t + 3*(l_{t-1} + b_{t-1})) fdiv 4
        b_t = ((l_t - l_{t-1}) + b_{t-1}) fdiv 2

    where fdiv is FLOOR division (trend goes negative, so truncating and
    flooring differ — the oracle's CTE uses the same floor explicitly,
    and numpy's int64 ``//`` floors identically).
    The one-step-ahead forecast l + b tracks a drifting series where the
    plain EWMA lags by design — the classic anomaly baseline for metrics
    with trend.

    Same execution shape as ewma_fixed_point: one keyed exchange into the
    step-major vectorized scan (_step_major_scan) — one numpy op per time
    step across all keys in a bucket, no per-row Python. Output:
    (id, key, level, trend) in cents — exact BIGINTs, bit-identical to
    the recursive-CTE oracle.
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    src = events.select(
        F.col(id_col).alias("id"),
        F.col(key_col).alias("key"),
        F.col(order_cols[0]).alias("_o1"),
        F.col(order_cols[1]).alias("_o2"),
        cents.alias("c"),
    )

    def init(c0):
        import numpy as np

        return [c0.copy(), np.zeros(len(c0), dtype=np.int64)]

    def step(ct, states):
        lvl, trend = states
        prev = lvl.copy()
        # l_t = (c_t + 3*(l + b)) fdiv 4 ; b_t = ((l_t - l_prev) + b) fdiv 2
        lvl += trend
        lvl *= 3
        lvl += ct
        lvl //= 4
        trend += lvl
        trend -= prev
        trend //= 2

    scanned = _step_major_scan(
        src, init, step, 2, ("l", "b"), n_buckets
    )
    return scanned.select(
        "id", "key", F.col("l").alias("level_cents"), F.col("b").alias("trend_cents")
    )
