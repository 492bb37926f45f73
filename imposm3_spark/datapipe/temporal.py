"""Temporal (point-in-interval) dimension join: resolve each fact row
against the SCD type-2 dimension interval that was valid at the fact's
timestamp — the standard warehouse "as-of the transaction date" lookup.

Naive Spark expresses this as an equi-join on the business key with the
interval bounds as a post-filter; that is correct but makes every fact
row meet EVERY historical interval of its key. The scale path here is
the classic bin-granule range join: explode each interval to the
calendar months it covers and join facts on (key, month) — each fact
meets only the intervals overlapping its month, and because SCD2
intervals are disjoint per key, at most one interval survives the exact
bound filter (no dedup step needed).

Open (is_current) intervals are capped at the facts' max month with a
one-row aggregate broadcast — declarative, no driver round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _month_index(ts: Column) -> Column:
    return F.year(ts) * F.lit(12) + F.month(ts) - F.lit(1)


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_key: str,
    point_ts: str,
    iv_key: str = "user_id",
    iv_from: str = "valid_from",
    iv_to: str = "valid_to",
) -> DataFrame:
    """Inner-join ``points`` to the interval valid at ``point_ts``:
    ``iv_from <= ts < iv_to`` (NULL ``iv_to`` = still current). Returns
    every point column plus the interval's payload columns.

    Month-binned: both sides gain an integer month key; intervals
    explode to one row per month covered (capped at the points' max
    month), so the equi-join key is (business key, month) and per-key
    fanout is intervals-per-month, not intervals-per-history.
    """
    pts = points.withColumn("_pm", _month_index(F.col(point_ts).cast("timestamp")))

    cap = pts.agg(F.max("_pm").alias("_cap"))  # one row — broadcast cross join
    iv = (
        intervals.crossJoin(F.broadcast(cap))
        .withColumn("_mfrom", _month_index(F.col(iv_from)))
        .withColumn(
            "_mto",
            F.least(
                F.coalesce(
                    _month_index(F.col(iv_to)), F.col("_cap")
                ),
                F.col("_cap"),
            ),
        )
        # an interval entirely past the cap contributes nothing
        .where(F.col("_mfrom") <= F.col("_mto"))
        .withColumn("_pm", F.explode(F.sequence(F.col("_mfrom"), F.col("_mto"))))
        .drop("_mfrom", "_mto", "_cap")
    )

    # Facts and dimension often share lineage (both derived from the
    # same source table), so disambiguate with explicit plan aliases
    # rather than DataFrame-indexed columns.
    pts = pts.alias("_tpj_p")
    iv = iv.alias("_tpj_i")
    p = lambda c: F.col(f"_tpj_p.{c}")  # noqa: E731
    v = lambda c: F.col(f"_tpj_i.{c}")  # noqa: E731
    ts = p(point_ts).cast("timestamp")
    cond = (
        (p(point_key) == v(iv_key))
        & (p("_pm") == v("_pm"))
        & (ts >= v(iv_from))
        & (v(iv_to).isNull() | (ts < v(iv_to)))
    )
    payload = [
        c for c in intervals.columns if c not in (iv_key, iv_from, iv_to)
    ]
    keep = [p(c) for c in points.columns] + [
        v(c) for c in payload + [iv_from, iv_to]
    ]
    return pts.join(iv, cond, "inner").select(*keep)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    l_from: str = "l_from",
    l_to: str = "l_to",
    r_from: str = "r_from",
    r_to: str = "r_to",
) -> DataFrame:
    """Interval-interval overlap join within a key: every (left, right)
    interval pair of the same key with ``l_from < r_to AND r_from <
    l_to`` (half-open [from, to) semantics), plus the exact overlap in
    seconds. The generic range-join primitive behind campaign/session
    alignment, downtime attribution, and double-booking detection.

    Scale: the same month-granule binning as interval_point_join — both
    sides explode to the months they cover, the join key is (key,
    month), and a pair overlapping k months is produced k times then
    deduplicated by the distinct on the pair identity, keeping per-task
    fanout proportional to intervals-per-month. Skewed months fall to
    AQE skew-join splitting.
    """
    lv = left.withColumn("_mf", _month_index(F.col(l_from))).withColumn(
        "_mt", _month_index(F.col(l_to))
    )
    rv = right.withColumn("_mf", _month_index(F.col(r_from))).withColumn(
        "_mt", _month_index(F.col(r_to))
    )
    lv = lv.withColumn("_pm", F.explode(F.sequence(F.col("_mf"), F.col("_mt")))).drop(
        "_mf", "_mt"
    )
    rv = rv.withColumn("_pm", F.explode(F.sequence(F.col("_mf"), F.col("_mt")))).drop(
        "_mf", "_mt"
    )
    lv = lv.alias("_ov_l")
    rv = rv.alias("_ov_r")
    lc = lambda c: F.col(f"_ov_l.{c}")  # noqa: E731
    rc = lambda c: F.col(f"_ov_r.{c}")  # noqa: E731
    cond = (
        (lc(key) == rc(key))
        & (lc("_pm") == rc("_pm"))
        & (lc(l_from) < rc(r_to))
        & (rc(r_from) < lc(l_to))
    )
    ov_start = F.greatest(lc(l_from), rc(r_from))
    ov_end = F.least(lc(l_to), rc(r_to))
    keep = (
        [lc(c) for c in left.columns]
        + [rc(c) for c in right.columns if c != key]
        + [
            (
                F.unix_timestamp(ov_end.cast("timestamp"))
                - F.unix_timestamp(ov_start.cast("timestamp"))
            ).alias("overlap_s")
        ]
    )
    return lv.join(rv, cond, "inner").select(*keep).distinct()
