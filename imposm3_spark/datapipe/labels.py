"""Training-label construction with leakage-safe temporal cutoffs.

The supervised-learning sibling of the split/sampling operators: build
(features, label) rows where every FEATURE is computed strictly from
history at or before a cutoff timestamp and the LABEL strictly from the
(cutoff, cutoff + horizon] window — the discipline that prevents target
leakage, the most common silent failure of production training sets
(features that peek past the cutoff score great offline and collapse
online).

Reference parity: imposm3 has no ML surface; this belongs to the
training-data pipeline extension set.

Scale: one pass over the fact table splits rows into feature/label
windows by predicate (no self-join); one keyed aggregation produces
features and the label together with map-side combine. Adding features
adds columns, not passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def churn_labels(
    orders: DataFrame,
    cutoff: str,
    horizon_days: int = 90,
    key_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Per-customer churn/retention training rows at `cutoff` (an ISO
    date string — part of the dataset's identity, so pass it explicitly):

    features (history <= cutoff): n_orders, total_cents, recency_days
    (days from last order to cutoff), tenure_days (first to last order);
    label: will_return = 1 if any order lands in (cutoff,
    cutoff + horizon_days].

    Rows exist only for customers with at least one pre-cutoff order
    (the population a deployed model would score). All exact integers.
    """
    cut = F.to_date(F.lit(cutoff))
    d = F.col(ts_col).cast("date")
    g = (
        orders.select(
            F.col(key_col).alias("k"),
            d.alias("d"),
            F.round(F.col(amount_col) * 100).cast("bigint").alias("cents"),
        )
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("d") <= cut, 1).otherwise(0)).alias("n_orders"),
            F.sum(F.when(F.col("d") <= cut, F.col("cents")).otherwise(0)).alias(
                "total_cents"
            ),
            F.max(F.when(F.col("d") <= cut, F.col("d"))).alias("_last"),
            F.min(F.when(F.col("d") <= cut, F.col("d"))).alias("_first"),
            F.max(
                F.when(
                    (F.col("d") > cut)
                    & (F.col("d") <= F.date_add(cut, horizon_days)),
                    1,
                ).otherwise(0)
            ).alias("will_return"),
        )
    )
    return g.where(F.col("n_orders") > 0).select(
        F.col("k").alias(key_col),
        "n_orders",
        "total_cents",
        F.datediff(cut, F.col("_last")).cast("bigint").alias("recency_days"),
        F.datediff(F.col("_last"), F.col("_first")).cast("bigint").alias("tenure_days"),
        "will_return",
    )


def churn_labels_oracle(
    cutoff: str, horizon_days: int = 90, table: str = "orders"
) -> str:
    """DuckDB oracle: the identical one-pass window-split aggregation."""
    return f"""
    WITH src AS (
      SELECT o_custkey AS k, CAST(o_orderdate AS DATE) AS d,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM {table}
    ), g AS (
      SELECT k,
             CAST(sum(CASE WHEN d <= DATE '{cutoff}' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_orders,
             CAST(sum(CASE WHEN d <= DATE '{cutoff}' THEN cents ELSE 0 END) AS BIGINT)
               AS total_cents,
             max(CASE WHEN d <= DATE '{cutoff}' THEN d END) AS last_d,
             min(CASE WHEN d <= DATE '{cutoff}' THEN d END) AS first_d,
             CAST(max(CASE WHEN d > DATE '{cutoff}'
                            AND d <= DATE '{cutoff}' + INTERVAL {horizon_days} DAY
                           THEN 1 ELSE 0 END) AS INTEGER) AS will_return
      FROM src GROUP BY k
    )
    SELECT k AS o_custkey, n_orders, total_cents,
           CAST(date_diff('day', last_d, DATE '{cutoff}') AS BIGINT) AS recency_days,
           CAST(date_diff('day', first_d, last_d) AS BIGINT) AS tenure_days,
           will_return
    FROM g WHERE n_orders > 0
    """
