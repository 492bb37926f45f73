"""Watermarked stream-stream interval join.

Beyond-the-reference streaming surface (the reference joins a change
stream against STATIC state — SURVEY J8/T3): joining two live event-time
streams, e.g. a document stream against a labels/metadata stream, or
impressions against clicks, in a training-data pipeline.

Spark shape: both sides carry `withWatermark`, and the join condition
combines the equi-key with an event-time interval
(right.ts in [left.ts, left.ts + max_delay]). Those two bounds are what
let the engine EXPIRE state: a left row can be dropped from the join
state once the right watermark passes left.ts + max_delay, and vice
versa — so state is bounded by (rate x interval), independent of stream
length. An unbounded-state stream-stream join (no watermark or no time
bound) would grow forever at 100 TB/day; Spark rejects inner interval
joins without them for exactly that reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "1 hour",
    watermark_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join right-stream rows to the left-stream row they follow within
    ``max_delay``: ``right.ts BETWEEN left.ts AND left.ts + max_delay``
    on the equi ``key``. Columns are prefixed l_/r_ to avoid collisions.

    With ``how='leftOuter'`` unmatched left rows emit once their join
    window expires (NULL right side) — the "impression with no click"
    case — which requires the same watermarks, so the call shape is
    identical."""
    l = left.select(
        F.col(key).alias("l_key"),
        F.col(left_ts).alias("l_ts"),
        *[
            F.col(c).alias(f"l_{c}")
            for c in left.columns
            if c not in (key, left_ts)
        ],
    ).withWatermark("l_ts", watermark_delay)
    r = right.select(
        F.col(key).alias("r_key"),
        F.col(right_ts).alias("r_ts"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (key, right_ts)
        ],
    ).withWatermark("r_ts", watermark_delay)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, how)
