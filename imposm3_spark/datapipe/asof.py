"""As-of and range joins — time-series operators the reference lacks.

The reference (imposm3) has only equi-joins on int64 ids (SURVEY §2.3);
a training-data / event pipeline additionally needs temporal joins. Both
operators here are expressed so ONE shuffle on the join key does all the
work — no per-key collect, no driver loop — so they scale to 100 TB the
same way a sort-merge join does:

* ``asof_join``: union-merge formulation. Tag both inputs, union them,
  and run a single ``last(..., ignorenulls=True)`` window per key ordered
  by event time. Spark plans this as one Exchange + one sort — identical
  cost to a sort-merge join — instead of the naive
  ``left JOIN right ON key AND r.t <= l.t`` + argmax, which explodes to
  O(|left| x |right per key|) pairs before pruning.
* ``range_count_join``: conditional-band join; the equi key bounds the
  blow-up, AQE handles skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the payload of the latest right row with
    ``right.time <= left.time`` (or ``<`` when ``strict``) and the same key.
    ``direction="forward"`` flips the inequality: the EARLIEST right row
    with ``right.time >= left.time`` (``>`` when strict) — together the two
    directions compose nearest-neighbor time joins.

    Returns all left columns + ``right_payload`` columns (null when no
    right row precedes/follows the left row — i.e. an as-of LEFT join).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction {direction!r}")
    lcols = left.columns
    payload_struct = F.struct(*[F.col(c) for c in right_payload])

    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        F.lit(None).cast(right.select(payload_struct).schema[0].dataType).alias("__r"),
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(left.select(F.struct(*lcols)).schema[0].dataType).alias("__l"),
        payload_struct.alias("__r"),
    )
    both = l_tag.unionByName(r_tag)

    # at equal timestamps the right row sorts first (side 0) so a non-strict
    # as-of sees it; strict mode sorts the left row first instead. Forward
    # mode scans time DESCENDING, so "last preceding in sort order" becomes
    # "earliest following in time".
    t_ord = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    order = [t_ord, F.col("__side").asc() if not strict else F.col("__side").desc()]
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        both.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out = matched.select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__match.{c}").alias(c) for c in right_payload],
    )
    return out


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    on_left: str,
    on_right: str,
    right_time: str,
    lo,
    hi,
    agg_alias: str = "n_in_range",
) -> DataFrame:
    """Count right rows with ``lo <= right.time < hi`` per left row, where
    ``lo``/``hi`` are Column expressions over the left row. Equi key keeps
    the join banded; the count collapses immediately after, so the shuffle
    output is one row per left row."""
    lkeyed = left.withColumn("__lid", F.monotonically_increasing_id())
    j = lkeyed.join(
        right,
        (lkeyed[on_left] == right[on_right])
        & (right[right_time] >= lo)
        & (right[right_time] < hi),
        "left",
    )
    return (
        j.groupBy("__lid", *[lkeyed[c] for c in left.columns])
        .agg(F.count(right[on_right]).alias(agg_alias))
        .drop("__lid")
    )
