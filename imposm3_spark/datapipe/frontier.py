"""Distributed Pareto frontier (skyline) over a two-metric domain.

The skyline operator returns the points not dominated by any other point
(q dominates p iff q is >= on the maximized metric and <= on the
minimized metric, strictly better on at least one). Classic OLAP
operator (Borzsony, Kossmann, Stocker: "The Skyline Operator", ICDE'01)
that SQL expresses only as a quadratic NOT EXISTS self-join.

Distributed plan (all metrics integer-exact):

1. aggregate the input to one row per entity (one keyed shuffle);
2. collapse to one row per distinct minimized-metric value with the max
   of the maximized metric (second keyed shuffle, map-side combinable —
   the "price-level" table);
3. an EXCLUSIVE running max over the price levels ordered ascending,
   done with the repo's two-phase global-order pattern (range
   repartition + local sort, per-partition maxima -> driver prefix max
   -> broadcast offsets, one mapInPandas pass) — NO single-task window;
4. join the levels back: an entity is on the frontier iff it holds the
   max metric within its own level AND beats the running max of every
   strictly better level.

Total cost: two aggregations + one range exchange over the (much
smaller) level table + one equi-join — versus the oracle's O(n^2)
NOT EXISTS. Ties on both coordinates are mutually non-dominating, so
all tied entities stay on the frontier (same semantics as the SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skyline_max_min(
    df: DataFrame,
    id_col: str,
    max_col: str,
    min_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Frontier of one-row-per-``id_col`` ``df``: maximize ``max_col``,
    minimize ``min_col`` (both integer columns). Returns the input rows
    that no other row dominates."""
    from pyspark import TaskContext
    from pyspark.sql.types import LongType, StructField, StructType

    levels = df.groupBy(min_col).agg(F.max(max_col).alias("_lvl_max"))

    from imposm3_spark.datapipe.sampling import plan_parallelism

    n_parts = num_partitions or plan_parallelism(levels)
    ordered = levels.repartitionByRange(n_parts, min_col).sortWithinPartitions(
        min_col
    )
    # Pin ONE sampled range partitioning for both the maxima job and the
    # scan job (same boundary-stability requirement as
    # sampling.with_global_row_numbers).
    ordered = ordered.localCheckpoint(eager=True)
    part_max = (
        ordered.select(
            F.spark_partition_id().alias("_pid"), F.col("_lvl_max")
        )
        .groupBy("_pid")
        .agg(F.max("_lvl_max").alias("_m"))
        .collect()
    )
    by_pid = {r["_pid"]: r["_m"] for r in part_max}
    offsets: dict[int, int | None] = {}
    acc: int | None = None
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc = by_pid[pid] if acc is None else max(acc, by_pid[pid])

    schema = StructType(
        list(ordered.schema.fields) + [StructField("_max_lt", LongType())]
    )

    def excl_cummax(batches):
        import numpy as np
        import pandas as pd

        pid = TaskContext.get().partitionId()
        running = offsets.get(pid)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vals = pdf["_lvl_max"].to_numpy()
            cm = np.maximum.accumulate(vals)
            # exclusive: shift by one, seed with the prior-partition max
            excl = np.empty(len(vals), dtype=object)
            excl[0] = running
            if len(vals) > 1:
                excl[1:] = cm[:-1]
                if running is not None:
                    excl[1:] = np.maximum(cm[:-1], running)
            running = cm[-1] if running is None else max(running, int(cm[-1]))
            yield pdf.assign(_max_lt=pd.array(excl, dtype="Int64"))

    lvl = ordered.mapInPandas(excl_cummax, schema=schema)

    out = df.join(lvl, min_col).where(
        (F.col(max_col) == F.col("_lvl_max"))
        & (F.col("_max_lt").isNull() | (F.col(max_col) > F.col("_max_lt")))
    )
    return out.select(id_col, max_col, min_col)
