"""Streaming fixed-point EWMA: the unbounded-stream form of
datapipe.timeseries.ewma_fixed_point.

Keyed stateful operator (applyInPandasWithState): state per key is ONE
BIGINT (the current EWMA in cents) plus a seen flag — the minimal state
any recursive filter can carry. Rows are processed in event-time order
within each micro-batch; an in-order stream reproduces the batch
operator bit-for-bit because both run the identical integer recursion

    e_1 = c_1,   e_t = (3*e_{t-1} + c_t) div 4

(exact multiply-add + integer division — no float accumulation drift
between batch and stream, the property float EWMAs cannot give you).

Scale notes:
- the grouping shuffle is on the key — same as the batch exchange;
  O(1) longs of state per key, no timeout needed for correctness (set a
  TTL when the key space is unbounded).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from imposm3_spark.datapipe.cents import half_up_cents
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("key", LongType(), False),
        StructField("ewma", DoubleType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("e", LongType(), False), StructField("seen", LongType(), False)]
)


def _group_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    e, seen = (state.get if state.exists else (0, 0))
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    out: list[tuple[int, int, float]] = []
    k = int(key[0])
    for r in rows.itertuples():
        c = half_up_cents(r.value)
        assert c >= 0, "ewma requires non-negative values"
        e = c if not seen else (3 * e + c) // 4
        seen = 1
        # e/100 is exact to 4 decimals already (cents / 100)
        out.append((int(r.event_id), k, round(e / 100.0, 4)))
    state.update((int(e), int(seen)))
    if out:
        yield pd.DataFrame(out, columns=["id", "key", "ewma"])


def streaming_ewma(events: DataFrame) -> DataFrame:
    """EWMA over an unbounded stream. `events` must be a STREAMING
    DataFrame with (event_id, ts, user_id, value); returns the smoothed
    stream (append mode), one output row per input event."""
    return events.groupBy("user_id").applyInPandasWithState(
        _group_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
