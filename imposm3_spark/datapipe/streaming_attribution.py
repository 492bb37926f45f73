"""Streaming last-touch attribution: the unbounded-stream form of
datapipe.mining.last_touch_attribution.

Keyed stateful operator (applyInPandasWithState): state per key is the
user's most recent NON-conversion event type plus its ordering position
— the minimal state a last-touch attributor needs. Every conversion row
emits immediately (append mode) credited to the state's channel; an
in-order stream therefore reproduces the batch operator's per-conversion
channel assignment exactly (the batch window LAST over an
unbounded-preceding frame is the same recursion unrolled).

A late non-conversion event that ARRIVES after a conversion it precedes
in event time cannot retroactively re-credit it — the emitted attribution
is final, the price of append-mode streaming. Within a micro-batch, rows
sort by (ts, event_id), so intra-batch ordering is deterministic.

Scale notes:
- one grouping shuffle on the key (same as the batch exchange);
- O(1) state per key (channel string + position) — set a state TTL when
  the key space is unbounded;
- the per-channel rollup downstream is a tiny keyed aggregation the
  sink maintains (streaming/maintain.py RollupStore pattern).
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
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("user_id", LongType(), False),
        StructField("channel", StringType(), False),
        StructField("revenue", DoubleType(), False),
    ]
)

# last non-conversion event type ('' = none yet) + a seen flag
STATE_SCHEMA = StructType(
    [StructField("touch", StringType(), True), StructField("seen", LongType(), False)]
)

CONVERSION = "purchase"


def _group_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    touch, seen = (state.get if state.exists else (None, 0))
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    out: list[tuple[int, int, str, float]] = []
    uid = int(key[0])
    for r in rows.itertuples():
        if r.event_type == CONVERSION:
            cents = half_up_cents(r.value)
            out.append(
                (int(r.event_id), uid, touch if touch else "(none)", cents / 100.0)
            )
        else:
            touch, seen = str(r.event_type), 1
    state.update((touch, int(seen)))
    if out:
        yield pd.DataFrame(out, columns=["event_id", "user_id", "channel", "revenue"])


def streaming_attribution(events: DataFrame) -> DataFrame:
    """Last-touch attribution over an unbounded stream. `events` must be
    a STREAMING DataFrame with (event_id, ts, user_id, event_type,
    value); returns one attributed row per conversion (append mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _group_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
