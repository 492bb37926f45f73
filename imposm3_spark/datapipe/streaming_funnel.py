"""Streaming time-bound funnel: the unbounded-stream form of
datapipe.mining.funnel_timebound.

Keyed stateful operator (applyInPandasWithState): state per key is the
first qualifying timestamp of each completed step (three longs, epoch
microseconds; 0 = step not reached) — exactly the conditional-min chain
the batch operator computes, unrolled over arrival. A row is emitted
whenever a key ADVANCES a stage (append mode), carrying the new stage
and, on completion, the exact step1→step3 seconds.

In-order streams reproduce the batch operator's final stage per key: the
batch chain takes the MINIMUM qualifying timestamp per step, and with
events arriving in event-time order the first qualifying arrival IS that
minimum. Late events cannot rewind an emitted advancement (append-mode
price, same as streaming_attribution).

Scale: one grouping shuffle on the key; three longs of state per key —
set a state TTL when the key space is unbounded.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("stage", LongType(), False),
        StructField("event_id", LongType(), False),
        StructField("convert_s", LongType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("t1", LongType(), False),
        StructField("t2", LongType(), False),
        StructField("t3", LongType(), False),
    ]
)

STEPS = ("signup", "click", "purchase")
WITHIN_US = 24 * 3600 * 1_000_000


def _group_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    t1, t2, t3 = (state.get if state.exists else (0, 0, 0))
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    out: list[tuple[int, int, int, int | None]] = []
    uid = int(key[0])
    for r in rows.itertuples():
        # pandas Timestamp.value is nanoseconds; state holds microseconds
        ts = int(r.ts.value // 1000) if hasattr(r.ts, "value") else int(r.ts)
        et = r.event_type
        if et == STEPS[0] and t1 == 0:
            t1 = ts
            out.append((int(r.event_id), uid, 1, None))
        elif et == STEPS[1] and t1 != 0 and t2 == 0 and t1 < ts <= t1 + WITHIN_US:
            t2 = ts
            out.append((int(r.event_id), uid, 2, None))
        elif et == STEPS[2] and t2 != 0 and t3 == 0 and t2 < ts <= t2 + WITHIN_US:
            t3 = ts
            out.append((int(r.event_id), uid, 3, (t3 - t1) // 1_000_000))
    state.update((int(t1), int(t2), int(t3)))
    if out:
        yield pd.DataFrame(
            [(u, s, e, c) for (e, u, s, c) in out],
            columns=["user_id", "stage", "event_id", "convert_s"],
        ).astype({"convert_s": "object"})


def streaming_funnel(events: DataFrame) -> DataFrame:
    """Time-bound funnel over an unbounded stream. `events` must be a
    STREAMING DataFrame with (event_id, ts, user_id, event_type);
    emits one row per stage advancement (append mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _group_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
