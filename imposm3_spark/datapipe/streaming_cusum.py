"""Streaming one-sided CUSUM changepoint alarms: the unbounded-stream
sibling of datapipe.timeseries.cusum_changepoint.

The batch detector finds the single best mean-shift point in a FINISHED
series (it needs the global mean). The online form (Page 1954) monitors
a LIVE stream against a target level mu0: with reference slack k and
alarm threshold h,

    S+_t = max(0, S+_{t-1} + (x_t - mu0 - k))     upward drift
    S-_t = max(0, S-_{t-1} - (x_t - mu0 + k))     downward drift

and an alarm fires when either statistic crosses h, after which it
resets to 0 (restart monitoring). Everything runs in integer cents —
exact multiply-free adds, so a stream replay is bit-identical to a
sequential reference regardless of micro-batch boundaries.

Keyed stateful operator (applyInPandasWithState): state per key is TWO
BIGINTs (the current S+ and S-). Rows are processed in event-time order
within each micro-batch; alarms are emitted in the append stream with
the triggering statistic and direction.

Scale notes:
- the grouping shuffle is on the key — the same exchange the batch
  operator pays; O(1) longs of state per key; set a TTL timeout when
  the key space is unbounded (not needed for correctness).
- per micro-batch work is a linear scan of that key's new rows.
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
        StructField("id", LongType(), False),
        StructField("key", StringType(), False),
        StructField("direction", StringType(), False),
        StructField("stat", DoubleType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("spos", LongType(), False), StructField("sneg", LongType(), False)]
)


def cusum_reference(
    rows: list[tuple[int, int]],
    mu0_cents: int,
    k_cents: int,
    h_cents: int,
) -> list[tuple[int, str, float]]:
    """Sequential reference recursion over (id, cents) in arrival order —
    the spec the streaming operator must replay bit-for-bit. Returns
    (id, direction, stat) alarm rows."""
    spos = sneg = 0
    out: list[tuple[int, str, float]] = []
    for rid, c in rows:
        spos = max(0, spos + (c - mu0_cents - k_cents))
        sneg = max(0, sneg - (c - mu0_cents + k_cents))
        if spos > h_cents:
            out.append((rid, "up", round(spos / 100.0, 4)))
            spos = 0
        if sneg > h_cents:
            out.append((rid, "down", round(sneg / 100.0, 4)))
            sneg = 0
    return out


def make_group_fn(mu0_cents: int, k_cents: int, h_cents: int):
    def _group_fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        spos, sneg = (state.get if state.exists else (0, 0))
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out: list[tuple[int, str, str, float]] = []
        kk = str(key[0])
        for r in rows.itertuples():
            c = half_up_cents(r.value)
            spos = max(0, spos + (c - mu0_cents - k_cents))
            sneg = max(0, sneg - (c - mu0_cents + k_cents))
            if spos > h_cents:
                out.append((int(r.event_id), kk, "up", round(spos / 100.0, 4)))
                spos = 0
            if sneg > h_cents:
                out.append((int(r.event_id), kk, "down", round(sneg / 100.0, 4)))
                sneg = 0
        state.update((int(spos), int(sneg)))
        if out:
            yield pd.DataFrame(out, columns=["id", "key", "direction", "stat"])

    return _group_fn


def streaming_cusum(
    events: DataFrame,
    mu0: float,
    k: float = 0.5,
    h: float = 5.0,
    key_col: str = "event_type",
) -> DataFrame:
    """CUSUM alarms over an unbounded stream. `events` must be a
    STREAMING DataFrame with (event_id, ts, event_type, value); returns
    the append-mode alarm stream (id, key, direction, stat)."""
    fn = make_group_fn(
        half_up_cents(mu0), half_up_cents(k), half_up_cents(h)
    )
    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
