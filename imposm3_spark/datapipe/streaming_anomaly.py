"""Streaming rolling z-score anomaly detection: the unbounded-stream form
of datapipe.stats.rolling_zscore / anomalies.

Keyed stateful operator (applyInPandasWithState): state per user is the
last `window` integer-cent values — O(window) longs, the minimal footprint
for an exact rolling mean/stddev. Each micro-batch processes its rows in
event-time order (sorted within the batch per key); events arriving across
batches are scored against whatever history has been seen so far, so an
in-order stream reproduces the batch operator's output exactly (pinned by
the e2e test).

Scale notes:
- grouping shuffle is on user_id — the same key the batch window
  partitions by; state shards evenly across executors
- state is bounded by construction (window values per key), no timeout
  needed for correctness; set a TTL if the key space itself is unbounded
- the z computation is the identical integer-exact formula as the batch
  op (z = A / sqrt(B*n/(n-1)) from exact integer aggregates), so batch
  and stream agree bit-for-bit
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Iterator
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from imposm3_spark.datapipe.cents import half_up_cents
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("user_id", LongType(), False),
        StructField("n", LongType(), False),
        StructField("z", DoubleType(), False),
    ]
)

STATE_SCHEMA = StructType([StructField("hist", ArrayType(LongType()), False)])


def _round4(z: float) -> float:
    # HALF_UP to match Spark's F.round (python round() is half-even)
    return float(Decimal(repr(z)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


def _make_group_fn(window: int, min_periods: int, z_threshold: float):
    def score_group(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        hist: list[int] = list(state.get[0]) if state.exists else []
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out: list[tuple[int, int, int, float]] = []
        uid = int(key[0])
        for r in rows.itertuples():
            c = half_up_cents(r.value)
            n = len(hist)
            if n >= min_periods:
                s = sum(hist)
                ss = sum(h * h for h in hist)
                a = c * n - s
                b = n * ss - s * s
                if b > 0:
                    z = _round4(a / math.sqrt(b * n / (n - 1)))
                    if abs(z) > z_threshold:
                        out.append((int(r.event_id), uid, n, z))
            hist.append(c)
            if len(hist) > window:
                hist = hist[-window:]
        state.update((hist,))
        if out:
            yield pd.DataFrame(out, columns=["event_id", "user_id", "n", "z"])

    return score_group


def streaming_anomalies(
    events: DataFrame,
    window: int = 20,
    min_periods: int = 8,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Anomalous events of an unbounded stream, scored against each user's
    rolling previous-`window` history. `events` must be a STREAMING
    DataFrame with (event_id, ts, user_id, value); returns the anomaly
    stream (append mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_group_fn(window, min_periods, z_threshold),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
