"""Streaming Misra-Gries heavy hitters: the unbounded-stream form of
stats.misra_gries_summary.

Per key (e.g. event_type), the state is ONE bounded MG summary — at most
`k` (item, counter) pairs — updated by the classic decrement algorithm:
increment a tracked item, adopt an untracked one while capacity remains,
otherwise decrement every counter and drop zeros. The summary answers
"which items could exceed N/(k+1) frequency" with O(k) memory per key no
matter how many distinct items stream past — the canonical bounded-state
frequency sketch.

Determinism: rows are processed in (ts, event_id) order within each
micro-batch, and the algorithm is sequential-deterministic, so a stream
replay equals the sequential reference on the concatenated in-order
input (pinned by the e2e test). MG guarantees hold at every point:
counter <= exact count <= counter + floor(N/(k+1)).

Each micro-batch emits the key's post-batch summary snapshot tagged
with a MONOTONE per-key snapshot counter carried in the state (append
mode) — the consumer keeps the row set with the highest snapshot_id per
key. A batch that empties the summary emits one null-item row so the
shrink is observable (an absent snapshot would leave the consumer stuck
on the previous one).

Scale notes: the grouping shuffle is on the key; state is O(k) longs +
strings per key regardless of cardinality of the tracked items.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("snapshot_id", LongType(), False),
        StructField("item", StringType(), True),
        StructField("est_lower", LongType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(StringType()), True),
        StructField("counts", ArrayType(LongType()), True),
        StructField("snap", LongType(), True),
    ]
)


def mg_update(summary: dict, item: str, k: int) -> None:
    """One Misra-Gries step, in place."""
    if item in summary:
        summary[item] += 1
    elif len(summary) < k:
        summary[item] = 1
    else:
        for it in list(summary):
            summary[it] -= 1
            if summary[it] == 0:
                del summary[it]


def mg_reference(items: list[str], k: int) -> dict:
    """Sequential reference: the summary after the whole in-order
    stream — the spec the streaming operator must replay."""
    s: dict = {}
    for it in items:
        mg_update(s, it, k)
    return s


def make_group_fn(k: int):
    def _group_fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, snap = state.get
            summary = dict(zip(list(items or []), list(counts or [])))
            snap = int(snap or 0)
        else:
            summary, snap = {}, 0
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        for r in rows.itertuples():
            mg_update(summary, str(r.item), k)
        snap += 1  # monotone per-key snapshot counter, survives checkpoint
        state.update(
            (list(summary.keys()), [int(v) for v in summary.values()], snap)
        )
        kk = str(key[0])
        out = [(kk, snap, it, int(c)) for it, c in sorted(summary.items())]
        if not out:
            # summary emptied by decrements: emit the shrink explicitly
            out = [(kk, snap, None, 0)]
        yield pd.DataFrame(out, columns=["key", "snapshot_id", "item", "est_lower"])

    return _group_fn


def streaming_mg_heavy(
    events: DataFrame,
    k: int = 4,
    key_col: str = "event_type",
    item_col: str = "user_id",
) -> DataFrame:
    """Misra-Gries heavy hitters over an unbounded stream: `events` must
    be a STREAMING DataFrame with (event_id, ts, `key_col`, `item_col`);
    returns the append-mode per-batch summary snapshots."""
    from pyspark.sql import functions as F

    src = events.select(
        "event_id", "ts", F.col(key_col).alias("key"), F.col(item_col).cast("string").alias("item")
    )
    return src.groupBy("key").applyInPandasWithState(
        make_group_fn(k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
