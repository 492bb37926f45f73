"""Streaming exact dedup: emit only the FIRST occurrence of each content
hash across an unbounded document stream.

The batch engine dedups with a hash-groupBy (datapipe/dedup.py); on a
stream that becomes a custom STATEFUL operator: state = "this hash was
seen", keyed by content hash, held by the engine's state store across
micro-batches (applyInPandasWithState — the Spark-native form of a
keep-first dedup with exactly-once state under checkpointing).

Scale notes:
- state per key is a single boolean-ish row (first_seen doc id) — the
  smallest possible state footprint; hashes partition uniformly so the
  state store shards evenly across executors
- the grouping shuffle is on the content hash, the same key the batch
  dedup shuffles on — identical cost profile per batch
- NoTimeout keeps hashes forever (dedup-against-all-history); callers
  that only need windowed dedup should set a TTL timeout to bound state
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("content_hash", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
    ]
)

STATE_SCHEMA = StructType([StructField("first_doc_id", LongType(), False)])


def _dedup_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per content-hash group: pass through the lowest-id row the first
    time the hash is ever seen; afterwards emit nothing."""
    if state.exists:
        return
    best = None
    for pdf in pdfs:
        cand = pdf.loc[pdf["doc_id"].idxmin()]
        if best is None or cand["doc_id"] < best["doc_id"]:
            best = cand
    if best is None:
        return
    state.update((int(best["doc_id"]),))
    yield pd.DataFrame(
        {
            "content_hash": [key[0]],
            "doc_id": [int(best["doc_id"])],
            "text": [best["text"]],
        }
    )


def streaming_exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """First-occurrence-only document stream, keyed by md5(text).

    `docs` must be a STREAMING DataFrame; returns the deduped stream
    (append mode). Within a micro-batch ties break to the lowest doc id
    (deterministic); across batches the engine's state store suppresses
    re-emissions."""
    keyed = docs.select(
        F.md5(F.col(text_col)).alias("content_hash"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return keyed.groupBy("content_hash").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
