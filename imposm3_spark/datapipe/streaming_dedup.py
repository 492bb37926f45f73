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


# ---------------------------------------------------------------------------
# streaming NEAR-dup: stateful MinHash band registry
# ---------------------------------------------------------------------------

FLAG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("band_idx", LongType(), False),
        StructField("first_doc_id", LongType(), False),
    ]
)

BAND_STATE_SCHEMA = StructType([StructField("first_doc_id", LongType(), False)])


def _band_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per (band_idx, band_key) group: the first document ever to present
    this band key claims it; every later document colliding on it is
    flagged against the claimant. Within a batch the lowest doc id wins
    (deterministic)."""
    ids: list[int] = []
    for pdf in pdfs:
        ids.extend(int(x) for x in pdf["doc_id"])
    if not ids:
        return
    ids = sorted(set(ids))
    if state.exists:
        (first,) = state.get
        dups = [i for i in ids if i != first]
    else:
        first, dups = ids[0], ids[1:]
        state.update((first,))
    if dups:
        yield pd.DataFrame(
            {
                "doc_id": dups,
                "band_idx": [int(key[0])] * len(dups),
                "first_doc_id": [first] * len(dups),
            }
        )


def streaming_neardup_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_k: int = 3,
) -> DataFrame:
    """Streaming MinHash-LSH near-duplicate detection: a stateful band
    registry flags every document that collides on any band with an
    EARLIER document (the streaming analog of datapipe.dedup's
    minhash_lsh_pairs, with "earlier" defined by arrival order instead of
    id order).

    Returns the collision stream (doc_id, band_idx, first_doc_id); a doc
    colliding on several bands appears once per band — consumers drop
    near-dups with a distinct + anti-join in foreachBatch. Semantics match
    batch LSH recall: band-collision is the candidate test (no exact
    verify stage here — a streaming verify would need the claimant's text
    in state; keep state one long per band key instead and verify the
    tiny flagged set downstream if precision matters).

    Scale: state is one long per DISTINCT band key — the same cardinality
    the batch LSH shuffles on; the grouping shuffle is docs x bands rows
    per micro-batch, partitioned by band key across executors."""
    from imposm3_spark.datapipe.dedup import lsh_band_keys, minhash_signature, shingles

    sig = minhash_signature(
        F.array_distinct(shingles(F.col(text_col), shingle_k)), num_hashes
    )
    # The STREAMING path keeps the md5-wrapped band keys even though the
    # batch path (datapipe.dedup round 9) switched to raw concat: the band
    # key is the applyInPandasWithState GROUPING key, i.e. it is persisted
    # in the checkpoint's state store. Changing its format would make a job
    # restarted from a pre-round-9 checkpoint silently match none of its
    # saved band registry — previously-seen docs would re-register as
    # firsts and duplicates would pass unflagged. md5(k) = md5(k') iff
    # k = k' (w.h.p.), so collision semantics are identical to the batch
    # raw-concat keys; only the persisted representation differs.
    bands = [F.md5(b) for b in lsh_band_keys(sig, rows_per_band)]
    banded = (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.posexplode(F.array(*bands)).alias("band_idx", "band_key"),
        )
        .filter(F.col("band_key").isNotNull())
        .withColumn("band_idx", F.col("band_idx").cast("long"))
    )
    return banded.groupBy("band_idx", "band_key").applyInPandasWithState(
        _band_group,
        outputStructType=FLAG_SCHEMA,
        stateStructType=BAND_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CHUNK_OUTPUT_SCHEMA = StructType(
    [
        StructField("chunk_hash", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("chunk_idx", LongType(), False),
        StructField("chunk_len", LongType(), False),
    ]
)


def _chunk_dedup_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per chunk-hash group: first occurrence wins (lowest doc_id, then
    chunk_idx); later arrivals of the same chunk content emit nothing."""
    if state.exists:
        return
    best = None
    for pdf in pdfs:
        pdf = pdf.sort_values(["doc_id", "chunk_idx"])
        cand = pdf.iloc[0]
        if best is None or (cand["doc_id"], cand["chunk_idx"]) < (
            best["doc_id"],
            best["chunk_idx"],
        ):
            best = cand
    if best is None:
        return
    state.update((int(best["doc_id"]),))
    yield pd.DataFrame(
        {
            "chunk_hash": [key[0]],
            "doc_id": [int(best["doc_id"])],
            "chunk_idx": [int(best["chunk_idx"])],
            "chunk_len": [int(best["chunk_len"])],
        }
    )


def streaming_chunk_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Chunk-level streaming dedup: CDC-chunk every incoming document
    (chunking.cdc_chunks — a stateless projection, so it runs inside the
    micro-batch plan) and emit only the FIRST occurrence of each chunk
    content across the stream's history — the delta-ingest shape that
    stores shared boilerplate once, ever.

    `docs` must be a STREAMING DataFrame with (doc_id, text); returns
    the first-occurrence chunk stream (append mode). State is one long
    per distinct chunk content (same footprint as streaming_exact_dedup,
    sharded by the hash key); the CDC boundary property means a shifted
    re-paste of known content still dedups everything after the first
    boundary.
    """
    from imposm3_spark.datapipe.chunking import cdc_chunks

    chunks = cdc_chunks(docs, id_col=id_col, text_col=text_col).select(
        "chunk_hash",
        F.col(id_col).alias("doc_id"),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("chunk_len").cast("long").alias("chunk_len"),
    )
    return chunks.groupBy("chunk_hash").applyInPandasWithState(
        _chunk_dedup_group,
        outputStructType=CHUNK_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
