"""JSONL corpus source: the de-facto interchange format for LLM
training-data pipelines (one JSON document per line — Dolma, C4, The
Pile, RedPajama all ship this shape).

No imposm3 counterpart (the reference reads OSM PBF/XML only); this is
the document-side source the datapipe operators (`datapipe/*`) ingest
from outside parquet.

Spark-first design:

* `spark.read.json` with an EXPLICIT schema — never schema inference,
  which at corpus scale costs a full extra pass and silently widens
  types per-file. The schema matches the `documents` table so every
  datapipe operator runs unchanged on a JSONL drop-in.
* PERMISSIVE mode with a `_corrupt` capture column: malformed lines
  land in a quarantine DataFrame instead of failing the job (the
  standard bad-record contract for multi-TB crawls). `mode="FAILFAST"`
  is available when the corpus is trusted.
* Text normalization/id-assignment are column expressions; missing
  doc_ids are backfilled deterministically from a content fingerprint
  (xxhash64), NOT monotonically_increasing_id (which is
  partitioning-dependent and breaks reproducibility).
* Compression (.gz/.zst) is handled by the line reader transparently;
  gzip files are non-splittable — at scale, prefer many medium files
  over few huge ones (noted for operators, enforced by the writer
  below, which targets `target_file_rows` per output file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    mode: str = "PERMISSIVE",
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus into the canonical documents shape.

    Returns (docs, quarantine): `docs` has (doc_id, text, lang, source,
    n_chars) with doc_id backfilled from xxhash64(text) when absent and
    empty-text rows dropped; `quarantine` carries the raw malformed
    lines (empty under FAILFAST).
    """
    schema = StructType(
        list(DOC_SCHEMA.fields) + [StructField("_corrupt", StringType())]
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    # Spark refuses file-source queries whose pruned projection is ONLY
    # the corrupt-record column, so the quarantine view parses a line
    # read with from_json instead (same schema, same PERMISSIVE
    # semantics). It is lazy — the second pass over the files runs only
    # if the caller actually inspects the quarantine.
    txt = spark.read.text(path)
    reparsed = txt.select(
        "value",
        F.from_json(
            "value",
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("j"),
    )
    quarantine = reparsed.where(F.col("j._corrupt").isNotNull()).select(
        F.col("value").alias("raw_line")
    )
    docs = (
        raw.where(F.col("_corrupt").isNull())
        .where(F.col("text").isNotNull() & (F.length("text") > 0))
        .select(
            F.coalesce(
                F.col("doc_id"), F.abs(F.xxhash64(F.col("text")))
            ).alias("doc_id"),
            "text",
            F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
            F.coalesce(F.col("source"), F.lit("unknown")).alias("source"),
            F.length("text").alias("n_chars"),
        )
    )
    return docs, quarantine


def write_jsonl(
    docs: DataFrame,
    path: str,
    target_file_rows: int = 500_000,
) -> None:
    """Write documents as JSONL with bounded file sizes: repartition to
    ceil(n / target_file_rows) output files so downstream non-splittable
    readers (gzip consumers) parallelize. One count job sizes the write —
    acceptable for a terminal sink."""
    n = docs.count()
    parts = max(1, -(-n // target_file_rows))
    docs.repartition(parts).write.mode("overwrite").json(path)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    target_file_rows: int = 1_000_000,
    order_col: str | None = None,
) -> int:
    """Small-files maintenance (the OPTIMIZE/compaction job every
    long-running ingest needs): rewrite a parquet directory into
    ceil(n / target_file_rows) evenly-sized files. With `order_col`, the
    rewrite range-partitions AND sorts by it, so per-file min/max stats
    become disjoint and row-group pruning works (see the z-order
    clustering evidence test) — compaction and clustering in one pass.
    Returns the output file count.

    Scale notes: one metadata-cheap count sizes the job; the rewrite is
    one exchange (round-robin repartition, or a range exchange when
    ordering). Never coalesce() here — coalesce skips the shuffle but
    chains upstream partitions unevenly and caps parallelism.
    """
    df = spark.read.parquet(src)
    n = df.count()
    parts = max(1, -(-n // target_file_rows))
    if order_col is not None:
        out = df.repartitionByRange(parts, order_col).sortWithinPartitions(
            order_col
        )
    else:
        out = df.repartition(parts)
    out.write.mode("overwrite").parquet(dest)
    return parts


def shard_col(id_col: str, n_shards: int):
    """Deterministic shard assignment: md5-hash of the id string mod
    n_shards — stable across engines, partitionings and re-runs (the
    property a resumable multi-job export needs; hash-partitioner shard
    ids are engine-internal and NOT stable)."""
    return (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
        ).cast("bigint")
        % n_shards
    ).cast("int")


def shard_plan(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Export manifest WITHOUT writing: per shard (shard, n_docs,
    n_tokens, n_chars, min_doc_id, max_doc_id) under the deterministic
    md5 assignment — the plan a training-data export is sized and
    audited by (balanced shards, resume bookkeeping, reader fan-out).

    Scale: one map-side-combinable aggregation keyed on the shard id;
    the md5 draw balances shards regardless of id clustering.
    """
    from imposm3_spark.datapipe.text import token_count

    return (
        docs.select(
            shard_col(id_col, n_shards).alias("shard"),
            F.col(id_col).alias("_id"),
            token_count(F.col(text_col)).alias("_tok"),
            F.length(text_col).alias("_chars"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("n_tokens"),
            F.sum("_chars").alias("n_chars"),
            F.min("_id").alias("min_doc_id"),
            F.max("_id").alias("max_doc_id"),
        )
    )


def shard_plan_oracle(n_shards: int = 16) -> str:
    r"""DuckDB oracle for shard_plan over the documents table: the same
    md5 assignment and aggregation."""
    return rf"""
    WITH s AS (
      SELECT (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % {n_shards}) AS shard,
             doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS tok,
             length(text) AS chars
      FROM documents
    )
    SELECT CAST(shard AS INTEGER) AS shard,
           count(*) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS n_tokens,
           CAST(sum(chars) AS BIGINT) AS n_chars,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id
    FROM s GROUP BY shard
    """


def write_sharded_jsonl(
    docs: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
) -> None:
    """Write the corpus as shard-partitioned JSONL (shard=NN/ dirs)
    under the same deterministic assignment shard_plan reports, so the
    manifest and the files always agree. One exchange: repartition on
    the shard column so each shard writes contiguously."""
    sharded = docs.withColumn("shard", shard_col(id_col, n_shards))
    (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(path)
    )


def read_csv_docs(
    spark: SparkSession,
    path: str,
    mode: str = "PERMISSIVE",
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Read a CSV corpus (header: doc_id,text,lang,source) into the
    canonical documents shape — the same contract as read_jsonl:
    returns (docs, quarantine), doc_id backfilled from xxhash64(text)
    when absent, empty-text rows dropped, malformed lines quarantined
    raw. CSV is the interchange format JSONL pipelines still receive
    from spreadsheets/exports; the quarantine keeps bad quoting from
    silently dropping rows.

    Scale: spark.read.csv is splittable (multiLine stays off, so quoted
    newlines are rejected into the quarantine rather than serializing
    the scan); both views are lazy single scans.
    """
    schema = StructType(
        list(DOC_SCHEMA.fields) + [StructField("_corrupt", StringType())]
    )
    raw = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("sep", sep)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )
    docs = (
        raw.where(F.col("_corrupt").isNull())
        .where(F.col("text").isNotNull() & (F.length("text") > 0))
        .select(
            F.coalesce(F.col("doc_id"), F.abs(F.xxhash64(F.col("text")))).alias(
                "doc_id"
            ),
            "text",
            F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
            F.coalesce(F.col("source"), F.lit("unknown")).alias("source"),
            F.length("text").alias("n_chars"),
        )
    )
    # same restriction as read_jsonl: a file-source projection of ONLY
    # the corrupt column is disallowed, so the quarantine view re-parses
    # raw lines with from_csv (lazy; runs only if inspected)
    txt = spark.read.text(path)
    header = f"doc_id{sep}text{sep}lang{sep}source"
    reparsed = txt.where(F.col("value") != header).select(
        "value",
        F.from_csv(
            "value",
            schema.simpleString(),
            {"sep": sep, "mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("c"),
    )
    quarantine = reparsed.where(F.col("c._corrupt").isNotNull()).select(
        F.col("value").alias("raw_line")
    )
    return docs, quarantine
