"""Multimodal-column queries (datapipe.multimodal) with DuckDB oracles.

The media fixture is derived deterministically from `documents`: payload =
UTF-8 bytes of the text, kind cycles image/audio/video, width/height/
duration are arithmetic on doc_id. That keeps the binary-column plumbing
(opaque payload + typed metadata struct, mapInPandas feature extraction,
metadata-only transforms) oracle-checkable: DuckDB reproduces every value
from the same parquet.

Stub notes: the feature "decode" is the deterministic sha256-derived fake
from datapipe.multimodal (real decoders aren't in this container); the
oracle recomputes the digest arithmetic in SQL, so the check pins the
whole Spark path — binary encode, Arrow batch transfer, mapInPandas,
float32 feature array — end to end. Features compare at 5 decimals:
exhaustively verified equal for float32 vs float64 over all 256 byte
values (round-6 has three mismatching bytes, round-5 none).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imposm3_spark.benchqueries import _t, register
from imposm3_spark.datapipe import multimodal as mm

_FEATURE_DIM = 8

# shared fixture SQL: media table derived from documents
_SQL_MEDIA = """
    media AS (
      SELECT doc_id AS media_id,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             text,
             CAST(100 + doc_id % 1900 AS INT) AS width,
             CAST(100 + doc_id % 1080 AS INT) AS height,
             CAST(500 + (doc_id % 20) * 700 AS INT) AS duration_ms
      FROM documents
    )
"""


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic media table: documents' text bytes as an opaque payload."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3).cast("int") + 1,
        ).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            (100 + F.col("doc_id") % 1900).cast("int").alias("width"),
            (100 + F.col("doc_id") % 1080).cast("int").alias("height"),
            (500 + (F.col("doc_id") % 20) * 700).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


@register(
    "media_resize_meta",
    f"""
    WITH {_SQL_MEDIA}
    SELECT media_id, kind,
           CAST(floor(width * least(1.0, 256.0 / greatest(width, height)))
                AS INT) AS width,
           CAST(floor(height * least(1.0, 256.0 / greatest(width, height)))
                AS INT) AS height
    FROM media
    """,
)
def media_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only resize transform (no shuffle, no payload touch)."""
    m = mm.resize_images(_media(spark, sf_dir), max_side=256)
    return m.select(
        "media_id", "kind", F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


@register(
    "media_frame_sample",
    f"""
    WITH {_SQL_MEDIA}
    SELECT media_id,
           CAST(f * 1000 AS INT) AS frame_ts_ms
    FROM media
    CROSS JOIN unnest(generate_series(
        0, greatest(1, CAST(floor(duration_ms / 1000.0) AS INT)) - 1)) AS t(f)
    WHERE kind = 'video'
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling explode shape (stubbed kernel, real explode)."""
    return mm.sample_video_frames(_media(spark, sf_dir), every_ms=1000).select(
        "media_id", F.col("frame_ts_ms").cast("int").alias("frame_ts_ms")
    )


@register(
    "media_dedup_exact",
    f"""
    WITH {_SQL_MEDIA}
    SELECT min(media_id) AS media_id, count(*) AS dup_count
    FROM media GROUP BY sha256(text)
    """,
)
def media_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact payload dedup: one shuffle keyed by the binary digest."""
    return mm.dedup_media_exact(_media(spark, sf_dir))


@register(
    "media_features",
    f"""
    WITH {_SQL_MEDIA}
    SELECT media_id,
           sha256(text) AS sha256,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           array_to_string(list_transform(
             generate_series(0, {_FEATURE_DIM - 1}),
             i -> CAST(floor(round(
                    CAST(('0x' || substr(sha256(text), i * 2 + 1, 2)) AS INT)
                    / 255.0, 5) * 100000 + 0.5) AS BIGINT)
           ), ',') AS features
    FROM media
    """,
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over the binary payload column; the
    float32 feature array compares to the oracle at 5 decimals (exact for
    every possible byte value). Pins the deterministic digest decoder
    explicitly: the fixture payloads are synthetic text bytes, and the
    oracle replicates the digest arithmetic — the capability-probed real
    decoder (Pillow, when present) is exercised by the skip-without-PIL
    unit test instead.

    ``features`` is rendered as a comma-joined string of e5 integers
    (floor(round(f, 5) * 1e5 + 0.5)): the driver's comparator cannot
    canonicalize ArrayType cells (round-8 forensics), and rendering the
    already-engine-identical rounded doubles as fixed-point integers
    sidesteps any double->string repr skew between engines."""
    feats = mm.extract_image_features(
        _media(spark, sf_dir), dim=_FEATURE_DIM, decoder=mm._decode_image_stub
    )
    e5 = lambda x: F.floor(  # noqa: E731
        F.round(x.cast("double"), 5) * F.lit(100000.0) + F.lit(0.5)
    ).cast("bigint").cast("string")
    return feats.select(
        "media_id", "sha256", "n_bytes",
        F.array_join(F.transform(F.col("features"), e5), ",").alias("features"),
    )


__all__ = ["media_resize_meta", "media_frame_sample", "media_dedup_exact", "media_features"]
