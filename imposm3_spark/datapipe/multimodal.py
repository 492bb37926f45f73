"""Multimodal columns for training-data pipelines.

Images/audio/video ride through the engine as opaque BINARY columns with a
typed metadata struct. The Spark-side plumbing — schema, batching,
partition-size control, UDF signatures — is real and tested; the actual
decode/resize/frame-sample kernels are STUBBED behind deterministic fakes
(the decoding libraries are not in this container) and clearly marked: swap
`_decode_image_stub` etc. for PIL/ffmpeg calls in a real deployment.

Scale notes:
- payloads live in their own column so Parquet keeps them out of scans
  that don't touch them (column pruning works per-column, not per-row)
- mapInPandas streams Arrow batches — bounded memory per task even with
  multi-MB payloads; cap `spark.sql.execution.arrow.maxRecordsPerBatch`
  and `maxPartitionBytes` so a task's working set stays in memory
- feature extraction emits fixed-size float arrays -> columnar, joinable
  with the embedding similarity ops (datapipe/similarity.py)
"""

from __future__ import annotations

from collections.abc import Iterator
import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


# Capability probe (round-7): the decode kernel upgrades itself the day
# the environment gains Pillow — no code change needed. The probe runs at
# module import on driver AND executors (the module is re-imported inside
# each Python worker, so a heterogeneous cluster would probe per-host;
# pin the env in deployment if that matters).
try:  # pragma: no cover - exercised only where Pillow is installed
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False


def _decode_image_stub(payload: bytes, dim: int = 8) -> list[float]:
    """STUB: deterministic fake 'decode + embed' — `dim` floats derived
    from the payload digest, so tests are reproducible and the full Spark
    plumbing is exercised without any decoding library."""
    digest = hashlib.sha256(payload).digest()
    return [digest[i] / 255.0 for i in range(dim)]


def _decode_image_pil(payload: bytes, dim: int = 8) -> list[float]:
    """Real decode (requires Pillow): decode -> grayscale -> resize to a
    dim x dim thumbnail -> per-row mean luminance in [0, 1] (`dim`
    floats). The minimal honest decode+pool featurizer; swap the pooling
    for a model call in a real embedding deployment."""
    import io

    img = _PILImage.open(io.BytesIO(payload)).convert("L").resize((dim, dim))
    px = list(img.getdata())
    return [sum(px[r * dim : (r + 1) * dim]) / (dim * 255.0) for r in range(dim)]


# selected once by capability, overridable per call in extract_image_features
default_image_decoder = _decode_image_pil if HAS_PIL else _decode_image_stub


def extract_image_features(
    df: DataFrame, dim: int = 8, decoder=None
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    One Arrow batch in, one out; only media_id/payload are read (Parquet
    prunes the rest). `decoder` defaults to the capability-probed
    `default_image_decoder` (real Pillow decode when available, the
    deterministic digest stub otherwise); pass `_decode_image_stub`
    explicitly for oracle-checkable runs on synthetic payloads."""
    if decoder is None:
        decoder = default_image_decoder

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                rows.append(
                    {
                        "media_id": int(media_id),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "n_bytes": len(payload),
                        "features": decoder(payload, dim),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "sha256", "n_bytes", "features"]
            )

    return df.select("media_id", "payload").mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, max_side: int = 256) -> DataFrame:
    """STUB resize: real implementation decodes, resizes, re-encodes the
    payload. The stub marks the metadata transform (dimension clamp) and
    passes the payload through — the plumbing (struct rewrite inside the
    row, no shuffle) is the part that matters for the engine."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side))
        / F.greatest(F.col("meta.width"), F.col("meta.height")).cast("double"),
    )
    new_meta = F.struct(
        F.col("meta.mime").alias("mime"),
        (F.col("meta.width") * scale).cast("int").alias("width"),
        (F.col("meta.height") * scale).cast("int").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )
    return df.withColumn("meta", new_meta)


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB frame sampling: emits (media_id, frame_ts_ms) rows from the
    duration metadata — the explode shape of a real frame sampler. A real
    kernel would also emit the decoded frame bytes per row."""
    n_frames = F.greatest(
        F.lit(1), (F.col("meta.duration_ms") / every_ms).cast("int")
    )
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms
                )
            ).alias("frame_ts_ms"),
        )
    )


def dedup_media_exact(df: DataFrame) -> DataFrame:
    """Exact payload dedup: hash-groupBy on the binary digest (same shape
    as text exact dedup — one shuffle keyed by digest)."""
    return (
        df.withColumn("_h", F.sha2(F.col("payload"), 256))
        .groupBy("_h")
        .agg(F.min("media_id").alias("media_id"), F.count("*").alias("dup_count"))
        .drop("_h")
    )
