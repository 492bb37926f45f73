"""Multimodal columns for training-data pipelines.

Images/audio/video ride through the engine as opaque BINARY columns with a
typed metadata struct. The Spark-side plumbing — schema, batching,
partition-size control, UDF signatures — is real and tested. Image decode
is tiered: Pillow when installed, a pure-stdlib PNG decoder (zlib inflate +
scanline unfilter, runs everywhere) for PNG payloads, and a deterministic
digest fake as the total-function floor. Resize re-encode and video frame
decode remain STUBBED (no ffmpeg in this container) and clearly marked.

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


# ---------------------------------------------------------------------------
# Pure-stdlib PNG tier (round 10): a REAL decode path that runs in CI with
# zero dependencies beyond zlib. Covers the common non-interlaced 8-bit PNG
# forms (gray / gray+alpha / RGB / RGBA / palette, all five scanline
# filters). Anything it can't read (JPEG, interlaced or 16-bit PNG, ...)
# falls through to Pillow when present, else the digest stub — so the
# featurizer keeps its total function contract on arbitrary bytes.
# Python-per-pixel is fine for this tier's job (CI truth + small thumbnails
# inside Arrow batches); a production image fleet installs Pillow and the
# capability probe picks it automatically.
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


class PngError(ValueError):
    """Raised for bytes this tier cannot decode (corrupt or unsupported)."""


def _png_decode_gray(payload: bytes) -> tuple[int, int, list[bytearray]]:
    """Decode a non-interlaced 8-bit PNG to grayscale scanlines.

    Returns (width, height, rows) with one bytearray of luminance values
    per row. Color is reduced via the ITU-R 601 integer weights
    (299R + 587G + 114B) / 1000 — the same formula Pillow's convert("L")
    uses — so the two tiers agree on color inputs; alpha is ignored."""
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise PngError("not a PNG signature")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[
            pos + 4 : pos + 8
        ]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise PngError("truncated chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc (crc not verified)
    if ihdr is None or not idat:
        raise PngError("missing IHDR/IDAT")
    width, height, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0 or interlace != 0:
        raise PngError("interlaced or nonstandard compression/filter method")
    if depth != 8:
        raise PngError(f"unsupported bit depth {depth}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise PngError(f"unsupported color type {color}")
    if color == 3 and plte is None:
        raise PngError("palette image without PLTE")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise PngError(f"IDAT inflate failed: {exc}") from exc
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise PngError("decompressed size mismatch")

    rows: list[bytearray] = []
    prev = bytearray(stride)
    for y in range(height):
        base = y * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise PngError(f"unknown scanline filter {ftype}")
        prev = line

        gray = bytearray(width)
        if color == 0:
            gray[:] = line
        elif color == 4:  # gray + alpha
            gray[:] = line[0::2]
        else:
            if color == 3:  # palette -> RGB triples
                rgb = bytearray(width * 3)
                for x in range(width):
                    p3 = line[x] * 3
                    rgb[x * 3 : x * 3 + 3] = plte[p3 : p3 + 3]
                line, step = rgb, 3
            else:
                step = channels  # 3 (RGB) or 4 (RGBA, alpha skipped)
            for x in range(width):
                o = x * step
                gray[x] = (
                    299 * line[o] + 587 * line[o + 1] + 114 * line[o + 2]
                ) // 1000
        rows.append(gray)
    return width, height, rows


def _decode_image_png(payload: bytes, dim: int = 8) -> list[float]:
    """Real stdlib decode: PNG -> grayscale -> dim x dim box resample ->
    per-row mean luminance in [0, 1]. Same featurizer contract as
    `_decode_image_pil` (decode + pool to `dim` floats); the resample is
    area-averaging rather than Pillow's default filter, so the two real
    tiers agree in shape and scale, not bit-for-bit."""
    width, height, rows = _png_decode_gray(payload)
    feats = []
    for r in range(dim):
        y0, y1 = r * height // dim, max((r + 1) * height // dim, r * height // dim + 1)
        total = n = 0
        for c in range(dim):
            x0 = c * width // dim
            x1 = max((c + 1) * width // dim, x0 + 1)
            for y in range(y0, min(y1, height)):
                seg = rows[y][x0 : min(x1, width)]
                total += sum(seg)
                n += len(seg)
        feats.append(total / (n * 255.0) if n else 0.0)
    return feats


def _decode_image_auto(payload: bytes, dim: int = 8) -> list[float]:
    """Tiered decoder: Pillow when installed (all formats), else the
    stdlib PNG path for PNG payloads, else the deterministic digest stub.
    Total on arbitrary bytes — corrupt/unsupported payloads degrade to the
    stub instead of failing the task (a poisoned row must not kill a
    100 TB batch; filter on magic bytes upstream if strictness matters)."""
    if HAS_PIL:
        try:
            return _decode_image_pil(payload, dim)
        except Exception:
            return _decode_image_stub(payload, dim)
    if payload[:8] == _PNG_MAGIC:
        try:
            return _decode_image_png(payload, dim)
        except PngError:
            return _decode_image_stub(payload, dim)
    return _decode_image_stub(payload, dim)


# selected once by capability, overridable per call in extract_image_features;
# _decode_image_auto upgrades per-payload (Pillow > stdlib PNG > stub)
default_image_decoder = _decode_image_auto


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
