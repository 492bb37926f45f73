"""Multimodal column plumbing (stubbed decode, real Spark shapes)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from imposm3_spark.datapipe.multimodal import (
    HAS_PIL,
    MEDIA_SCHEMA,
    _decode_image_pil,
    _decode_image_stub,
    dedup_media_exact,
    default_image_decoder,
    extract_image_features,
    resize_images,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-1", ("image/png", 640, 480, None)),
        (2, "image", b"\x89PNG-fake-2", ("image/png", 100, 50, None)),
        (3, "image", b"\x89PNG-fake-1", ("image/png", 640, 480, None)),  # dup payload
        (4, "video", b"RIFF-fake", ("video/mp4", 1920, 1080, 3500)),
        (5, "audio", b"OGG-fake", ("audio/ogg", None, None, 2000)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_image_features(media):
    # pin the digest stub: the fixture payloads are fake bytes a real
    # decoder would reject; the real path has its own PIL-gated test
    out = {
        r["media_id"]: r
        for r in extract_image_features(media, decoder=_decode_image_stub).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    r = out[1]
    assert r["sha256"] == hashlib.sha256(b"\x89PNG-fake-1").hexdigest()
    assert r["n_bytes"] == len(b"\x89PNG-fake-1")
    assert len(r["features"]) == 8
    assert all(0.0 <= f <= 1.0 for f in r["features"])
    # deterministic: identical payloads -> identical features
    assert out[1]["features"] == out[3]["features"]


def test_resize_metadata(media):
    out = {r["media_id"]: r["meta"] for r in resize_images(media, max_side=256).collect()}
    assert out[1]["width"] == 256 and out[1]["height"] == 192
    assert out[2]["width"] == 100 and out[2]["height"] == 50  # already small


def test_sample_video_frames(media):
    rows = sample_video_frames(media, every_ms=1000).collect()
    assert {r["media_id"] for r in rows} == {4}
    assert sorted(r["frame_ts_ms"] for r in rows) == [0, 1000, 2000]


def test_dedup_media(media):
    out = {r["media_id"]: r["dup_count"] for r in dedup_media_exact(media).collect()}
    assert out[1] == 2  # ids 1 and 3 share a payload
    assert 3 not in out


def test_features_compose_with_embedding_neardup(media):
    """extract_image_features output feeds the embedding near-dup op
    directly — the multimodal and similarity pipelines compose on the
    (id, array<float>) contract."""
    from imposm3_spark.datapipe.similarity import cosine_neardup_pairs

    feats = extract_image_features(media).select(
        F.col("media_id").alias("vec_id"),
        F.col("features").alias("embedding"),
    )
    pairs = {
        (r.a_id, r.b_id): r.sim
        for r in cosine_neardup_pairs(feats, threshold=0.999999).collect()
    }
    # identical payloads (media 1 and 3) -> identical features -> sim 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] == 1.0


def test_decoder_capability_probe():
    """The default decoder follows the probe: real Pillow decode when the
    library is importable, the deterministic digest stub otherwise."""
    expected = _decode_image_pil if HAS_PIL else _decode_image_stub
    assert default_image_decoder is expected


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed in this env")
def test_real_pil_decode_through_spark(spark):
    """Runs the day the environment gains Pillow: encode a real PNG,
    push it through the mapInPandas extract with the REAL decoder, and
    check the pooled luminance features against a local PIL computation."""
    import io

    from PIL import Image

    img = Image.new("RGB", (32, 16))
    img.putdata([(x * 8 % 256, y * 16 % 256, 0) for y in range(16) for x in range(32)])
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    payload = buf.getvalue()

    df = spark.createDataFrame(
        [(1, "image", payload, ("image/png", 32, 16, None))], MEDIA_SCHEMA
    )
    (row,) = extract_image_features(df, dim=8).collect()
    assert row["features"] == pytest.approx(_decode_image_pil(payload, 8))
    assert all(0.0 <= f <= 1.0 for f in row["features"])
