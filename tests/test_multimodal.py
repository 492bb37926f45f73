"""Multimodal column plumbing (stubbed decode, real Spark shapes)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from imposm3_spark.datapipe.multimodal import (
    HAS_PIL,
    MEDIA_SCHEMA,
    PngError,
    _decode_image_auto,
    _decode_image_pil,
    _decode_image_png,
    _decode_image_stub,
    _png_decode_gray,
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
    """The default decoder is the tiered auto decoder (Pillow > stdlib
    PNG > digest stub, chosen per payload)."""
    assert default_image_decoder is _decode_image_auto


# ---------------------------------------------------------------------------
# Pure-stdlib PNG tier: a test-side encoder (zlib deflate + the five
# scanline filters applied in the forward direction) exercises the
# decoder's unfilter paths against known pixel truth.
# ---------------------------------------------------------------------------


def _encode_png(width, height, color_type, pixels, plte=None, filters=None):
    """Minimal valid PNG writer. `pixels` is rows of per-channel byte
    tuples (or palette indexes for color type 3); `filters` gives the
    filter byte per row (default: cycle 0..4 to hit every unfilter)."""
    import struct
    import zlib

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    stride = width * channels
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        line = bytearray(stride)
        for x in range(width):
            px = pixels[y][x]
            if channels == 1:
                line[x] = px if isinstance(px, int) else px[0]
            else:
                line[x * channels : (x + 1) * channels] = bytes(px)
        f = (filters[y] if filters else y % 5) % 5
        out = bytearray(stride)
        for i in range(stride):
            a = line[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (line[i] - pred) & 0xFF
        raw.append(f)
        raw += out
        prev = line

    body = chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0))
    if plte is not None:
        body += chunk(b"PLTE", bytes(plte))
    body += chunk(b"IDAT", zlib.compress(bytes(raw)))
    body += chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + body


def _lum(r, g, b):
    return (299 * r + 587 * g + 114 * b) // 1000


def test_png_decode_gray_roundtrip_all_color_types():
    """Every supported color form decodes to the exact expected luminance,
    with the encoder cycling all five scanline filters across rows."""
    w, h = 7, 10  # odd width so filter byte offsets are exercised

    gray = [[(x * 37 + y * 11) % 256 for x in range(w)] for y in range(h)]
    _, _, rows = _png_decode_gray(_encode_png(w, h, 0, gray))
    assert [list(r) for r in rows] == gray

    rgb = [[((x * 31) % 256, (y * 53) % 256, (x * y) % 256) for x in range(w)] for y in range(h)]
    _, _, rows = _png_decode_gray(_encode_png(w, h, 2, rgb))
    assert [list(r) for r in rows] == [[_lum(*px) for px in row] for row in rgb]

    rgba = [[(px[0], px[1], px[2], 128) for px in row] for row in rgb]
    _, _, rows = _png_decode_gray(_encode_png(w, h, 6, rgba))
    assert [list(r) for r in rows] == [[_lum(*px) for px in row] for row in rgb]

    ga = [[(g, 200) for g in row] for row in gray]
    _, _, rows = _png_decode_gray(_encode_png(w, h, 4, ga))
    assert [list(r) for r in rows] == gray

    plte = [(i % 256, (i * 7) % 256, (i * 13) % 256) for i in range(256)]
    flat_plte = [c for rgb_ in plte for c in rgb_]
    idx = [[(x + y * w) % 256 for x in range(w)] for y in range(h)]
    _, _, rows = _png_decode_gray(_encode_png(w, h, 3, idx, plte=flat_plte))
    assert [list(r) for r in rows] == [[_lum(*plte[i]) for i in row] for row in idx]


def test_png_featurizer_pools_luminance():
    """Top-half black / bottom-half white 16x16 -> per-row means split
    0 / 1 at dim=4."""
    px = [[0 if y < 8 else 255 for _ in range(16)] for y in range(16)]
    feats = _decode_image_png(_encode_png(16, 16, 0, px, filters=[0] * 16), dim=4)
    assert feats == pytest.approx([0.0, 0.0, 1.0, 1.0])


def test_png_decoder_rejects_unsupported_forms():
    import struct
    import zlib

    def ihdr_png(depth=8, color=0, interlace=0):
        data = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)
        body = (
            struct.pack(">I", len(data))
            + b"IHDR"
            + data
            + struct.pack(">I", zlib.crc32(b"IHDR" + data))
        )
        idat = zlib.compress(bytes(6))
        body += (
            struct.pack(">I", len(idat))
            + b"IDAT"
            + idat
            + struct.pack(">I", zlib.crc32(b"IDAT" + idat))
        )
        return b"\x89PNG\r\n\x1a\n" + body

    with pytest.raises(PngError):
        _png_decode_gray(ihdr_png(depth=16))
    with pytest.raises(PngError):
        _png_decode_gray(ihdr_png(interlace=1))
    with pytest.raises(PngError):
        _png_decode_gray(b"\x89PNG\r\n\x1a\ngarbage")
    with pytest.raises(PngError):
        _png_decode_gray(b"JFIF-not-a-png")


def test_auto_decoder_tiering():
    """PNG payloads take the real stdlib decode; junk and corrupt-PNG
    payloads degrade to the digest stub (total function)."""
    px = [[(x * 16) % 256 for x in range(8)] for _ in range(8)]
    png = _encode_png(8, 8, 0, px)
    if not HAS_PIL:
        assert _decode_image_auto(png, 8) == _decode_image_png(png, 8)
    else:
        assert _decode_image_auto(png, 8) == pytest.approx(_decode_image_pil(png, 8))
    junk = b"RIFF-fake"
    assert _decode_image_auto(junk, 8) == _decode_image_stub(junk, 8)
    corrupt = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
    assert _decode_image_auto(corrupt, 8) == _decode_image_stub(corrupt, 8)


def test_real_png_decode_through_spark(spark):
    """A REAL decode in CI with zero extra dependencies: real PNG payloads
    go through the mapInPandas extract with the DEFAULT decoder; features
    match a local decode and reflect actual pixel content (not digests)."""
    dark = _encode_png(16, 16, 0, [[10] * 16 for _ in range(16)])
    light = _encode_png(16, 16, 2, [[(250, 250, 250)] * 16 for _ in range(16)])
    df = spark.createDataFrame(
        [
            (1, "image", dark, ("image/png", 16, 16, None)),
            (2, "image", light, ("image/png", 16, 16, None)),
        ],
        MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in extract_image_features(df, dim=4).collect()}
    assert out[1]["features"] == pytest.approx(_decode_image_auto(dark, 4))
    assert out[2]["features"] == pytest.approx(_decode_image_auto(light, 4))
    # pixel truth, not digest noise: uniform images pool to their luminance
    assert out[1]["features"] == pytest.approx([10 / 255.0] * 4)
    assert out[2]["features"] == pytest.approx([_lum(250, 250, 250) / 255.0] * 4)


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
