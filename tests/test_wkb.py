"""Byte-equality of the Arrow-vectorized EWKB batch encoders against the
scalar writers (reference parity target: geom/wkb.go:17-100). The batch
paths exist purely for sink throughput — any byte divergence is a bug."""

from __future__ import annotations

import math
import random

import numpy as np

from imposm3_spark.geom import wkb


def _rand_coords(rng: random.Random, n: int) -> list[tuple[float, float]]:
    return [
        (rng.uniform(-2e7, 2e7), rng.uniform(-2e7, 2e7)) for _ in range(n)
    ]


def test_points_batch_matches_scalar():
    rng = random.Random(7)
    pts = _rand_coords(rng, 257)
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    for srid in (3857, 4326, None):
        batch = wkb.points_wkb_batch(xs, ys, srid)
        for (x, y), b in zip(pts, batch):
            assert b == wkb.point_wkb(x, y, srid)


def test_points_batch_nan_matches_scalar_bytes():
    # NaN ordinates write their raw IEEE bits, exactly like the per-row
    # scalar writer always did — no silent NULL substitution
    xs = np.array([1.0, math.nan, 3.0])
    ys = np.array([4.0, 5.0, math.nan])
    batch = wkb.points_wkb_batch(xs, ys, 3857)
    for x, y, b in zip(xs, ys, batch):
        assert b == wkb.point_wkb(float(x), float(y), 3857)


def test_batch_encoders_guard_against_corrupt_inputs():
    import pytest

    with pytest.raises(ValueError, match="length mismatch"):
        wkb.points_wkb_batch(np.array([1.0, 2.0]), np.array([1.0]), 3857)
    with pytest.raises(ValueError, match="length mismatch"):
        # numpy would happily broadcast the single y across all xs
        wkb.coords_bytes(np.array([1.0, 2.0, 3.0]), np.array([9.0]))
    with pytest.raises(ValueError, match="NaN/null"):
        wkb.coords_bytes(np.array([1.0, math.nan]), np.array([2.0, 3.0]))


def test_points_batch_preserves_special_float_bits():
    # -0.0 and denormals must round-trip bit-exactly (raw IEEE copy)
    xs = np.array([-0.0, 5e-324, math.inf])
    ys = np.array([0.0, -5e-324, -math.inf])
    batch = wkb.points_wkb_batch(xs, ys, 3857)
    for x, y, b in zip(xs, ys, batch):
        assert b == wkb.point_wkb(float(x), float(y), 3857)


def test_linestrings_batch_matches_scalar():
    rng = random.Random(11)
    rows = [_rand_coords(rng, n) for n in (2, 3, 31, 32, 33, 500)]
    xs_list = [np.array([p[0] for p in r]) for r in rows]
    ys_list = [np.array([p[1] for p in r]) for r in rows]
    for srid in (3857, None):
        batch = wkb.linestrings_wkb_batch(xs_list, ys_list, srid)
        for row, b in zip(rows, batch):
            assert b == wkb.linestring_wkb(row, srid)


def test_linestrings_batch_short_rows_are_null():
    out = wkb.linestrings_wkb_batch(
        [None, np.array([1.0]), np.array([1.0, 2.0])],
        [None, np.array([1.0]), np.array([3.0, 4.0])],
        3857,
    )
    assert out[0] is None and out[1] is None
    assert out[2] == wkb.linestring_wkb([(1.0, 3.0), (2.0, 4.0)], 3857)


def test_polygon_coords_numpy_branch_matches_scalar_loop():
    # _coords switches to the numpy bulk copy at >=32 points; the decoder
    # plus byte comparison across the boundary proves both branches agree
    rng = random.Random(13)
    for n in (4, 31, 32, 33, 257):
        ring = _rand_coords(rng, n - 1)
        ring.append(ring[0])
        by_parts = struct_pack_ring(ring)
        assert wkb._coords(ring) == by_parts
        poly = wkb.polygon_wkb([ring], 3857)
        parsed = wkb.parse_wkb(poly)
        assert parsed["type"] == "Polygon" and parsed["srid"] == 3857
        assert parsed["coords"][0] == ring


def struct_pack_ring(coords):
    import struct

    out = struct.pack("<I", len(coords))
    return out + b"".join(struct.pack("<dd", x, y) for x, y in coords)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    finite = st.floats(
        allow_nan=False, allow_infinity=False, width=64, min_value=-2e7, max_value=2e7
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.tuples(finite, finite), min_size=1, max_size=300))
    def test_points_batch_roundtrip_property(pts):
        xs = np.array([p[0] for p in pts])
        ys = np.array([p[1] for p in pts])
        for (x, y), b in zip(pts, wkb.points_wkb_batch(xs, ys, 3857)):
            parsed = wkb.parse_wkb(b)
            assert parsed == {"type": "Point", "srid": 3857, "coords": (x, y)}

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.lists(st.tuples(finite, finite), min_size=2, max_size=80),
            min_size=1,
            max_size=20,
        )
    )
    def test_linestrings_batch_roundtrip_property(rows):
        xs_l = [np.array([p[0] for p in r]) for r in rows]
        ys_l = [np.array([p[1] for p in r]) for r in rows]
        batch = wkb.linestrings_wkb_batch(xs_l, ys_l, 3857)
        for row, b in zip(rows, batch):
            parsed = wkb.parse_wkb(b)
            assert parsed["type"] == "LineString" and parsed["srid"] == 3857
            assert parsed["coords"] == row
            # and the bytes are exactly what the scalar writer produces
            assert b == wkb.linestring_wkb(row, 3857)

except ImportError:  # pragma: no cover - hypothesis is in the env per brief
    pass


def test_expr_variants_match_struct_input_udfs(spark):
    """The engine's xs/ys-split expr builders must emit the same bytes as
    the struct-input UDFs they replaced (which stay as the per-row
    reference encoders)."""
    from pyspark.sql import functions as F

    from imposm3_spark.geom import build as gb

    rng = random.Random(3)
    rows = [
        (i, [{"x": x, "y": y} for x, y in _rand_coords(rng, n)])
        for i, n in enumerate([2, 5, 40, 1, 4, 7])
    ]
    df = spark.createDataFrame(
        rows, "id long, coords array<struct<x:double,y:double>>"
    )
    out = df.select(
        "id",
        gb.linestring_wkb_udf(F.col("coords"), F.lit(3857)).alias("line_ref"),
        gb.linestring_wkb_expr(F.col("coords"), F.lit(3857)).alias("line_new"),
        gb.polygon_valid_wkb_area_udf(F.col("coords"), F.lit(3857)).alias("pg_ref"),
        gb.polygon_valid_wkb_area_expr(F.col("coords"), F.lit(3857)).alias("pg_new"),
    ).collect()
    for r in out:
        assert r.line_ref == r.line_new, r.id
        assert r.pg_ref == r.pg_new, r.id


def test_linestrings_batch_null_mismatch_raises():
    """A row with exactly one of xs/ys null is corrupt input (both derive
    from one coords column): loud ValueError, not TypeError or a silent
    None geometry (round-8 advice)."""
    import numpy as np
    import pytest

    from imposm3_spark.geom import wkb as wkblib

    xs = [np.array([0.0, 1.0, 2.0])]
    with pytest.raises(ValueError, match="null mismatch"):
        wkblib.linestrings_wkb_batch(xs, [None], srid=3857)
    # both-null row is a legitimate invalid line -> None
    assert wkblib.linestrings_wkb_batch([None], [None], srid=3857) == [None]


def test_points_batch_accepts_strided_input():
    """points_wkb_batch must not require C-contiguous input: a sliced
    float64 column view (stride 16 bytes) encodes the same bytes as a
    contiguous copy (round-8 advice: ascontiguousarray, not asarray)."""
    import numpy as np

    from imposm3_spark.geom import wkb as wkblib

    interleaved = np.arange(8, dtype="<f8").reshape(4, 2)
    xs, ys = interleaved[:, 0], interleaved[:, 1]  # strided views
    assert not xs.flags["C_CONTIGUOUS"]
    got = wkblib.points_wkb_batch(xs, ys, srid=3857)
    want = wkblib.points_wkb_batch(xs.copy(), ys.copy(), srid=3857)
    assert got == want
    assert got[0] == wkblib.point_wkb(0.0, 1.0, 3857)
