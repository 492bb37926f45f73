"""WKB / EWKB codec — pure Python, no GEOS.

Parity target: /root/reference/geom/wkb.go:17-100 (native EWKB writer) and
geom/geos AsEwkbHex. Little-endian EWKB with an SRID flag, matching what the
reference writes to PostGIS.

Used only at the sink boundary / inside pandas UDF batches — geometry is
carried through the plan as coordinate arrays + scalar accessor columns, so
the hot path stays JVM-side.
"""

from __future__ import annotations

import struct
from typing import Sequence

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6
WKB_GEOMETRYCOLLECTION = 7

EWKB_SRID_FLAG = 0x20000000

Coord = tuple[float, float]


def _header(geom_type: int, srid: int | None) -> bytes:
    if srid:
        return struct.pack("<BI", 1, geom_type | EWKB_SRID_FLAG) + struct.pack("<I", srid)
    return struct.pack("<BI", 1, geom_type)


def _coords(coords: Sequence[Coord]) -> bytes:
    out = struct.pack("<I", len(coords))
    if len(coords) >= 32:
        # same little-endian IEEE bytes, one allocation instead of a
        # per-point struct.pack loop (big relation rings run through here)
        return out + np.asarray(coords, dtype="<f8").tobytes()
    return out + b"".join(struct.pack("<dd", x, y) for x, y in coords)


def point_wkb(x: float, y: float, srid: int | None = None) -> bytes:
    return _header(WKB_POINT, srid) + struct.pack("<dd", x, y)


def linestring_wkb(coords: Sequence[Coord], srid: int | None = None) -> bytes:
    return _header(WKB_LINESTRING, srid) + _coords(coords)


def polygon_wkb(rings: Sequence[Sequence[Coord]], srid: int | None = None) -> bytes:
    out = _header(WKB_POLYGON, srid) + struct.pack("<I", len(rings))
    return out + b"".join(_coords(r) for r in rings)


def multipolygon_wkb(
    polygons: Sequence[Sequence[Sequence[Coord]]], srid: int | None = None
) -> bytes:
    out = _header(WKB_MULTIPOLYGON, srid) + struct.pack("<I", len(polygons))
    # nested polygons carry no SRID header of their own
    return out + b"".join(polygon_wkb(rings, None) for rings in polygons)


# ---------------------------------------------------------------------------
# batch encoders (Arrow-vectorized sink path)
# ---------------------------------------------------------------------------
#
# Bit-identical to the scalar writers above (tests/test_wkb.py asserts
# byte equality): numpy '<f8'/'<u4' views emit the same little-endian IEEE
# bytes struct.pack does. These exist because the sink boundary encodes
# EVERY output row — on a planet-scale import the per-row struct.pack +
# per-coordinate tuple unpacking in a Python loop was the dominant cost of
# the parquet sink stage (measured on the replicated-Monaco import bench).


def points_wkb_batch(
    x: np.ndarray, y: np.ndarray, srid: int | None = None
) -> list[bytes]:
    """EWKB for n points in one allocation. NaN ordinates encode their raw
    IEEE bits, exactly like the scalar point_wkb (the engine's projected
    coords are non-null by construction; a NaN reaching the sink writes
    the same bytes the per-row writer always wrote, no silent NULLs)."""
    # ascontiguousarray, not asarray: .view(np.uint8) below requires C
    # contiguity, and asarray would pass a strided float64 slice through
    x = np.ascontiguousarray(x, dtype="<f8")
    y = np.ascontiguousarray(y, dtype="<f8")
    if len(x) != len(y):
        raise ValueError(f"x/y length mismatch: {len(x)} != {len(y)}")
    n = len(x)
    header = np.frombuffer(_header(WKB_POINT, srid), dtype=np.uint8)
    h = len(header)
    buf = np.empty((n, h + 16), dtype=np.uint8)
    buf[:, :h] = header
    buf[:, h : h + 8] = x.view(np.uint8).reshape(n, 8)
    buf[:, h + 8 :] = y.view(np.uint8).reshape(n, 8)
    return [row.tobytes() for row in buf]


def coords_bytes(xs: np.ndarray, ys: np.ndarray) -> bytes:
    """<u4 count + interleaved <f8 (x,y) pairs — numpy analog of _coords.

    Raises on length mismatch (numpy would otherwise broadcast a scalar
    across the other axis — well-formed but corrupt geometry) and on
    NaN/null ordinates (the struct-input encoders crashed loudly on null
    coordinates; the array path must not silently encode garbage)."""
    n = len(xs)
    if len(ys) != n:
        raise ValueError(f"xs/ys length mismatch: {n} != {len(ys)}")
    pts = np.empty((n, 2), dtype="<f8")
    pts[:, 0] = xs
    pts[:, 1] = ys
    if np.isnan(pts).any():
        raise ValueError("NaN/null coordinate in coordinate sequence")
    return struct.pack("<I", n) + pts.tobytes()


def linestrings_wkb_batch(
    xs_list: Sequence[np.ndarray | None],
    ys_list: Sequence[np.ndarray | None],
    srid: int | None = None,
) -> list[bytes | None]:
    """EWKB linestrings from per-row coordinate arrays (already deduped);
    rows with <2 points encode to None (geom.go:81-85 invalid line). A row
    where exactly one of xs/ys is null raises — that can only be corrupt
    input (the engine splits both arrays from one coords column), and it
    must not silently drop a geometry."""
    header = _header(WKB_LINESTRING, srid)
    out: list[bytes | None] = []
    for xs, ys in zip(xs_list, ys_list):
        if (xs is None) != (ys is None):
            raise ValueError("xs/ys null mismatch in one row")
        if xs is None or len(xs) < 2:
            out.append(None)
        else:
            out.append(header + coords_bytes(xs, ys))
    return out


# ---------------------------------------------------------------------------
# decoder (tests / oracle comparisons)
# ---------------------------------------------------------------------------


def parse_wkb(buf: bytes) -> dict:
    """Parse (E)WKB into {'type': str, 'srid': int|None, 'coords': ...}."""
    pos = 0

    def u8() -> int:
        nonlocal pos
        v = buf[pos]
        pos += 1
        return v

    def u32(endian: str) -> int:
        nonlocal pos
        v = struct.unpack_from(f"{endian}I", buf, pos)[0]
        pos += 4
        return v

    def dbl(endian: str, n: int) -> list[float]:
        nonlocal pos
        v = list(struct.unpack_from(f"{endian}{n}d", buf, pos))
        pos += 8 * n
        return v

    def geom() -> dict:
        endian = "<" if u8() == 1 else ">"
        code = u32(endian)
        srid = None
        if code & EWKB_SRID_FLAG:
            code &= ~EWKB_SRID_FLAG
            srid = u32(endian)

        def ring() -> list[Coord]:
            n = u32(endian)
            flat = dbl(endian, 2 * n)
            return list(zip(flat[0::2], flat[1::2]))

        if code == WKB_POINT:
            xy = dbl(endian, 2)
            return {"type": "Point", "srid": srid, "coords": (xy[0], xy[1])}
        if code == WKB_LINESTRING:
            return {"type": "LineString", "srid": srid, "coords": ring()}
        if code == WKB_POLYGON:
            n = u32(endian)
            return {"type": "Polygon", "srid": srid, "coords": [ring() for _ in range(n)]}
        if code == WKB_MULTIPOLYGON:
            n = u32(endian)
            polys = []
            for _ in range(n):
                sub = geom()
                polys.append(sub["coords"])
            return {"type": "MultiPolygon", "srid": srid, "coords": polys}
        if code == WKB_MULTILINESTRING:
            n = u32(endian)
            return {
                "type": "MultiLineString",
                "srid": srid,
                "coords": [geom()["coords"] for _ in range(n)],
            }
        raise ValueError(f"unsupported wkb geometry type {code}")

    return geom()
