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
