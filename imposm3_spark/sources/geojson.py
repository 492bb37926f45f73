"""GeoJSON source (SURVEY §2.1 S6).

Parity target: /root/reference/geom/geojson/geojson.go:1-171 — parses
Feature/FeatureCollection/Polygon/MultiPolygon (the reference only supports
polygonal features, used for -limitto clipping and geojson_intersects
columns). Coordinates are WGS84; `transform=3857` projects to mercator like
the reference does when the import runs in webmercator.

The parsed features are small (clip boundaries) — they live on the driver
and are broadcast into expressions/UDFs, the Spark analog of the
reference's prepared-geometry STRtree (geom/geos/index.go:32-77).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

from imposm3_spark.geom import py_geom
from imposm3_spark.geom.proj import py_wgs_to_merc

Coord = tuple[float, float]


@dataclass
class Feature:
    polygons: list[list[list[Coord]]]  # [ [shell, hole...], ... ]
    properties: dict = field(default_factory=dict)
    _bboxes: list[tuple[float, float, float, float]] = field(default_factory=list)

    def __post_init__(self):
        self._bboxes = [py_geom.bbox(p[0]) for p in self.polygons if p]

    def contains_point(self, x: float, y: float) -> bool:
        """Point-in-feature (boundary counts as inside, like GEOS
        intersects)."""
        for (minx, miny, maxx, maxy), rings in zip(self._bboxes, self.polygons):
            if not (minx <= x <= maxx and miny <= y <= maxy):
                continue
            if py_geom.point_in_ring((x, y), rings[0]) >= 0:
                inside_hole = any(
                    py_geom.point_in_ring((x, y), hole) == 1 for hole in rings[1:]
                )
                if not inside_hole:
                    return True
        return False

    def bbox(self) -> tuple[float, float, float, float]:
        return (
            min(b[0] for b in self._bboxes),
            min(b[1] for b in self._bboxes),
            max(b[2] for b in self._bboxes),
            max(b[3] for b in self._bboxes),
        )


def _close(ring: list[Coord]) -> list[Coord]:
    if ring and ring[0] != ring[-1]:
        return ring + [ring[0]]
    return ring


def _polygons_of_geometry(geom: dict) -> list[list[list[Coord]]]:
    gtype = geom.get("type")
    coords = geom.get("coordinates", [])
    if gtype == "Polygon":
        return [[_close([tuple(c[:2]) for c in ring]) for ring in coords]]
    if gtype == "MultiPolygon":
        return [
            [_close([tuple(c[:2]) for c in ring]) for ring in poly] for poly in coords
        ]
    if gtype == "GeometryCollection":
        out = []
        for g in geom.get("geometries", []):
            out.extend(_polygons_of_geometry(g))
        return out
    raise ValueError(f"unsupported GeoJSON geometry {gtype!r} (polygons only)")


def _project_feature(f: Feature) -> Feature:
    return Feature(
        polygons=[
            [[py_wgs_to_merc(x, y) for x, y in ring] for ring in poly]
            for poly in f.polygons
        ],
        properties=f.properties,
    )


def load_geojson(path: str | Path, transform: int | None = None) -> list[Feature]:
    """Parse the features of a GeoJSON file (geojson.go ParseGeoJSON).
    transform=3857 projects coordinates to spherical mercator."""
    raw = json.loads(Path(path).read_text())
    feats: list[Feature] = []

    def add(geom: dict, props: dict) -> None:
        feats.append(Feature(polygons=_polygons_of_geometry(geom), properties=props or {}))

    t = raw.get("type")
    if t == "FeatureCollection":
        for f in raw.get("features", []):
            add(f["geometry"], f.get("properties") or {})
    elif t == "Feature":
        add(raw["geometry"], raw.get("properties") or {})
    else:
        add(raw, {})
    if transform == 3857:
        feats = [_project_feature(f) for f in feats]
    elif transform not in (None, 4326):
        raise ValueError("only EPSG:4326 and EPSG:3857 are supported")
    return feats
