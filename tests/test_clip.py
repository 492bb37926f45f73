"""Limit-to clipping + GeoJSON source tests.

Point/line/polygon vectors ported from geom/limit/limit_test.go:264-304
(TestClipper with geom/limit/clipping.geojson, mercator)."""

import pytest

from imposm3_spark.geom import poly_clip, py_geom
from imposm3_spark.geom.clip import Limiter, intersects_feature_property
from imposm3_spark.sources.geojson import load_geojson

CLIPPING = "/root/reference/geom/limit/clipping.geojson"


def make_limiter():
    return Limiter(load_geojson(CLIPPING, transform=3857))


def test_point_outside():
    # limit_test.go:272-275: POINT(0 0) -> dropped
    lim = make_limiter()
    assert not lim.intersects_point(0, 0)


def test_point_inside():
    # limit_test.go:277-283: POINT(1106543 7082055) -> kept
    lim = make_limiter()
    assert lim.intersects_point(1106543, 7082055)


def test_line_clipped_into_two_parts():
    # limit_test.go:285-291: the line crosses out of the region and back
    lim = make_limiter()
    parts = lim.clip_line([(1106543, 7082055), (1107105.2, 7087540.0)])
    assert len(parts) == 2
    # pieces are strictly inside
    for part in parts:
        for k in range(len(part) - 1):
            mid = ((part[k][0] + part[k + 1][0]) / 2, (part[k][1] + part[k + 1][1]) / 2)
            assert lim.intersects_point(*mid)


def test_polygon_cut():
    # limit_test.go:293-303: a boundary-crossing polygon is CUT — one
    # result polygon with strictly smaller area
    lim = make_limiter()
    ring = [
        (1106543, 7082055),
        (1107105.2, 7087540.0),
        (1112184.9, 7084424.5),
        (1106543, 7082055),
    ]
    out = lim.clip_polygon([ring])
    assert len(out) == 1
    area = py_geom.multipolygon_area(out)
    assert 0 < area < py_geom.ring_area(ring)
    far = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    assert lim.clip_polygon([far]) == []


def _sq(x0, y0, x1, y1):
    return [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]


def test_polygon_intersection_kernel():
    pi, area = poly_clip.polygon_intersection, py_geom.multipolygon_area
    # overlapping squares
    r = pi([_sq(0, 0, 10, 10)], [_sq(5, 5, 15, 15)])
    assert len(r) == 1 and abs(area(r) - 25) < 1e-9
    # containment both ways (fast-path-free kernel)
    assert abs(area(pi([_sq(2, 2, 4, 4)], [_sq(0, 0, 10, 10)])) - 4) < 1e-9
    assert abs(area(pi([_sq(0, 0, 10, 10)], [_sq(2, 2, 4, 4)])) - 4) < 1e-9
    # identical + disjoint
    assert abs(area(pi([_sq(0, 0, 10, 10)], [_sq(0, 0, 10, 10)])) - 100) < 1e-9
    assert pi([_sq(0, 0, 1, 1)], [_sq(5, 5, 6, 6)]) == []
    # subject donut clipped by right half -> half donut
    donut = [_sq(0, 0, 10, 10), _sq(3, 3, 7, 7)]
    assert abs(area(pi(donut, [_sq(5, 0, 10, 10)])) - 42) < 1e-9
    # concave U clipped by a top bar -> two parts
    u = [(0, 0), (10, 0), (10, 10), (7, 10), (7, 3), (3, 3), (3, 10), (0, 10), (0, 0)]
    r = pi([u], [_sq(0, 8, 10, 12)])
    assert len(r) == 2 and abs(area(r) - 12) < 1e-9
    # clip hole punches the subject -> donut result
    r = pi([_sq(0, 0, 10, 10)], [_sq(-1, -1, 11, 11), _sq(4, 4, 6, 6)])
    assert abs(area(r) - 96) < 1e-9 and len(r[0]) == 2
    # edge-touch only -> empty
    assert area(pi([_sq(0, 0, 5, 5)], [_sq(5, 0, 10, 5)])) < 1e-9


def test_contained_polygon_passes_unchanged():
    lim = make_limiter()
    # a tiny square around an interior point passes through identically
    inner = _sq(1106500, 7082000, 1106600, 7082100)
    assert lim.clip_polygon([inner]) == [[inner]]


def test_geojson_properties_and_intersects_feature():
    feats = load_geojson(CLIPPING, transform=3857)
    assert feats, "clipping.geojson parsed no features"
    # every feature's own first vertex is inside-or-boundary of itself
    f = feats[0]
    x, y = f.polygons[0][0][0]
    inner_x = sum(p[0] for p in f.polygons[0][0][:-1]) / (len(f.polygons[0][0]) - 1)
    inner_y = sum(p[1] for p in f.polygons[0][0][:-1]) / (len(f.polygons[0][0]) - 1)
    # intersects_feature_property returns '' or the property value when hit
    res = intersects_feature_property(feats, "name", inner_x, inner_y)
    assert res is None or isinstance(res, str)


def test_intersects_buffer():
    # limit_test.go:306-320 TestClipperWithBuffer: buffer 0.1 deg in WGS84
    feats = load_geojson(CLIPPING)
    lim = Limiter(feats, buffer=0.1)
    assert lim.intersects_point(9.94, 53.53)
    assert not lim.intersects_point(9.04, 53.53)
    # a point just outside the exact region but inside the buffer ring
    exact = Limiter(feats)
    assert not exact.intersects_point(9.89, 53.53)
    assert lim.intersects_point(9.89, 53.53)


def test_wgs84_no_transform():
    feats = load_geojson(CLIPPING)
    lim = Limiter(feats)
    # 9.94,53.53 is inside the Hamburg-ish clip region in WGS84
    # (limit_test.go:306-320 uses these lon/lat probes)
    assert lim.intersects_point(9.94, 53.53)
    assert not lim.intersects_point(9.04, 53.53)


def _usq(x0, y0, x1, y1):
    return [[(float(x0), float(y0)), (float(x1), float(y0)), (float(x1), float(y1)),
             (float(x0), float(y1)), (float(x0), float(y0))]]


def _uarea(polys):
    from imposm3_spark.geom import py_geom
    return sum(
        py_geom.ring_area(p[0]) - sum(py_geom.ring_area(h) for h in p[1:])
        for p in polys
    )


class TestPolygonUnion:
    # GEOS Union analog (G8, geom/geos/ops.go:53-77)

    def test_overlap_disjoint_contain_touch(self):
        from imposm3_spark.geom.poly_clip import polygon_union
        u = polygon_union(_usq(0, 0, 2, 2), _usq(1, 1, 3, 3))
        assert len(u) == 1 and _uarea(u) == pytest.approx(7.0)
        u = polygon_union(_usq(0, 0, 1, 1), _usq(5, 5, 6, 6))
        assert len(u) == 2 and _uarea(u) == pytest.approx(2.0)
        u = polygon_union(_usq(0, 0, 4, 4), _usq(1, 1, 2, 2))
        assert len(u) == 1 and _uarea(u) == pytest.approx(16.0)
        u = polygon_union(_usq(0, 0, 1, 1), _usq(1, 0, 2, 1))
        assert len(u) == 1 and _uarea(u) == pytest.approx(2.0)

    def test_hole_filling(self):
        from imposm3_spark.geom.poly_clip import polygon_union
        subj = [
            [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)],
            [(1.0, 1.0), (1.0, 3.0), (3.0, 3.0), (3.0, 1.0), (1.0, 1.0)],
        ]
        u = polygon_union(subj, _usq(1, 1, 3, 3))
        assert len(u) == 1 and _uarea(u) == pytest.approx(16.0)
        u = polygon_union(subj, _usq(1, 1, 2, 3))  # partial fill
        assert len(u) == 1 and _uarea(u) == pytest.approx(14.0)
        assert len(u[0]) == 2  # remaining hole

    def test_union_all_chains(self):
        from imposm3_spark.geom.poly_clip import union_all
        u = union_all([_usq(0, 0, 2, 2), _usq(1, 1, 3, 3), _usq(2, 2, 4, 4), _usq(10, 10, 11, 11)])
        assert len(u) == 2 and _uarea(u) == pytest.approx(11.0)


def test_overlapping_clip_features_no_double_count():
    """Two overlapping square features; clipping a polygon spanning both
    must yield the overlap once (union semantics, not concatenation)."""
    from imposm3_spark.sources.geojson import Feature
    f1 = Feature(polygons=[_usq(0, 0, 2, 2)], properties={})
    f2 = Feature(polygons=[_usq(1, 0, 3, 2)], properties={})
    lim = Limiter([f1, f2])
    # subject covers (0..3)x(0..2) entirely -> clip result area must be 6
    subject = _usq(-1, -1, 4, 3)[0]
    out = lim.clip_polygon([subject])
    assert _uarea(out) == pytest.approx(6.0)
