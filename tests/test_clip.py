"""Limit-to clipping + GeoJSON source tests.

Point/line vectors ported from geom/limit/limit_test.go:264-304 (TestClipper
with geom/limit/clipping.geojson, mercator). Polygon-cut output is a
documented divergence (kept whole), so only the keep/drop decision is
asserted for polygons."""

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


def test_polygon_keep_drop():
    # limit_test.go:293-303: intersecting polygon is kept (we keep it whole)
    lim = make_limiter()
    ring = [
        (1106543, 7082055),
        (1107105.2, 7087540.0),
        (1112184.9, 7084424.5),
        (1106543, 7082055),
    ]
    assert lim.clip_polygon([ring]) == [[ring]]
    far = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    assert lim.clip_polygon([far]) == []


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


def test_wgs84_no_transform():
    feats = load_geojson(CLIPPING)
    lim = Limiter(feats)
    # 9.94,53.53 is inside the Hamburg-ish clip region in WGS84
    # (limit_test.go:306-320 uses these lon/lat probes)
    assert lim.intersects_point(9.94, 53.53)
    assert not lim.intersects_point(9.04, 53.53)
