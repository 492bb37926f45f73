"""Geometry kernel unit tests — vectors ported from
/root/reference/geom/{multipolygon_test.go,ring_test.go,geom_test.go}.
Pure Python (no Spark session)."""

import itertools

import pytest

from imposm3_spark.geom import py_geom as pg

SQUARE_10 = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
SQUARE_2_8 = [(2, 2), (8, 2), (8, 8), (2, 8), (2, 2)]


def build(member_ways, max_gap=0.1):
    rings = pg.build_rings(member_ways, max_gap)
    expanded = []
    for r in rings:
        subs = pg.make_valid_rings(r.coords)
        if len(subs) == 1 and subs[0].coords == r.coords:
            expanded.append(r)
        else:
            for s in subs:
                expanded.append(pg.Ring(list(r.way_ids), [], s.coords))
    for r in expanded:
        r.area = pg.ring_area(r.coords)
    expanded.sort(key=lambda r: -r.area)
    polygons, outer = pg.build_multipolygon(expanded)
    return polygons, pg.multipolygon_area(polygons), outer


def refs_for(coords):
    # synthetic node ids per distinct coordinate
    ids = {}
    out = []
    for c in coords:
        if c not in ids:
            ids[c] = len(ids) + 1
        out.append(ids[c])
    return out


def test_simple_polygon_with_hole():
    # multipolygon_test.go:37-78
    polys, area, _ = build(
        [(1, [1, 2, 3, 4, 1], SQUARE_10), (2, [5, 6, 7, 8, 5], SQUARE_2_8)]
    )
    assert area == 100 - 36
    assert len(polys) == 1 and len(polys[0]) == 2


def test_multipolygon_with_multiple_holes():
    # multipolygon_test.go:127-180
    w2 = [(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]
    w3 = [(3, 3), (4, 3), (4, 4), (3, 4), (3, 3)]
    polys, area, _ = build(
        [
            (1, [1, 2, 3, 4, 1], SQUARE_10),
            (2, [11, 12, 13, 14, 11], w2),
            (3, [21, 22, 23, 24, 21], w3),
        ]
    )
    assert area == 100 - 1 - 1


def test_multipolygon_with_nested_holes():
    # multipolygon_test.go:181-249
    rings = [
        SQUARE_10,
        [(1, 1), (9, 1), (9, 9), (1, 9), (1, 1)],
        [(2, 2), (8, 2), (8, 8), (2, 8), (2, 2)],
        [(3, 3), (7, 3), (7, 7), (3, 7), (3, 3)],
        [(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)],
    ]
    member_ways = [
        (i + 1, [i * 10 + j for j in (1, 2, 3, 4, 1)], r) for i, r in enumerate(rings)
    ]
    polys, area, _ = build(member_ways)
    assert area == 100 - 64 + 36 - 16 + 4


def test_polygon_from_three_ways():
    # multipolygon_test.go:250-294: open ways stitched into one ring
    w1 = [(0, 0), (10, 0), (10, 10)]
    w2 = [(10, 10), (0, 10)]
    w3 = [(0, 10), (0, 0)]
    polys, area, _ = build(
        [(1, [1, 2, 3], w1), (2, [3, 4], w2), (3, [4, 1], w3)]
    )
    assert area == 100


def test_touching_polygons_with_hole():
    # multipolygon_test.go:295-347
    w2 = [(10, 0), (30, 0), (30, 10), (10, 10), (10, 0)]
    polys, area, outer = build(
        [
            (1, [1, 2, 3, 4, 1], SQUARE_10),
            (2, [2, 5, 6, 3, 2], w2),
            (3, [7, 8, 9, 10, 7], SQUARE_2_8),
        ]
    )
    assert area == 100 + 200 - 36
    assert outer == {1, 2}


def test_broken_polygon_self_intersect():
    # multipolygon_test.go:428-518: two squares joined by zero-width channel
    w1 = [(0, 0), (0, 10), (10, 10), (10, 0), (20, 0), (20, 10), (30, 10), (30, 0), (0, 0)]
    polys, area, _ = build(
        [(1, [1, 2, 3, 4, 5, 6, 7, 8, 1], w1), (2, [15, 16, 17, 18, 15], SQUARE_2_8)]
    )
    assert abs(area - (200 - 36)) < 1e-6

    # same shape, traversal starting mid-channel
    w3 = [(10, 0), (0, 0), (0, 10), (10, 10), (10, 0), (20, 0), (20, 10), (30, 10), (30, 0), (10, 0)]
    polys, area, _ = build(
        [(1, [4, 1, 2, 3, 4, 5, 6, 7, 8, 4], w3), (2, [15, 16, 17, 18, 15], SQUARE_2_8)]
    )
    assert abs(area - (200 - 36)) < 1e-6


def test_broken_polygon_self_intersect_triangle():
    # multipolygon_test.go:519-601: triangle with tiny bowtie tip
    w1 = [(0, 0), (0, 100), (100, 50 - 0.00001), (100, 50 + 0.00001), (0, 0)]
    w2 = [(10, 45), (10, 55), (20, 55), (20, 45), (10, 45)]
    polys, area, _ = build(
        [(1, [1, 2, 3, 4, 1], w1), (2, [15, 16, 17, 18, 15], w2)]
    )
    assert abs(area - (100 * 100 / 2 - 100)) < 0.01

    w3 = [(0, 0), (0, 100), (100, 50 - 1), (100, 50 + 1), (0, 0)]
    polys, area, _ = build(
        [(1, [1, 2, 3, 4, 1], w3), (2, [15, 16, 17, 18, 15], w2)]
    )
    assert abs(area - (100 * 98 / 2 - 100)) < 10


def test_open_ring_raises():
    # multipolygon_test.go:603-621
    w1 = [(0, 0), (10, 0), (10, 10), (0, 10)]
    with pytest.raises(pg.NoRingError):
        pg.build_rings([(1, [1, 2, 3, 4], w1)], 0.1)


def test_closed_and_open_ring():
    # multipolygon_test.go:623-660: open stub excluded, square survives
    w2 = [(0, 0), (-5, -2)]
    rings = pg.build_rings(
        [(1, [1, 2, 3, 4, 1], SQUARE_10), (2, [1, 6], w2)], 0.1
    )
    assert len(rings) == 1
    assert pg.ring_area(rings[0].coords) == 100


def test_ring_merge():
    # ring_test.go:10-43
    r1 = pg.Ring([1], [1, 2, 3], [(0, 0)] * 3)
    r2 = pg.Ring([2], [3, 4, 1], [(0, 0)] * 3)
    result = pg.merge_rings([r1, r2])
    assert len(result) == 1
    assert result[0].refs == [1, 2, 3, 4, 1]


def test_ring_merge_missing_refs():
    # ring_test.go:45-71
    r1 = pg.Ring([1], [1, 2, 3], [(0, 0)] * 3)
    r2 = pg.Ring([2], [], [])
    result = pg.merge_rings([r1, r2])
    assert len(result) == 1
    assert result[0] is r1


def test_ring_merge_reverse_endpoints():
    # ring_test.go:73-118
    r1 = pg.Ring([1], [1, 2, 3, 4], [(0, 0)] * 4)
    r2 = pg.Ring([2], [6, 5, 4], [(0, 0)] * 3)
    r3 = pg.Ring([3], [1, 7, 6], [(0, 0)] * 3)
    result = pg.merge_rings([r1, r2, r3])
    assert len(result) == 1
    assert result[0].refs == [6, 5, 4, 3, 2, 1, 7, 6]


def test_ring_merge_permutations():
    # ring_test.go:120-186: all orders and directions of 4 segments close
    segs = [
        [1, 2, 3, 4],
        [4, 5, 6, 7],
        [7, 8, 9, 10],
        [10, 11, 12, 1],
    ]
    for flips in range(16):
        oriented = [
            list(reversed(s)) if flips & (1 << i) else list(s) for i, s in enumerate(segs)
        ]
        for perm in itertools.permutations(range(4)):
            rings = [
                pg.Ring([i + 1], list(oriented[p]), [(0, 0)] * len(oriented[p]))
                for i, p in enumerate(perm)
            ]
            result = pg.merge_rings(rings)
            assert len(result) == 1, (flips, perm, [r.refs for r in result])
            assert result[0].is_closed(), (flips, perm, result[0].refs)
            assert len(result[0].refs) == 13


def test_unduplicate_nodes():
    # geom_test.go:147-199 (lat/long order flipped to (x, y))
    assert len(pg.unduplicate([(0, 0)])) == 1
    assert len(pg.unduplicate([(80.0, 47.0), (80.0, 47.0)])) == 1
    assert len(pg.unduplicate([(-10, 0)] * 3 + [(10, 10)] * 3)) == 2
    assert (
        len(pg.unduplicate([(10, 10), (10, 0), (10, 10), (10, 10), (10, 0), (10, 0)])) == 4
    )
    assert len(pg.unduplicate([(0, 0), (-10, 0), (-10, 10), (0, 10), (0, 0)])) == 5


def test_simplify_dp():
    line = [(0, 0), (1, 0.01), (2, 0), (3, 5), (4, 0)]
    out = pg.simplify_dp(line, 0.1)
    assert out == [(0, 0), (2, 0), (3, 5), (4, 0)]
    # ring guard: collapse would drop below 4 points -> original kept
    ring = [(0, 0), (5, 0.001), (10, 0), (5, 0.002), (0, 0)]
    assert pg.simplify_ring(ring, 1.0) == ring
