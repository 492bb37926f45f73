"""Property-based tests (hypothesis) for the pure-python geometry kernel.

The reference pins behavior with hand-written vectors
(geom/ring_test.go, geom/multipolygon_test.go); these properties pin the
invariants those vectors sample:

- ring merge is permutation/orientation invariant (a ring split into
  arbitrary consecutive segments, shuffled and reversed, reassembles to
  the same ring)
- Douglas-Peucker keeps endpoints and never deviates more than tolerance
- signed area is rotation-invariant and negates under reversal
- mercator projection round-trips
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from imposm3_spark.geom.proj import py_merc_to_wgs, py_wgs_to_merc
from imposm3_spark.geom.py_geom import (
    _point_seg_dist,
    build_rings,
    line_length,
    point_in_ring,
    ring_area,
    ring_signed_area,
    simplify_dp,
    unduplicate,
)


# -- strategies -------------------------------------------------------------

def _regular_ringish(n, r, jitter, phase):
    """A simple (non-self-intersecting) closed ring: jittered star-convex
    polygon around the origin. Guaranteed simple because radii stay
    positive and angles are strictly increasing."""
    coords = []
    for i in range(n):
        ang = phase + 2 * math.pi * i / n
        rad = r * (1.0 + jitter[i % len(jitter)])
        coords.append((rad * math.cos(ang), rad * math.sin(ang)))
    coords.append(coords[0])
    return coords


ring_strategy = st.builds(
    _regular_ringish,
    st.integers(min_value=4, max_value=24),
    st.floats(min_value=0.5, max_value=100.0, allow_nan=False),
    st.lists(st.floats(min_value=-0.4, max_value=0.4), min_size=1, max_size=7),
    st.floats(min_value=0.0, max_value=2 * math.pi),
)


# -- ring merge -------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(
    ring=ring_strategy,
    cuts=st.lists(st.integers(min_value=1, max_value=1000), min_size=0, max_size=5),
    flips=st.lists(st.booleans(), min_size=6, max_size=6),
    rot=st.integers(min_value=0, max_value=1000),
)
def test_split_shuffle_reverse_reassembles(ring, cuts, flips, rot):
    n = len(ring) - 1  # distinct vertices
    refs = list(range(1, n + 1)) + [1]
    # split the closed ring at sorted distinct cut positions
    pos = sorted({c % n for c in cuts} | {0})
    segments = []
    for i, start in enumerate(pos):
        end = pos[i + 1] if i + 1 < len(pos) else n
        seg_refs = refs[start : end + 1]
        seg_coords = ring[start : end + 1]
        if len(seg_refs) < 2:
            continue
        segments.append((start + 1, seg_refs, seg_coords))
    # reverse some segments, rotate the order
    prepared = []
    for i, (wid, r_, c_) in enumerate(segments):
        if flips[i % len(flips)]:
            prepared.append((wid, r_[::-1], c_[::-1]))
        else:
            prepared.append((wid, r_, c_))
    k = rot % len(prepared)
    prepared = prepared[k:] + prepared[:k]

    rings = build_rings(prepared, max_ring_gap=1e-9)
    assert len(rings) == 1
    got = rings[0]
    assert got.is_closed()
    # same vertex set and same enclosed area as the original ring
    assert {tuple(c) for c in got.coords} == {tuple(c) for c in ring}
    assert math.isclose(got.area, ring_area(ring), rel_tol=1e-9)


# -- simplify ---------------------------------------------------------------

@settings(max_examples=80, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
            st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
        ),
        min_size=2,
        max_size=40,
    ),
    tol=st.floats(min_value=1e-6, max_value=100.0, allow_nan=False),
)
def test_simplify_dp_endpoints_and_tolerance(pts, tol):
    out = simplify_dp(pts, tol)
    assert out[0] == pts[0] and out[-1] == pts[-1]
    assert len(out) <= len(pts)
    # every dropped point lies within tol of the simplified polyline
    for p in pts:
        d = min(
            _point_seg_dist(p, out[i], out[i + 1]) for i in range(len(out) - 1)
        ) if len(out) > 1 else math.hypot(p[0] - out[0][0], p[1] - out[0][1])
        assert d <= tol + 1e-9


# -- area -------------------------------------------------------------------

@settings(max_examples=80, deadline=None)
@given(ring=ring_strategy, rot=st.integers(min_value=0, max_value=1000))
def test_signed_area_rotation_and_reversal(ring, rot):
    open_ring = ring[:-1]
    k = rot % len(open_ring)
    rotated = open_ring[k:] + open_ring[:k]
    rotated.append(rotated[0])
    a0 = ring_signed_area(ring)
    assert math.isclose(ring_signed_area(rotated), a0, rel_tol=1e-9, abs_tol=1e-9)
    assert math.isclose(ring_signed_area(ring[::-1]), -a0, rel_tol=1e-9, abs_tol=1e-9)


@settings(max_examples=60, deadline=None)
@given(ring=ring_strategy)
def test_interior_point_inside(ring):
    # centroid of a star-convex-around-origin ring is inside
    assert point_in_ring((0.0, 0.0), ring) != 0


# -- unduplicate ------------------------------------------------------------

@settings(max_examples=80, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(-5, 5), st.integers(-5, 5)), min_size=1, max_size=30
    ),
    dups=st.lists(st.integers(min_value=0, max_value=29), max_size=10),
)
def test_unduplicate_idempotent_and_consecutive_free(pts, dups):
    coords = [(float(x), float(y)) for x, y in pts]
    for d in dups:
        if d < len(coords):
            coords.insert(d, coords[d])
    out = unduplicate(coords)
    assert unduplicate(out) == out
    for a, b in zip(out, out[1:]):
        assert a != b
    assert line_length(out) == line_length(coords)


# -- projection -------------------------------------------------------------

@settings(max_examples=100, deadline=None)
@given(
    lon=st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
    lat=st.floats(min_value=-85.0, max_value=85.0, allow_nan=False),
)
def test_mercator_roundtrip(lon, lat):
    x, y = py_wgs_to_merc(lon, lat)
    lon2, lat2 = py_merc_to_wgs(x, y)
    assert math.isclose(lon2, lon, abs_tol=1e-9)
    assert math.isclose(lat2, lat, abs_tol=1e-9)
