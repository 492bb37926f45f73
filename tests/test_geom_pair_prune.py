"""Property tests for _overlapping_segment_pairs (round-7 bbox sweep).

The prune must be CONSERVATIVE: every truly-intersecting non-adjacent
segment pair survives, so ring_is_simple and _insert_intersections stay
bit-identical to the exhaustive O(n^2) scan they replaced."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from imposm3_spark.geom.py_geom import (
    _insert_intersections,
    _overlapping_segment_pairs,
    _seg_intersection,
    ring_is_simple,
)


def _close(coords):
    return coords + [coords[0]] if coords[0] != coords[-1] else coords


def _brute_pairs(coords):
    n = len(coords) - 1
    out = []
    for i in range(n):
        for j in range(i + 1, n):
            if j == i + 1 or (i == 0 and j == n - 1):
                continue
            out.append((i, j))
    return out


def _brute_is_simple(coords):
    n = len(coords) - 1
    if n < 3:
        return True
    seen = set()
    for pt in coords[:-1]:
        if pt in seen:
            return False
        seen.add(pt)
    for i, j in _brute_pairs(coords):
        if _seg_intersection(coords[i], coords[i + 1], coords[j], coords[j + 1]):
            return False
    return True


def _brute_insert(coords):
    n = len(coords) - 1
    extra = {i: [] for i in range(n)}
    for i, j in _brute_pairs(coords):
        pt = _seg_intersection(coords[i], coords[i + 1], coords[j], coords[j + 1])
        if pt is None:
            continue

        def param(a, b, p):
            dx, dy = b[0] - a[0], b[1] - a[1]
            return ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / (dx * dx + dy * dy)

        extra[i].append((param(coords[i], coords[i + 1], pt), pt))
        extra[j].append((param(coords[j], coords[j + 1], pt), pt))
    out = []
    for i in range(n):
        out.append(coords[i])
        for _t, pt in sorted(extra[i], key=lambda e: e[0]):
            if pt != out[-1]:
                out.append(pt)
    out.append(coords[-1])
    return out


# small integer-ish grid coordinates maximize collinear/touching/crossing
# degeneracies, the cases a sloppy prune would get wrong
coord = st.tuples(
    st.integers(-6, 6).map(float), st.integers(-6, 6).map(float)
)


@st.composite
def rings(draw):
    # max_size crosses the n=24 scalar/numpy branch boundary of
    # _overlapping_segment_pairs so both code paths stay property-tested
    pts = draw(st.lists(coord, min_size=3, max_size=40, unique=True))
    return _close(list(pts))


@settings(max_examples=300, deadline=None)
@given(rings())
def test_prune_is_superset_of_intersecting_pairs(ring):
    kept = set(_overlapping_segment_pairs(ring))
    for i, j in _brute_pairs(ring):
        if _seg_intersection(ring[i], ring[i + 1], ring[j], ring[j + 1]):
            assert (i, j) in kept, (ring, i, j)


@settings(max_examples=300, deadline=None)
@given(rings())
def test_ring_is_simple_matches_bruteforce(ring):
    assert ring_is_simple(ring) == _brute_is_simple(ring)


@settings(max_examples=300, deadline=None)
@given(rings())
def test_insert_intersections_bit_identical(ring):
    assert _insert_intersections(list(ring)) == _brute_insert(list(ring))


def _bbox_overlap_pairs(ring):
    """Reference semantics for BOTH branches: every non-adjacent pair
    whose segment bboxes overlap (exact float compares), ascending."""
    out = []
    for i, j in _brute_pairs(ring):
        (x1, y1), (x2, y2) = ring[i], ring[i + 1]
        (x3, y3), (x4, y4) = ring[j], ring[j + 1]
        if (
            min(x3, x4) <= max(x1, x2)
            and max(x3, x4) >= min(x1, x2)
            and min(y3, y4) <= max(y1, y2)
            and max(y3, y4) >= min(y1, y2)
        ):
            out.append((i, j))
    return out


@settings(max_examples=300, deadline=None)
@given(rings())
def test_scalar_and_numpy_branches_emit_identical_pair_lists(ring):
    # the scalar (n<=24) and numpy-sweep (n>24) branches must produce the
    # exact same ascending bbox-overlap pair list — pin both to the
    # reference semantics regardless of which branch the size selects
    assert _overlapping_segment_pairs(ring) == _bbox_overlap_pairs(ring)
