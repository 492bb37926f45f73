"""Pure-Python planar geometry kernel (no GEOS).

Backs the multipolygon-assembly pandas UDF and the unit tests. Semantics
ported from /root/reference/geom/{geom.go,ring.go,multipolygon.go} — the
single hardest correctness piece of the reference (661-line test file
geom/multipolygon_test.go).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Sequence

Coord = tuple[float, float]

NODE_EQ_EPS = 1e-9  # geom/geom.go:46-53


def coords_equal(a: Coord, b: Coord) -> bool:
    return abs(a[0] - b[0]) < NODE_EQ_EPS and abs(a[1] - b[1]) < NODE_EQ_EPS


def unduplicate(coords: list[Coord]) -> list[Coord]:
    """Drop consecutive (near-)duplicate nodes — geom/geom.go:55-79.

    Compares each node to its ORIGINAL predecessor (not the last kept one),
    exactly like the reference loop."""
    if len(coords) < 2:
        return coords
    out = [coords[0]]
    for i in range(1, len(coords)):
        if coords_equal(coords[i - 1], coords[i]):
            continue
        out.append(coords[i])
    return out


def ring_signed_area(coords: Sequence[Coord]) -> float:
    """Shoelace; positive for counter-clockwise rings."""
    s = 0.0
    n = len(coords)
    for i in range(n - 1):
        x1, y1 = coords[i]
        x2, y2 = coords[i + 1]
        s += x1 * y2 - x2 * y1
    # close implicitly if not closed
    if n > 1 and coords[0] != coords[-1]:
        x1, y1 = coords[-1]
        x2, y2 = coords[0]
        s += x1 * y2 - x2 * y1
    return s / 2.0


def ring_area(coords: Sequence[Coord]) -> float:
    return abs(ring_signed_area(coords))


def line_length(coords: Sequence[Coord]) -> float:
    return sum(
        math.hypot(coords[i + 1][0] - coords[i][0], coords[i + 1][1] - coords[i][1])
        for i in range(len(coords) - 1)
    )


def bbox(coords: Sequence[Coord]) -> tuple[float, float, float, float]:
    xs = [c[0] for c in coords]
    ys = [c[1] for c in coords]
    return min(xs), min(ys), max(xs), max(ys)


def point_in_ring(pt: Coord, ring: Sequence[Coord]) -> int:
    """Ray casting. Returns 1 strictly inside, 0 on boundary, -1 outside.

    An OPEN ring (first != last) is treated as implicitly closed — the
    closing edge last->first is tested like any other. Pipeline rings are
    always closed (ring merge guarantees it), so this only matters for raw
    caller input; grid_join's vectorized kernel applies the identical
    implicit close, keeping the two kernels bit-identical on all inputs."""
    x, y = pt
    n = len(ring)
    inside = False
    if n < 2:
        return -1  # no edges: nothing is inside/on a degenerate ring
    closed = ring[0] == ring[n - 1]
    edges = n - 1 if closed else n
    for i in range(edges):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        # boundary check: point on segment?
        if _on_segment(x, y, x1, y1, x2, y2):
            return 0
        if (y1 > y) != (y2 > y):
            xint = (x2 - x1) * (y - y1) / (y2 - y1) + x1
            if x < xint:
                inside = not inside
    return 1 if inside else -1


def _on_segment(px: float, py: float, x1: float, y1: float, x2: float, y2: float) -> bool:
    cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
    if abs(cross) > 1e-12:
        return False
    if min(x1, x2) - 1e-12 <= px <= max(x1, x2) + 1e-12 and (
        min(y1, y2) - 1e-12 <= py <= max(y1, y2) + 1e-12
    ):
        return True
    return False


def ring_contains_ring(outer: Sequence[Coord], inner: Sequence[Coord]) -> bool:
    """Approximation of GEOS PreparedContains(polygon(outer), polygon(inner)).

    True when no vertex of `inner` lies strictly outside `outer` and at
    least one lies strictly inside. Handles the reference's touching-ring
    cases (shared edges/vertices stay 'contained' as long as some interior
    vertex is inside; a ring sharing only boundary is NOT contained, which
    matches GEOS contains requiring interior intersection)."""
    # bbox fast path
    ominx, ominy, omaxx, omaxy = bbox(outer)
    iminx, iminy, imaxx, imaxy = bbox(inner)
    if iminx < ominx - 1e-12 or iminy < ominy - 1e-12 or imaxx > omaxx + 1e-12 or imaxy > omaxy + 1e-12:
        return False
    any_inside = False
    for pt in inner[:-1] if len(inner) > 1 and inner[0] == inner[-1] else inner:
        side = point_in_ring(pt, outer)
        if side == -1:
            return False
        if side == 1:
            any_inside = True
    if any_inside:
        return True
    # all vertices on the boundary: test the inner ring's centroid
    cx = sum(p[0] for p in inner) / len(inner)
    cy = sum(p[1] for p in inner) / len(inner)
    return point_in_ring((cx, cy), outer) == 1


# ---------------------------------------------------------------------------
# ring merge + multipolygon build (geom/ring.go, geom/multipolygon.go)
# ---------------------------------------------------------------------------


@dataclass
class Ring:
    way_ids: list[int]
    refs: list[int]
    coords: list[Coord]
    holes: list["Ring"] = field(default_factory=list)
    contained_by: int = -1
    area: float = 0.0
    outer: bool = False

    def is_closed(self) -> bool:
        # ring.go:22-24
        return len(self.refs) >= 4 and self.refs[0] == self.refs[-1]

    def try_close(self, max_ring_gap: float) -> bool:
        # ring.go:28-40
        if len(self.refs) < 4:
            return False
        start, end = self.coords[0], self.coords[-1]
        dist = math.hypot(start[1] - end[1], start[0] - end[0])
        if dist < max_ring_gap:
            self.refs[-1] = self.refs[0]
            self.coords[-1] = self.coords[0]
            return True
        return False


def merge_rings(rings: list[Ring]) -> list[Ring]:
    """Stitch open ways into rings by matching endpoint node ids, reversing
    segments as needed — straight port of geom/ring.go:66-140."""
    endpoints: dict[int, Ring] = {}
    for ring in rings:
        if len(ring.refs) < 2:
            continue
        left = ring.refs[0]
        right = ring.refs[-1]
        if left in endpoints:
            orig = endpoints.pop(left)
            if left == orig.refs[-1]:
                orig.refs = orig.refs + ring.refs[1:]
                orig.coords = orig.coords + ring.coords[1:]
            else:
                orig.refs = orig.refs[::-1] + ring.refs[1:]
                orig.coords = orig.coords[::-1] + ring.coords[1:]
            orig.way_ids = orig.way_ids + ring.way_ids
            right_ring = endpoints.get(right)
            if right_ring is not None and right_ring is not orig:
                del endpoints[right]
                if right == right_ring.refs[0]:
                    orig.refs = orig.refs + right_ring.refs[1:]
                    orig.coords = orig.coords + right_ring.coords[1:]
                else:
                    orig.refs = orig.refs[:-1] + right_ring.refs[::-1]
                    orig.coords = orig.coords[:-1] + right_ring.coords[::-1]
                orig.way_ids = orig.way_ids + right_ring.way_ids
                endpoints[orig.refs[-1]] = orig
            else:
                endpoints[right] = orig
        elif right in endpoints:
            orig = endpoints.pop(right)
            if right == orig.refs[0]:
                orig.refs = ring.refs[:-1] + orig.refs
                orig.coords = ring.coords[:-1] + orig.coords
            else:
                orig.refs = orig.refs[:-1] + ring.refs[::-1]
                orig.coords = orig.coords[:-1] + ring.coords[::-1]
            orig.way_ids = orig.way_ids + ring.way_ids
            endpoints[left] = orig
        else:
            endpoints[left] = ring
            endpoints[right] = ring
    unique: list[Ring] = []
    seen: set[int] = set()
    for ring in endpoints.values():
        if id(ring) not in seen:
            seen.add(id(ring))
            unique.append(ring)
    return unique


class NoRingError(ValueError):
    pass


def build_rings(
    member_ways: list[tuple[int, list[int], list[Coord]]], max_ring_gap: float
) -> list[Ring]:
    """buildRings (multipolygon.go:55-118): closed ways become rings
    directly; open ways are merged, then gap-closed; polygon rule (>=4 nodes
    after dedup) applies; result sorted by area desc.

    member_ways: (way_id, refs, coords) in member order."""
    rings = [Ring([wid], list(refs), list(coords)) for wid, refs, coords in member_ways]
    complete: list[Ring] = []
    incomplete: list[Ring] = []
    for r in rings:
        if r.is_closed():
            r.coords = unduplicate(r.coords)
            if len(r.coords) < 4:
                raise NoRingError("linestrings do not form ring")
            complete.append(r)
        else:
            incomplete.append(r)
    for r in merge_rings(incomplete):
        if not r.is_closed() and not r.try_close(max_ring_gap):
            continue  # multipolygon.go:96-98 — drop unclosable rings
        r.coords = unduplicate(r.coords)
        if len(r.coords) < 4:
            raise NoRingError("linestrings do not form ring")
        complete.append(r)
    if not complete:
        raise NoRingError("no rings")
    for r in complete:
        r.area = ring_area(r.coords)
    complete.sort(key=lambda r: -r.area)
    return complete


def build_multipolygon(
    rings: list[Ring],
) -> tuple[list[list[list[Coord]]], set[int]]:
    """Shell/hole classification — multipolygon.go:126-222.

    Returns (polygons, outer_way_ids); polygons = [[shell, hole...], ...].
    Rings must be sorted by area desc."""
    n = len(rings)
    shells: dict[int, bool] = {0: True}
    for i in range(n):
        for j in range(i + 1, n):
            if ring_contains_ring(rings[i].coords, rings[j].coords):
                if rings[j].contained_by != -1:
                    parent = rings[rings[j].contained_by]
                    if rings[j] in parent.holes:
                        parent.holes.remove(rings[j])
                    shells.pop(j, None)
                rings[j].contained_by = i
                if _ring_is_hole(rings, j):
                    rings[i].holes.append(rings[j])
                    rings[i].outer = False
                else:
                    shells[j] = True
                    rings[i].outer = True
        if rings[i].contained_by == -1:
            shells[i] = True
            rings[i].outer = True

    polygons: list[list[list[Coord]]] = []
    for idx in shells:
        shell = rings[idx]
        poly = [_closed(shell.coords)]
        for hole in shell.holes:
            poly.append(_closed(hole.coords))
        polygons.append(poly)

    outer_ids: set[int] = set()
    for r in rings:
        if r.outer:
            outer_ids.update(r.way_ids)
    return polygons, outer_ids


def _ring_is_hole(rings: list[Ring], idx: int) -> bool:
    # multipolygon.go:226-238: odd containment depth = hole
    counter = 0
    while True:
        idx = rings[idx].contained_by
        if idx == -1:
            break
        counter += 1
    return counter % 2 == 1


def _closed(coords: list[Coord]) -> list[Coord]:
    if coords and coords[0] != coords[-1]:
        return coords + [coords[0]]
    return coords


# ---------------------------------------------------------------------------
# Simplify (G6) — Douglas-Peucker, topology-guarded for rings
# (reference: ST_SimplifyPreserveTopology in generalized-table SQL,
#  database/postgis/columns.go:46-64)
# ---------------------------------------------------------------------------


def _point_seg_dist(p: Coord, a: Coord, b: Coord) -> float:
    dx, dy = b[0] - a[0], b[1] - a[1]
    denom = dx * dx + dy * dy
    if denom == 0.0:  # incl. subnormal dx/dy whose squares underflow to 0
        return math.hypot(p[0] - a[0], p[1] - a[1])
    t = ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / denom
    t = max(0.0, min(1.0, t))
    return math.hypot(p[0] - (a[0] + t * dx), p[1] - (a[1] + t * dy))


def simplify_dp(coords: list[Coord], tolerance: float) -> list[Coord]:
    """Douglas-Peucker line simplification (endpoints kept)."""
    n = len(coords)
    if n < 3 or tolerance <= 0:
        return list(coords)
    keep = [False] * n
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        best_d = -1.0
        best_i = -1
        for i in range(lo + 1, hi):
            d = _point_seg_dist(coords[i], coords[lo], coords[hi])
            if d > best_d:
                best_d, best_i = d, i
        if best_d > tolerance:
            keep[best_i] = True
            stack.append((lo, best_i))
            stack.append((best_i, hi))
    return [c for i, c in enumerate(coords) if keep[i]]


def simplify_ring(coords: list[Coord], tolerance: float) -> list[Coord]:
    """Ring simplification with a topology guard: a ring that would collapse
    (<4 points incl. closing) keeps its original coords — the
    'PreserveTopology' behavior the reference relies on."""
    out = simplify_dp(coords, tolerance)
    if len(out) < 4:
        return list(coords)
    return out


# ---------------------------------------------------------------------------
# MakeValid (G2) — self-intersecting ring repair without GEOS
# (geom/geos/geos.go:284-295; applied writer/ways.go:146-150,
#  multipolygon.go:196-200)
# ---------------------------------------------------------------------------


def _seg_intersection(p1: Coord, p2: Coord, p3: Coord, p4: Coord) -> Coord | None:
    """Proper or touching intersection point of two segments (None when
    parallel/collinear or outside both segments).

    The point is computed in exact rational arithmetic and rounded once to
    double — GEOS uses extended-precision (DD) intersection, and plain
    double math shifts the point enough to move repaired-polygon areas by
    ~100 m² at continental scale (observed against the reference's
    completedb expectations)."""
    from fractions import Fraction

    x1, y1 = Fraction(p1[0]), Fraction(p1[1])
    x2, y2 = Fraction(p2[0]), Fraction(p2[1])
    x3, y3 = Fraction(p3[0]), Fraction(p3[1])
    x4, y4 = Fraction(p4[0]), Fraction(p4[1])
    d1x, d1y = x2 - x1, y2 - y1
    d2x, d2y = x4 - x3, y4 - y3
    denom = d1x * d2y - d1y * d2x
    if denom == 0:
        return None
    t = ((x3 - x1) * d2y - (y3 - y1) * d2x) / denom
    u = ((x3 - x1) * d1y - (y3 - y1) * d1x) / denom
    if 0 <= t <= 1 and 0 <= u <= 1:
        return (float(x1 + t * d1x), float(y1 + t * d1y))
    return None


def _overlapping_segment_pairs(coords: Sequence[Coord]) -> list[tuple[int, int]]:
    """Non-adjacent segment index pairs (i < j) of the closed ring whose
    bounding boxes overlap — the only pairs that CAN intersect, in
    ascending (i, j) order.

    Conservative numpy bbox sweep (sort by min-x, window by max-x, mask by
    y-overlap): prunes the O(n^2) pure-Python pair scan that dominated
    MakeValid on real coastline/boundary rings (a 853-point Monaco ring
    spent 16 s here) down to the handful of genuinely overlapping pairs.
    The bbox test is exact float comparison, so the surviving pairs are a
    superset of the intersecting ones — callers run the IDENTICAL scalar
    `_seg_intersection` on each, making results bit-identical to the
    exhaustive scan."""
    import numpy as np

    n = len(coords) - 1  # segments
    if n <= 24:
        # scalar fast path: numpy setup costs ~20 us per call, which
        # dominated the closed-way polygon path (way tables are mostly
        # tiny building rings); the exhaustive scan over <=24 segments
        # with the same exact-float bbox test emits the identical
        # ascending pair list
        pairs_s: list[tuple[int, int]] = []
        for i in range(n):
            (x1, y1), (x2, y2) = coords[i], coords[i + 1]
            iminx, imaxx = (x1, x2) if x1 <= x2 else (x2, x1)
            iminy, imaxy = (y1, y2) if y1 <= y2 else (y2, y1)
            for j in range(i + 2, n - 1 if i == 0 else n):
                (x3, y3), (x4, y4) = coords[j], coords[j + 1]
                jminx, jmaxx = (x3, x4) if x3 <= x4 else (x4, x3)
                if jminx > imaxx or jmaxx < iminx:
                    continue
                jminy, jmaxy = (y3, y4) if y3 <= y4 else (y4, y3)
                if jminy > imaxy or jmaxy < iminy:
                    continue
                pairs_s.append((i, j))
        return pairs_s
    pts = np.asarray(coords, dtype=np.float64)
    ax, ay = pts[:-1, 0], pts[:-1, 1]
    bx, by = pts[1:, 0], pts[1:, 1]
    minx, maxx = np.minimum(ax, bx), np.maximum(ax, bx)
    miny, maxy = np.minimum(ay, by), np.maximum(ay, by)
    order = np.argsort(minx, kind="stable")
    sminx = minx[order]
    pairs: list[tuple[int, int]] = []
    for k in range(n):
        i = int(order[k])
        hi = int(np.searchsorted(sminx, maxx[i], side="right"))
        js = order[k + 1 : hi]
        if js.size == 0:
            continue
        js = js[(miny[js] <= maxy[i]) & (maxy[js] >= miny[i])]
        for j in js:
            j = int(j)
            lo, hi2 = (i, j) if i < j else (j, i)
            if hi2 == lo + 1 or (lo == 0 and hi2 == n - 1):
                continue  # adjacent segments share an endpoint by design
            pairs.append((lo, hi2))
    pairs.sort()
    return pairs


def ring_is_simple(coords: Sequence[Coord]) -> bool:
    """True when no two non-adjacent segments of the closed ring intersect
    and no vertex repeats (other than the closing one)."""
    n = len(coords) - 1  # segments
    if n < 3:
        return True
    seen = set()
    for pt in coords[:-1]:
        if pt in seen:
            return False
        seen.add(pt)
    for i, j in _overlapping_segment_pairs(coords):
        if _seg_intersection(coords[i], coords[i + 1], coords[j], coords[j + 1]):
            return False
    return True


def _insert_intersections(coords: list[Coord]) -> list[Coord]:
    """Closed ring -> vertex sequence with every segment-crossing point
    inserted (the same float tuple on both segments)."""
    n = len(coords) - 1
    extra: dict[int, list[tuple[float, Coord]]] = {i: [] for i in range(n)}
    for i, j in _overlapping_segment_pairs(coords):
        pt = _seg_intersection(coords[i], coords[i + 1], coords[j], coords[j + 1])
        if pt is None:
            continue

        def param(a: Coord, b: Coord, p: Coord) -> float:
            dx, dy = b[0] - a[0], b[1] - a[1]
            return ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / (dx * dx + dy * dy)

        extra[i].append((param(coords[i], coords[i + 1], pt), pt))
        extra[j].append((param(coords[j], coords[j + 1], pt), pt))
    out: list[Coord] = []
    for i in range(n):
        out.append(coords[i])
        for _t, pt in sorted(extra[i], key=lambda e: e[0]):
            if pt != out[-1]:
                out.append(pt)
    out.append(coords[-1])
    return out


def _split_at_repeats(seq: list[Coord]) -> list[list[Coord]]:
    """Walk the vertex sequence; every revisit of a point closes a loop,
    which is emitted as a candidate ring."""
    rings: list[list[Coord]] = []
    path: list[Coord] = []
    index: dict[Coord, int] = {}
    for pt in seq:
        if pt in index:
            i = index[pt]
            loop = path[i:] + [pt]
            if len(loop) >= 4 and ring_area(loop) > 0.0:
                rings.append(loop)
            for p in path[i + 1 :]:
                index.pop(p, None)
            path = path[: i + 1]
        else:
            index[pt] = len(path)
            path.append(pt)
    return rings


def winding_number(pt: Coord, ring: Sequence[Coord]) -> int:
    """Signed winding number of a closed ring around pt."""
    wn = 0
    x, y = pt
    for i in range(len(ring) - 1):
        ax, ay = ring[i]
        bx, by = ring[i + 1]
        cross = (bx - ax) * (y - ay) - (x - ax) * (by - ay)
        if ay <= y:
            if by > y and cross > 0:
                wn += 1
        else:
            if by <= y and cross < 0:
                wn -= 1
    return wn


def _loop_interior_point(loop: Sequence[Coord]) -> Coord:
    """Area centroid (inside for the convex-ish loops the splitter emits)."""
    a2 = 0.0
    cx = cy = 0.0
    for i in range(len(loop) - 1):
        x1, y1 = loop[i]
        x2, y2 = loop[i + 1]
        w = x1 * y2 - x2 * y1
        a2 += w
        cx += (x1 + x2) * w
        cy += (y1 + y2) * w
    if a2 == 0.0:
        return loop[0]
    return (cx / (3 * a2), cy / (3 * a2))


def make_valid_rings(coords: list[Coord]) -> list[Ring]:
    """MakeValid for one closed ring — the reference repairs with
    buffer(0) (geom/geos/geos.go:284-295), whose JTS semantics keep only
    the regions of POSITIVE winding w.r.t. the traversal: a bowtie loses
    its opposite-wound lobe (completedb RelationUpdatedByNode expects one
    triangle of the figure-8). A simple ring passes through unchanged."""
    if coords[0] != coords[-1]:
        coords = coords + [coords[0]]
    if ring_is_simple(coords):
        return [Ring([], [], list(coords))]
    loops = _split_at_repeats(_insert_intersections(coords))
    # buffer(0) keeps the lobes wound in the ring's DOMINANT direction: the
    # figure-8 triangle test (multipolygon_test.go:519-601) keeps the big
    # lobe and drops the oppositely-wound tip. Dominant = sign of the total
    # signed area; zero-sum bowties fall back to positive winding.
    total = ring_signed_area(coords)
    dominant = 1 if total >= 0 else -1
    scored = [(winding_number(_loop_interior_point(lp), coords), lp) for lp in loops]
    kept = [lp for wn, lp in scored if wn * dominant > 0]
    if not kept:
        kept = [lp for wn, lp in scored if wn != 0] or loops
    return [Ring([], [], lp) for lp in kept]


def repair_polygon(coords: list[Coord]) -> tuple[list[list[list[Coord]]], float]:
    """(polygons, area) of a possibly self-intersecting way-polygon ring —
    the way-writer's Polygon + MakeValid pair (writer/ways.go:146-150).
    Bowties split into multiple shells; pinched-off interior loops become
    holes (odd containment depth)."""
    rings = make_valid_rings(list(coords))
    if not rings:
        return [], 0.0
    for r in rings:
        r.area = ring_area(r.coords)
    rings.sort(key=lambda r: -r.area)
    polygons, _outer = build_multipolygon(rings)
    return polygons, multipolygon_area(polygons)


def multipolygon_area(polygons: list[list[list[Coord]]]) -> float:
    """Sum of shell areas minus hole areas (planar)."""
    total = 0.0
    for rings in polygons:
        if not rings:
            continue
        total += ring_area(rings[0])
        for hole in rings[1:]:
            total -= ring_area(hole)
    return total
