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
    """Ray casting. Returns 1 strictly inside, 0 on boundary, -1 outside."""
    x, y = pt
    n = len(ring)
    inside = False
    for i in range(n - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
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
