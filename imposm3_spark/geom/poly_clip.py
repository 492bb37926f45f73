"""Polygon boolean intersection (pure Python, no GEOS).

Backs exact limit-to polygon clipping (SURVEY §2.3 J6; reference
geom/limit/limit.go:275-317 cuts boundary-crossing polygons with GEOS
``Intersection``). The algorithm is edge classification + stitching over
the overlay graph (the same planar-subdivision idea GEOS/JTS overlay
uses, restricted to the intersection op):

1. orient subject and clip rings canonically (shells CCW, holes CW) so
   the interior of each area lies on the LEFT of every directed edge;
2. insert every subject×clip segment-crossing point into both rings
   (exact rational intersection, rounded once — identical float tuples
   land on both sides, so stitching can match endpoints exactly);
3. keep subject sub-edges whose midpoint is inside-or-on the clip area
   and clip sub-edges whose midpoint is STRICTLY inside the subject area
   (shared-boundary edges are kept once, from the subject side);
4. stitch directed edges end-to-start into closed rings — at pinch
   vertices with several continuations, take the sharpest left turn,
   which keeps the interior on the left;
5. positive signed area → shell, negative → hole; holes are attached to
   the smallest enclosing shell.

Degenerate touches (single-point contact, zero-width slivers) resolve to
rings with |area| ~ 0 and are dropped.
"""

from __future__ import annotations

import math

from imposm3_spark.geom import py_geom

Coord = tuple[float, float]
Polygon = list[list[Coord]]  # [shell, *holes], rings closed


def _orient(ring: list[Coord], ccw: bool) -> list[Coord]:
    if ring[0] != ring[-1]:
        ring = ring + [ring[0]]
    area = py_geom.ring_signed_area(ring)
    if (area >= 0) != ccw:
        return ring[::-1]
    return ring


def _canonical(poly: Polygon) -> Polygon:
    out = [_orient(list(poly[0]), True)]
    for hole in poly[1:]:
        out.append(_orient(list(hole), False))
    return out


def _insert_cuts(poly: Polygon, other: Polygon) -> Polygon:
    """Insert every crossing point with `other`'s rings into `poly`'s
    rings — plus `other`'s vertices that lie ON a `poly` edge, so
    collinear boundary overlaps split at the overlap endpoints and each
    sub-edge classifies uniformly."""
    out: Polygon = []
    for ring in poly:
        n = len(ring) - 1
        extra: dict[int, list[tuple[float, Coord]]] = {}
        for i in range(n):
            a, b = ring[i], ring[i + 1]
            dx, dy = b[0] - a[0], b[1] - a[1]
            denom = dx * dx + dy * dy
            for oring in other:
                for j in range(len(oring) - 1):
                    pt = py_geom._seg_intersection(a, b, oring[j], oring[j + 1])
                    if pt is None or pt == a or pt == b:
                        continue
                    t = ((pt[0] - a[0]) * dx + (pt[1] - a[1]) * dy) / denom if denom else 0.0
                    extra.setdefault(i, []).append((t, pt))
                for v in oring[:-1]:
                    if v == a or v == b or not py_geom._on_segment(
                        v[0], v[1], a[0], a[1], b[0], b[1]
                    ):
                        continue
                    t = ((v[0] - a[0]) * dx + (v[1] - a[1]) * dy) / denom if denom else 0.0
                    extra.setdefault(i, []).append((t, v))
        new_ring: list[Coord] = []
        for i in range(n):
            new_ring.append(ring[i])
            for _t, pt in sorted(extra.get(i, [])):
                if pt != new_ring[-1]:
                    new_ring.append(pt)
        new_ring.append(ring[-1])
        out.append(new_ring)
    return out


def point_in_polygon(pt: Coord, poly: Polygon) -> int:
    """1 strictly inside (shell minus holes), 0 on any ring boundary,
    -1 outside."""
    side = py_geom.point_in_ring(pt, poly[0])
    if side <= 0:
        return side
    for hole in poly[1:]:
        hs = py_geom.point_in_ring(pt, hole)
        if hs == 0:
            return 0
        if hs == 1:
            return -1
    return 1


def _kept_edges(
    poly: Polygon, other: Polygon, keep_boundary: bool
) -> list[tuple[Coord, Coord]]:
    edges = []
    ominx, ominy, omaxx, omaxy = py_geom.bbox(other[0])
    for ring in poly:
        for i in range(len(ring) - 1):
            a, b = ring[i], ring[i + 1]
            if a == b:
                continue
            # bbox reject (strictly outside other's shell bbox)
            if (
                max(a[0], b[0]) < ominx
                or min(a[0], b[0]) > omaxx
                or max(a[1], b[1]) < ominy
                or min(a[1], b[1]) > omaxy
            ):
                continue
            mid = ((a[0] + b[0]) / 2.0, (a[1] + b[1]) / 2.0)
            side = point_in_polygon(mid, other)
            if side == 1 or (side == 0 and keep_boundary):
                edges.append((a, b))
    return edges


def _stitch(edges: list[tuple[Coord, Coord]]) -> list[list[Coord]]:
    """Assemble directed edges into closed rings (interior on the left).
    At junction vertices the sharpest-left-turn continuation is chosen."""
    out_map: dict[Coord, list[int]] = {}
    for idx, (a, _b) in enumerate(edges):
        out_map.setdefault(a, []).append(idx)
    used = [False] * len(edges)
    rings: list[list[Coord]] = []
    for start_idx in range(len(edges)):
        if used[start_idx]:
            continue
        ring = [edges[start_idx][0]]
        idx = start_idx
        while True:
            used[idx] = True
            a, b = edges[idx]
            ring.append(b)
            if b == ring[0]:
                rings.append(ring)
                break
            cands = [k for k in out_map.get(b, []) if not used[k]]
            if not cands:
                break  # open chain — degenerate, drop
            if len(cands) == 1:
                idx = cands[0]
            else:
                # sharpest left turn w.r.t. incoming direction
                din = math.atan2(b[1] - a[1], b[0] - a[0])

                def turn(k: int) -> float:
                    _, c = edges[k][0], edges[k][1]
                    dout = math.atan2(c[1] - b[1], c[0] - b[0])
                    # CCW turn angle in (-pi, pi]; larger = more leftward
                    t = dout - din
                    while t <= -math.pi:
                        t += 2 * math.pi
                    while t > math.pi:
                        t -= 2 * math.pi
                    return t

                idx = max(cands, key=turn)
    return rings


_AREA_EPS = 1e-12


def polygon_intersection(subject: Polygon, clip: Polygon) -> list[Polygon]:
    """Intersection of two polygons-with-holes; returns 0..n polygons."""
    subject = _canonical(subject)
    clip = _canonical(clip)

    # bbox reject
    sminx, sminy, smaxx, smaxy = py_geom.bbox(subject[0])
    cminx, cminy, cmaxx, cmaxy = py_geom.bbox(clip[0])
    if smaxx < cminx or sminx > cmaxx or smaxy < cminy or sminy > cmaxy:
        return []

    subj_cut = _insert_cuts(subject, clip)
    clip_cut = _insert_cuts(clip, subject)
    edges = _kept_edges(subj_cut, clip, keep_boundary=True)
    edges += _kept_edges(clip_cut, subject, keep_boundary=False)
    if not edges:
        return []
    # drop exact duplicate directed edges (overlapping collinear boundary)
    edges = list(dict.fromkeys(edges))
    rings = _stitch(edges)

    shells: list[tuple[float, list[Coord]]] = []
    holes: list[tuple[float, list[Coord]]] = []
    for ring in rings:
        area = py_geom.ring_signed_area(ring)
        if area > _AREA_EPS:
            shells.append((area, ring))
        elif area < -_AREA_EPS:
            holes.append((-area, ring))
    if not shells:
        return []
    # attach each hole to its smallest enclosing shell
    shells.sort(key=lambda s: s[0])  # ascending: first hit = smallest
    polys: list[Polygon] = [[ring] for _a, ring in shells]
    for _harea, hole in holes:
        probe = _hole_probe(hole)
        for k, (_sarea, shell) in enumerate(shells):
            if py_geom.point_in_ring(probe, shell) >= 0:
                polys[k].append(hole)
                break
    return polys


def _hole_probe(ring: list[Coord]) -> Coord:
    return py_geom._loop_interior_point(ring)


def _collinear_same_dir(mid: Coord, a: Coord, b: Coord, other: Polygon) -> bool:
    """For an edge (a,b) whose midpoint lies on `other`'s boundary: True if
    the collinear boundary edge of `other` runs the SAME direction (both
    interiors on the left — exact test, no epsilon probes)."""
    for oring in other:
        for j in range(len(oring) - 1):
            c, d = oring[j], oring[j + 1]
            if c == d:
                continue
            if py_geom._on_segment(mid[0], mid[1], c[0], c[1], d[0], d[1]):
                return (b[0] - a[0]) * (d[0] - c[0]) + (b[1] - a[1]) * (d[1] - c[1]) > 0
    return False


def polygon_union(subject: Polygon, clip: Polygon) -> list[Polygon]:
    """Union of two polygons-with-holes (GEOS ``Union`` analog, G8;
    reference geom/geos/ops.go:53-77 unions clipped polygon pieces).

    Same overlay machinery as intersection with the dual keep-rule: keep
    subject sub-edges whose midpoint is OUTSIDE-or-on the clip area and
    clip sub-edges strictly outside the subject area — interiors stay on
    the left, so stitching yields CCW shells and CW holes of the union.
    Disjoint inputs come back as two separate polygons."""
    subject = _canonical(subject)
    clip = _canonical(clip)

    sminx, sminy, smaxx, smaxy = py_geom.bbox(subject[0])
    cminx, cminy, cmaxx, cmaxy = py_geom.bbox(clip[0])
    if smaxx < cminx or sminx > cmaxx or smaxy < cminy or sminy > cmaxy:
        return [subject, clip]

    subj_cut = _insert_cuts(subject, clip)
    clip_cut = _insert_cuts(clip, subject)
    edges = []
    for ring in subj_cut:
        for i in range(len(ring) - 1):
            a, b = ring[i], ring[i + 1]
            if a == b:
                continue
            mid = ((a[0] + b[0]) / 2.0, (a[1] + b[1]) / 2.0)
            side = point_in_polygon(mid, clip)
            if side == -1:
                edges.append((a, b))
            elif side == 0:
                # collinear boundary overlap: interiors on the same side
                # (same direction) -> union boundary, keep once (from the
                # subject); opposite directions -> interior edge, drop
                if _collinear_same_dir(mid, a, b, clip):
                    edges.append((a, b))
    for ring in clip_cut:
        for i in range(len(ring) - 1):
            a, b = ring[i], ring[i + 1]
            if a == b:
                continue
            mid = ((a[0] + b[0]) / 2.0, (a[1] + b[1]) / 2.0)
            if point_in_polygon(mid, subject) == -1:
                edges.append((a, b))
    if not edges:
        return []
    edges = list(dict.fromkeys(edges))
    rings = _stitch(edges)

    shells: list[tuple[float, list[Coord]]] = []
    holes: list[tuple[float, list[Coord]]] = []
    for ring in rings:
        area = py_geom.ring_signed_area(ring)
        if area > _AREA_EPS:
            shells.append((area, ring))
        elif area < -_AREA_EPS:
            holes.append((-area, ring))
    if not shells:
        return []
    shells.sort(key=lambda s: s[0])
    polys: list[Polygon] = [[ring] for _a, ring in shells]
    for _harea, hole in holes:
        probe = _hole_probe(hole)
        for k, (_sarea, shell) in enumerate(shells):
            if py_geom.point_in_ring(probe, shell) >= 0:
                polys[k].append(hole)
                break
    return polys


def union_all(polygons: list[Polygon]) -> list[Polygon]:
    """n-ary union by fold-and-merge: each input is repeatedly unioned
    with any overlapping accumulated polygon until disjoint. Driver-side
    (clip regions are small); the per-row data path never calls this."""
    result: list[Polygon] = []
    for poly in polygons:
        merged = _canonical(poly)
        changed = True
        while changed:
            changed = False
            for i, other in enumerate(result):
                u = polygon_union(merged, other)
                if len(u) == 1:
                    merged = u[0]
                    result.pop(i)
                    changed = True
                    break
        result.append(merged)
    return result
