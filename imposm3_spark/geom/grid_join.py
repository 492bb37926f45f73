"""Grid-partitioned spatial join: the non-broadcast path for point⋈polygon.

The engine's `geojson_intersects` column types (mapping/columns.py) and the
limit-to clip join broadcast the polygon side — correct while that side is
a handful of admin boundaries (the reference's only use: limit.go loads ONE
GeoJSON file). At 100 TB with millions of polygons the broadcast dies; the
standard scale design is a grid partition join:

  1. pick a cell size; every point hashes to exactly ONE cell
     ``(floor(x/cs), floor(y/cs))`` — the point side shuffles once, by a
     key computed at scan speed;
  2. every polygon replicates to each cell its bbox overlaps (a bounded
     explode — cells are sized so typical geometries span O(1) cells);
  3. an equi-join on the cell key produces candidate pairs — never a
     CartesianProduct, and co-partitioned rather than broadcast;
  4. an exact predicate verifies candidates. Because a point lives in
     exactly one cell, a (point, polygon) pair is produced at most once —
     no dedup shuffle afterwards (the classic trick vs. replicating BOTH
     sides).

`grid_join_points_boxes` keeps the verify step a pure expression
(axis-aligned boxes: two comparisons) so the whole join is JVM-side and
codegen'd; `grid_join_points_polygons` verifies candidates with the exact
point-in-ring kernel (pandas UDF over candidates only — the expensive
geometry test runs on the grid-filtered pairs, not the cross product).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _cell(v: F.Column, cell_size: float) -> F.Column:
    return F.floor(v / F.lit(float(cell_size))).cast("long")


def grid_join_points_boxes(
    points: DataFrame,
    boxes: DataFrame,
    cell_size: float,
    point_cols: tuple[str, str] = ("x", "y"),
    box_cols: tuple[str, str, str, str] = ("x0", "y0", "x1", "y1"),
) -> DataFrame:
    """Candidate-exact join of points against axis-aligned boxes.

    Returns ``points.columns + boxes.columns`` rows for every point with
    ``x0 <= x <= x1 and y0 <= y <= y1`` (boundary inclusive). Both sides
    shuffle on the cell key; the box side fans out to its bbox's cell
    cover (``O((w/cs+1)*(h/cs+1))`` rows per box).
    """
    px, py = point_cols
    x0, y0, x1, y1 = box_cols
    p = points.withColumns(
        {"_cx": _cell(F.col(px), cell_size), "_cy": _cell(F.col(py), cell_size)}
    )
    b = boxes.withColumn(
        "_cx", F.explode(F.sequence(_cell(F.col(x0), cell_size), _cell(F.col(x1), cell_size)))
    ).withColumn(
        "_cy", F.explode(F.sequence(_cell(F.col(y0), cell_size), _cell(F.col(y1), cell_size)))
    )
    return (
        p.join(b, ["_cx", "_cy"])
        .filter(
            (F.col(px) >= F.col(x0))
            & (F.col(px) <= F.col(x1))
            & (F.col(py) >= F.col(y0))
            & (F.col(py) <= F.col(y1))
        )
        .drop("_cx", "_cy")
    )


def grid_join_points_polygons(
    points: DataFrame,
    polygons: DataFrame,
    cell_size: float,
    point_cols: tuple[str, str] = ("x", "y"),
    ring_col: str = "ring",
) -> DataFrame:
    """Grid join of points against general polygons (exterior rings as
    ``array<struct<x:double,y:double>>``), exact point-in-polygon verify.

    The polygon side replicates to its bbox's cell cover (computed from
    the ring, one expression); candidates from the cell equi-join are
    verified by the even-odd ray-cast kernel — a pandas UDF that only
    ever sees grid-filtered pairs.
    """
    px, py = point_cols
    # project the ring to two flat double arrays up front: list<double>
    # crosses Arrow as a contiguous buffer (numpy view, no per-row dict
    # materialization in the verify UDF)
    polys = polygons.withColumns(
        {"_rx": F.transform(F.col(ring_col), lambda v: v["x"].cast("double")),
         "_ry": F.transform(F.col(ring_col), lambda v: v["y"].cast("double"))}
    )
    polys = polys.withColumns(
        {"_x0": F.array_min("_rx"), "_x1": F.array_max("_rx"),
         "_y0": F.array_min("_ry"), "_y1": F.array_max("_ry")}
    )
    p = points.withColumns(
        {"_cx": _cell(F.col(px), cell_size), "_cy": _cell(F.col(py), cell_size)}
    )
    b = polys.withColumn(
        "_cx", F.explode(F.sequence(_cell(F.col("_x0"), cell_size), _cell(F.col("_x1"), cell_size)))
    ).withColumn(
        "_cy", F.explode(F.sequence(_cell(F.col("_y0"), cell_size), _cell(F.col("_y1"), cell_size)))
    )
    cand = p.join(b, ["_cx", "_cy"]).filter(
        (F.col(px) >= F.col("_x0")) & (F.col(px) <= F.col("_x1"))
        & (F.col(py) >= F.col("_y0")) & (F.col(py) <= F.col("_y1"))
    )

    @pandas_udf("boolean")
    def _inside(x: pd.Series, y: pd.Series, rx: pd.Series, ry: pd.Series) -> pd.Series:
        import numpy as np

        # fully batch-vectorized ray cast: rows are bucketed by ring
        # LENGTH only (typically one bucket), each bucket's rings stacked
        # into a dense (rows, verts) matrix, and the edge loop runs numpy
        # ops over the whole bucket — no per-ring python. Semantics are
        # bit-identical to py_geom.point_in_ring >= 0 (even-odd +
        # inclusive boundary, same 1e-12 tolerances), INCLUDING open
        # rings: both kernels treat first != last as implicitly closed
        # and test the closing edge (py_geom.point_in_ring docstring).
        n = len(x)
        if n == 0:
            return pd.Series([], dtype=bool)
        px_all = x.to_numpy(dtype=float)
        py_all = y.to_numpy(dtype=float)
        rxv = rx.to_numpy()
        ryv = ry.to_numpy()
        lens = np.fromiter((len(a) for a in rxv), dtype=np.int64, count=n)
        out = np.zeros(n, dtype=bool)
        for length in np.unique(lens):
            sel = np.nonzero(lens == length)[0]
            if length < 2:
                continue  # no edges: nothing is inside a degenerate ring
            RX = np.stack([np.asarray(rxv[i], dtype=float) for i in sel])
            RY = np.stack([np.asarray(ryv[i], dtype=float) for i in sel])
            closed = (RX[:, 0] == RX[:, -1]) & (RY[:, 0] == RY[:, -1])
            if not closed.all():
                # close open rings by appending the first vertex; for
                # already-closed rows the extra zero-length edge adds no
                # crossings (y1 == y2) and no new boundary hits
                RX = np.hstack([RX, RX[:, :1]])
                RY = np.hstack([RY, RY[:, :1]])
            sx, sy = px_all[sel], py_all[sel]
            inside = np.zeros(len(sel), dtype=bool)
            on_edge = np.zeros(len(sel), dtype=bool)
            for e in range(RX.shape[1] - 1):
                x1, y1 = RX[:, e], RY[:, e]
                x2, y2 = RX[:, e + 1], RY[:, e + 1]
                cross = (x2 - x1) * (sy - y1) - (y2 - y1) * (sx - x1)
                on_edge |= (
                    (np.abs(cross) <= 1e-12)
                    & (sx >= np.minimum(x1, x2) - 1e-12)
                    & (sx <= np.maximum(x1, x2) + 1e-12)
                    & (sy >= np.minimum(y1, y2) - 1e-12)
                    & (sy <= np.maximum(y1, y2) + 1e-12)
                )
                mask = (y1 > sy) != (y2 > sy)
                with np.errstate(divide="ignore", invalid="ignore"):
                    xint = (x2 - x1) * (sy - y1) / (y2 - y1) + x1
                inside ^= mask & (sx < xint)
            out[sel] = inside | on_edge
        return pd.Series(out)

    return (
        cand.filter(_inside(F.col(px), F.col(py), F.col("_rx"), F.col("_ry")))
        .drop("_cx", "_cy", "_x0", "_x1", "_y0", "_y1", "_rx", "_ry")
    )
