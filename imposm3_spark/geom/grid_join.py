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
    xs = F.transform(F.col(ring_col), lambda v: v["x"])
    ys = F.transform(F.col(ring_col), lambda v: v["y"])
    polys = polygons.withColumns(
        {"_x0": F.array_min(xs), "_x1": F.array_max(xs),
         "_y0": F.array_min(ys), "_y1": F.array_max(ys)}
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
    def _inside(x: pd.Series, y: pd.Series, ring: pd.Series) -> pd.Series:
        from imposm3_spark.geom.py_geom import point_in_ring

        out = []
        for xi, yi, r in zip(x, y, ring):
            pts = [(v["x"], v["y"]) for v in r]
            if pts and pts[0] != pts[-1]:
                pts.append(pts[0])  # kernel expects a closed ring
            # point_in_ring: 1 inside, 0 on boundary, -1 outside
            out.append(point_in_ring((xi, yi), pts) >= 0)
        return pd.Series(out)

    return (
        cand.filter(_inside(F.col(px), F.col(py), F.col(ring_col)))
        .drop("_cx", "_cy", "_x0", "_x1", "_y0", "_y1")
    )
