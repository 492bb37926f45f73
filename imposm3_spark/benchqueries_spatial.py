"""Grid-partitioned spatial join queries (the non-broadcast J5/G11 path).

Points are synthesized from `part` (the same lattice the osm_* queries
use), axis-aligned boxes from `supplier` via modular arithmetic that is
bit-identical in Spark and DuckDB. Two Spark paths are graded against ONE
SQL truth:

* ``osm_spatial_grid_join`` — pure-expression box verify (whole join
  JVM-side, codegen'd);
* ``osm_spatial_grid_join_poly`` — the same rectangles fed through the
  general polygon path (ring bbox cover + exact point-in-ring pandas UDF
  on grid candidates), proving the kernel path end-to-end against the
  box oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imposm3_spark.benchqueries import _t, register
from imposm3_spark.geom.grid_join import (
    grid_join_points_boxes,
    grid_join_points_polygons,
)

_GRID_ORACLE = """
    WITH pts AS (
      SELECT p_partkey AS point_id,
             ((p_partkey * 13) % 2000) / 10.0 AS x,
             ((p_partkey * 29) % 2000) / 10.0 AS y
      FROM part
    ),
    boxes AS (
      SELECT s_suppkey AS poly_id,
             CAST((s_suppkey * 37) % 170 AS DOUBLE) AS x0,
             CAST((s_suppkey * 17) % 170 AS DOUBLE) AS y0,
             CAST((s_suppkey * 37) % 170 + 10 + (s_suppkey % 5) * 5 AS DOUBLE) AS x1,
             CAST((s_suppkey * 17) % 170 + 10 + (s_suppkey % 7) * 4 AS DOUBLE) AS y1
      FROM supplier
    )
    SELECT poly_id, count(*) AS n_points,
           CAST(sum(point_id) AS BIGINT) AS sum_ids
    FROM pts JOIN boxes
      ON x >= x0 AND x <= x1 AND y >= y0 AND y <= y1
    GROUP BY poly_id
"""


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("point_id"),
        (((F.col("p_partkey") * 13) % 2000) / 10.0).alias("x"),
        (((F.col("p_partkey") * 29) % 2000) / 10.0).alias("y"),
    )


def _boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = _t(spark, sf_dir, "supplier")
    sk = F.col("s_suppkey")
    x0 = (sk * 37) % 170
    y0 = (sk * 17) % 170
    return sup.select(
        sk.alias("poly_id"),
        x0.cast("double").alias("x0"),
        y0.cast("double").alias("y0"),
        (x0 + 10 + (sk % 5) * 5).cast("double").alias("x1"),
        (y0 + 10 + (sk % 7) * 4).cast("double").alias("y1"),
    )


@register("osm_spatial_grid_join", _GRID_ORACLE)
def osm_spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point⋈box containment via the cell-cover equi-join: each side
    shuffles once on the grid key, no broadcast, no cartesian."""
    joined = grid_join_points_boxes(
        _points(spark, sf_dir), _boxes(spark, sf_dir), cell_size=8.0
    )
    return joined.groupBy("poly_id").agg(
        F.count("*").alias("n_points"), F.sum("point_id").alias("sum_ids")
    )


@register("osm_spatial_grid_join_poly", _GRID_ORACLE)
def osm_spatial_grid_join_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same truth through the general polygon path: rectangles as closed
    rings, bbox cell cover, exact point-in-ring verify on candidates."""
    boxes = _boxes(spark, sf_dir)

    def pt(xc, yc):
        return F.struct(xc.alias("x"), yc.alias("y"))

    rings = boxes.select(
        "poly_id",
        F.array(
            pt(F.col("x0"), F.col("y0")),
            pt(F.col("x1"), F.col("y0")),
            pt(F.col("x1"), F.col("y1")),
            pt(F.col("x0"), F.col("y1")),
            pt(F.col("x0"), F.col("y0")),
        ).alias("ring"),
    )
    joined = grid_join_points_polygons(
        _points(spark, sf_dir), rings, cell_size=8.0
    )
    return joined.groupBy("poly_id").agg(
        F.count("*").alias("n_points"), F.sum("point_id").alias("sum_ids")
    )
