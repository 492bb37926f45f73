"""Grid-partitioned spatial join: equivalence with the naive cross
product, boundary semantics, general-polygon verify kernel."""

import random

from pyspark.sql import functions as F

from imposm3_spark.geom.grid_join import (
    grid_join_points_boxes,
    grid_join_points_polygons,
)
from imposm3_spark.geom.py_geom import point_in_ring


def _pts(spark, rows):
    return spark.createDataFrame(rows, "point_id long, x double, y double")


def test_box_join_matches_naive(spark):
    rng = random.Random(7)
    pts = [(i, rng.uniform(0, 100), rng.uniform(0, 100)) for i in range(300)]
    boxes = []
    for j in range(20):
        x0, y0 = rng.uniform(0, 90), rng.uniform(0, 90)
        boxes.append((j, x0, y0, x0 + rng.uniform(1, 30), y0 + rng.uniform(1, 30)))
    pdf = _pts(spark, pts)
    bdf = spark.createDataFrame(
        boxes, "poly_id long, x0 double, y0 double, x1 double, y1 double"
    )
    got = {
        (r["point_id"], r["poly_id"])
        for r in grid_join_points_boxes(pdf, bdf, cell_size=16.0).collect()
    }
    want = {
        (i, j)
        for (i, x, y) in pts
        for (j, x0, y0, x1, y1) in boxes
        if x0 <= x <= x1 and y0 <= y <= y1
    }
    assert got == want


def test_box_join_boundary_inclusive(spark):
    pdf = _pts(spark, [(0, 10.0, 10.0), (1, 20.0, 20.0), (2, 20.0001, 10.0)])
    bdf = spark.createDataFrame(
        [(0, 10.0, 10.0, 20.0, 20.0)],
        "poly_id long, x0 double, y0 double, x1 double, y1 double",
    )
    got = sorted(
        r["point_id"]
        for r in grid_join_points_boxes(pdf, bdf, cell_size=7.0).collect()
    )
    assert got == [0, 1]  # corners in, epsilon-outside out


def test_box_spanning_many_cells(spark):
    # one box covering the whole domain must still pair with every point
    pdf = _pts(spark, [(i, float(i), float(i)) for i in range(50)])
    bdf = spark.createDataFrame(
        [(0, 0.0, 0.0, 49.0, 49.0)],
        "poly_id long, x0 double, y0 double, x1 double, y1 double",
    )
    n = grid_join_points_boxes(pdf, bdf, cell_size=5.0).count()
    assert n == 50


def test_polygon_join_triangle_kernel(spark):
    # triangle (0,0)-(10,0)-(0,10); verify against the kernel directly
    ring = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (0.0, 0.0)]
    rng = random.Random(3)
    pts = [(i, rng.uniform(-2, 12), rng.uniform(-2, 12)) for i in range(200)]
    pdf = _pts(spark, pts)
    rings = spark.createDataFrame(
        [(0, [{"x": x, "y": y} for x, y in ring])],
        "poly_id long, ring array<struct<x:double,y:double>>",
    )
    got = sorted(
        r["point_id"]
        for r in grid_join_points_polygons(pdf, rings, cell_size=4.0).collect()
    )
    want = sorted(
        i for (i, x, y) in pts if point_in_ring((x, y), ring) >= 0
    )
    assert got == want


def test_grid_join_plan_no_cartesian(spark):
    pdf = _pts(spark, [(0, 1.0, 1.0)])
    bdf = spark.createDataFrame(
        [(0, 0.0, 0.0, 2.0, 2.0)],
        "poly_id long, x0 double, y0 double, x1 double, y1 double",
    )
    df = grid_join_points_boxes(pdf, bdf, cell_size=8.0)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_grid_join_sort_merge_path_same_result(spark):
    """With broadcast disabled (the many-polygons regime at 100 TB), the
    cell equi-join must degrade to a SortMergeJoin on the cell key — both
    sides co-partitioned — and produce identical pairs."""
    rng = random.Random(11)
    pts = [(i, rng.uniform(0, 100), rng.uniform(0, 100)) for i in range(400)]
    boxes = []
    for j in range(30):
        x0, y0 = rng.uniform(0, 90), rng.uniform(0, 90)
        boxes.append((j, x0, y0, x0 + rng.uniform(1, 25), y0 + rng.uniform(1, 25)))
    pdf = _pts(spark, pts)
    bdf = spark.createDataFrame(
        boxes, "poly_id long, x0 double, y0 double, x1 double, y1 double"
    )
    want = {
        (i, j)
        for (i, x, y) in pts
        for (j, x0, y0, x1, y1) in boxes
        if x0 <= x <= x1 and y0 <= y <= y1
    }
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = grid_join_points_boxes(pdf, bdf, cell_size=16.0)
        got = {(r["point_id"], r["poly_id"]) for r in df.collect()}
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == want
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_open_ring_matches_scalar_kernel(spark):
    """Open rings (first != last) are implicitly closed by BOTH kernels:
    the vectorized grid-join ray cast and py_geom.point_in_ring must agree
    on points inside, outside, and ON the implicit closing edge."""
    from imposm3_spark.geom.grid_join import grid_join_points_polygons
    from imposm3_spark.geom.py_geom import point_in_ring

    open_tri = [(0.0, 0.0), (4.0, 0.0), (0.0, 4.0)]  # closing edge omitted
    pts = [
        (1, 1.0, 1.0),   # inside
        (2, 3.0, 3.0),   # outside, but only if the closing edge is tested
        (3, 2.0, 2.0),   # ON the implicit closing edge
        (4, 5.0, 5.0),   # outside everything
        (5, 2.0, 0.0),   # on an explicit edge
    ]
    for pid, x, y in pts:
        scalar = point_in_ring((x, y), open_tri)
        # closing the ring by hand must give the same verdict
        assert scalar == point_in_ring((x, y), open_tri + open_tri[:1]), pid

    points = spark.createDataFrame(pts, "pid int, x double, y double")
    polys = spark.createDataFrame(
        [(10, [{"x": x, "y": y} for x, y in open_tri])],
        "poly_id int, ring array<struct<x:double,y:double>>",
    )
    got = {
        r["pid"]
        for r in grid_join_points_polygons(points, polys, cell_size=2.0).collect()
    }
    want = {pid for pid, x, y in pts if point_in_ring((x, y), open_tri) >= 0}
    assert got == want == {1, 3, 5}
