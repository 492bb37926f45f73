"""Limit-to + geojson_intersects through the import pipeline."""

import json

import pytest
from pyspark.sql import functions as F

from imposm3_spark.geom.clip import Limiter
from imposm3_spark.mapping.config import load_mapping_str
from imposm3_spark.pipeline.engine import ImportPipeline
from imposm3_spark.sources.geojson import load_geojson
from imposm3_spark.sources.osm_xml import NODE_SCHEMA, WAY_SCHEMA


@pytest.fixture(scope="module")
def clip_file(tmp_path_factory):
    # a 1x1-degree box around (0.5, 0.5) in WGS84
    p = tmp_path_factory.mktemp("gj") / "clip.geojson"
    p.write_text(
        json.dumps(
            {
                "type": "FeatureCollection",
                "features": [
                    {
                        "type": "Feature",
                        "properties": {"name": "box"},
                        "geometry": {
                            "type": "Polygon",
                            "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
                        },
                    }
                ],
            }
        )
    )
    return str(p)


MAPPING = """
{"tables": {
  "pois": {"type": "point",
            "mapping": {"amenity": ["cafe"]},
            "columns": [{"name": "osm_id", "type": "id"},
                         {"name": "geometry", "type": "geometry"},
                         {"name": "in_box", "type": "geojson_intersects",
                          "args": {"geojson": "%s"}},
                         {"name": "box_name", "type": "geojson_intersects_feature",
                          "args": {"geojson": "%s", "property": "name"}}]},
  "paths": {"type": "linestring",
             "mapping": {"highway": ["path"]},
             "columns": [{"name": "osm_id", "type": "id"},
                          {"name": "geometry", "type": "geometry"}]}
}}
"""


def test_limit_and_intersects(spark, clip_file):
    mapping = load_mapping_str(MAPPING % (clip_file, clip_file), fmt="json")
    limiter = Limiter(load_geojson(clip_file, transform=3857))

    nodes = spark.createDataFrame(
        [
            (1, 0.5, 0.5, {"amenity": "cafe"}, None),   # inside
            (2, 5.0, 5.0, {"amenity": "cafe"}, None),   # outside
            (10, 0.4, 0.5, {}, None),
            (11, 0.6, 0.5, {}, None),
            (12, 5.0, 0.5, {}, None),
        ],
        NODE_SCHEMA,
    )
    ways = spark.createDataFrame(
        [(100, [10, 11], {"highway": "path"}, None), (101, [11, 12], {"highway": "path"}, None)],
        WAY_SCHEMA,
    )
    rels = spark.createDataFrame([], "id bigint, members array<struct<id:bigint,type:tinyint,role:string>>, tags map<string,string>")

    pipe = ImportPipeline(mapping, srid=3857, limiter=limiter)
    out = pipe.run(nodes, ways, rels)

    pois = out["pois"].collect()
    assert [r["osm_id"] for r in pois] == [1]  # node 2 limit-filtered (F8)
    assert pois[0]["in_box"] is True
    assert pois[0]["box_name"] == "box"

    paths = out["paths"].collect()
    ids = sorted(r["osm_id"] for r in paths)
    assert ids == [100, 101]  # way 101 exits the box but its inside part stays
    # the clipped way's geometry ends at the box boundary (x <= merc(1.0))
    from imposm3_spark.geom import wkb as wkblib
    from imposm3_spark.geom.proj import py_wgs_to_merc

    bx = py_wgs_to_merc(1.0, 0.5)[0]
    clipped = [r for r in paths if r["osm_id"] == 101][0]
    coords = wkblib.parse_wkb(bytes(clipped["geometry"]))["coords"]
    assert max(x for x, _y in coords) <= bx + 1e-6


POLY_MAPPING = """
{"tables": {
  "landuse": {"type": "polygon",
               "mapping": {"landuse": ["park"]},
               "columns": [{"name": "osm_id", "type": "id"},
                            {"name": "geometry", "type": "geometry"},
                            {"name": "area", "type": "area"}]}
}}
"""


def test_polygon_cut_through_pipeline(spark, clip_file):
    """A closed way crossing the limit boundary is cut (J6): output area
    equals the part inside the box, not the full polygon."""
    mapping = load_mapping_str(POLY_MAPPING, fmt="json")
    limiter = Limiter(load_geojson(clip_file, transform=3857))

    # square from (0.5,0.2) to (1.5,0.8): right half sticks out of the box
    nodes = spark.createDataFrame(
        [
            (20, 0.5, 0.2, {}, None),
            (21, 1.5, 0.2, {}, None),
            (22, 1.5, 0.8, {}, None),
            (23, 0.5, 0.8, {}, None),
            # fully-inside square (0.1,0.1)-(0.2,0.2)
            (30, 0.1, 0.1, {}, None),
            (31, 0.2, 0.1, {}, None),
            (32, 0.2, 0.2, {}, None),
            (33, 0.1, 0.2, {}, None),
            # fully-outside square
            (40, 5.0, 5.0, {}, None),
            (41, 6.0, 5.0, {}, None),
            (42, 6.0, 6.0, {}, None),
            (43, 5.0, 6.0, {}, None),
        ],
        NODE_SCHEMA,
    )
    ways = spark.createDataFrame(
        [
            (200, [20, 21, 22, 23, 20], {"landuse": "park"}, None),
            (300, [30, 31, 32, 33, 30], {"landuse": "park"}, None),
            (400, [40, 41, 42, 43, 40], {"landuse": "park"}, None),
        ],
        WAY_SCHEMA,
    )
    rels = spark.createDataFrame(
        [], "id bigint, members array<struct<id:bigint,type:tinyint,role:string>>, tags map<string,string>"
    )
    pipe = ImportPipeline(mapping, srid=3857, limiter=limiter)
    out = pipe.run(nodes, ways, rels)
    rows = {r["osm_id"]: r for r in out["landuse"].collect()}
    assert set(rows) == {200, 300}  # outside polygon dropped

    from imposm3_spark.geom.proj import py_wgs_to_merc

    x0, _ = py_wgs_to_merc(0.5, 0.0)
    x1, _ = py_wgs_to_merc(1.0, 0.0)
    y0 = py_wgs_to_merc(0.0, 0.2)[1]
    y1 = py_wgs_to_merc(0.0, 0.8)[1]
    want = (x1 - x0) * (y1 - y0)  # cut at the box edge x=merc(1.0)
    assert abs(rows[200]["area"] - want) / want < 1e-6

    # contained polygon keeps its full area
    fx0, _ = py_wgs_to_merc(0.1, 0.0)
    fx1, _ = py_wgs_to_merc(0.2, 0.0)
    fy0 = py_wgs_to_merc(0.0, 0.1)[1]
    fy1 = py_wgs_to_merc(0.0, 0.2)[1]
    full = (fx1 - fx0) * (fy1 - fy0)
    assert abs(rows[300]["area"] - full) / full < 1e-6


def test_without_limiter_keeps_everything(spark, clip_file):
    mapping = load_mapping_str(MAPPING % (clip_file, clip_file), fmt="json")
    nodes = spark.createDataFrame(
        [(1, 0.5, 0.5, {"amenity": "cafe"}, None), (2, 5.0, 5.0, {"amenity": "cafe"}, None)],
        NODE_SCHEMA,
    )
    ways = spark.createDataFrame([], WAY_SCHEMA)
    rels = spark.createDataFrame([], "id bigint, members array<struct<id:bigint,type:tinyint,role:string>>, tags map<string,string>")
    pipe = ImportPipeline(mapping, srid=3857)
    out = pipe.run(nodes, ways, rels)
    rows = {r["osm_id"]: r for r in out["pois"].collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["in_box"] is True and rows[2]["in_box"] is False
    assert rows[1]["box_name"] == "box" and rows[2]["box_name"] == ""


def test_polygon_clip_xy_matches_struct_udf(spark, clip_file):
    """The limiter way-polygon branch moved to the xs/ys Arrow fast lane
    (round 8); pin the xy variant byte-identical to the struct-input
    reference UDF across crossing / contained / outside / degenerate /
    self-intersecting rings."""
    from imposm3_spark.geom.proj import py_wgs_to_merc

    limiter = Limiter(load_geojson(clip_file, transform=3857))
    pipe = ImportPipeline(
        load_mapping_str(POLY_MAPPING, fmt="json"), srid=3857, limiter=limiter
    )

    def merc_ring(pts):
        return [
            {"x": py_wgs_to_merc(x, y)[0], "y": py_wgs_to_merc(x, y)[1]}
            for x, y in pts
        ]

    rows = [
        # crossing square (right half outside the box)
        (1, merc_ring([(0.5, 0.2), (1.5, 0.2), (1.5, 0.8), (0.5, 0.8), (0.5, 0.2)])),
        # fully contained
        (2, merc_ring([(0.1, 0.1), (0.2, 0.1), (0.2, 0.2), (0.1, 0.2), (0.1, 0.1)])),
        # fully outside
        (3, merc_ring([(5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 6.0), (5.0, 5.0)])),
        # bowtie (self-intersecting, repaired by MakeValid) straddling the edge
        (4, merc_ring([(0.8, 0.3), (1.2, 0.7), (1.2, 0.3), (0.8, 0.7), (0.8, 0.3)])),
        # degenerate: too few points
        (5, merc_ring([(0.5, 0.5), (0.6, 0.5), (0.5, 0.5)])),
        # null coords array
        (6, None),
    ]
    df = spark.createDataFrame(
        rows, "id bigint, coords array<struct<x:double,y:double>>"
    )
    got = (
        df.select(
            "id",
            pipe._polygon_clip_udf()(F.col("coords")).alias("ref"),
            pipe._polygon_clip_expr(F.col("coords")).alias("fast"),
        )
        .orderBy("id")
        .collect()
    )
    assert len(got) == 6
    saw_wkb = 0
    for r in got:
        assert r["ref"] == r["fast"], f"id={r['id']}"
        if r["ref"]["wkb"] is not None:
            saw_wkb += 1
            assert bytes(r["ref"]["wkb"]) == bytes(r["fast"]["wkb"])
    assert saw_wkb == 3  # 1, 2, 4 produce geometry; 3, 5, 6 are empty


def test_clip_line_xy_matches_struct_udf(spark, clip_file):
    """The clipped-line path moved to xs/ys arrays on both UDF sides
    (round 8): pin the xy clip variant value-identical to the struct
    reference across crossing / contained / outside / null lines."""
    limiter = Limiter(load_geojson(clip_file, transform=3857))
    pipe = ImportPipeline(
        load_mapping_str(MAPPING % (clip_file, clip_file), fmt="json"),
        srid=3857,
        limiter=limiter,
    )
    from imposm3_spark.geom.proj import py_wgs_to_merc

    def merc_line(pts):
        return [
            {"x": py_wgs_to_merc(x, y)[0], "y": py_wgs_to_merc(x, y)[1]}
            for x, y in pts
        ]

    rows = [
        (1, merc_line([(0.4, 0.5), (0.6, 0.5)])),              # inside
        (2, merc_line([(0.6, 0.5), (5.0, 0.5)])),              # exits the box
        (3, merc_line([(5.0, 5.0), (6.0, 6.0)])),              # outside
        (4, merc_line([(-1.0, 0.5), (2.0, 0.5), (2.0, -1.0), (0.5, 0.5)])),  # re-enters
        (5, None),
    ]
    df = spark.createDataFrame(
        rows, "id bigint, coords array<struct<x:double,y:double>>"
    )
    got = df.select(
        "id",
        pipe._clip_line_udf()(F.col("coords")).alias("ref"),
        pipe._clip_line_expr(F.col("coords")).alias("fast"),
    ).collect()
    n_parts = 0
    for r in got:
        ref_parts = [[(c["x"], c["y"]) for c in part] for part in r["ref"]]
        fast_parts = [list(zip(p["xs"], p["ys"])) for p in r["fast"]]
        assert ref_parts == fast_parts, f"id={r['id']}"
        n_parts += len(ref_parts)
    assert n_parts >= 4  # ids 1, 2 and the re-entering line contribute parts
