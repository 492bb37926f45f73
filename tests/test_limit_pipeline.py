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
            (1, 0.5, 0.5, {"amenity": "cafe"}),   # inside
            (2, 5.0, 5.0, {"amenity": "cafe"}),   # outside
            (10, 0.4, 0.5, {}),
            (11, 0.6, 0.5, {}),
            (12, 5.0, 0.5, {}),
        ],
        NODE_SCHEMA,
    )
    ways = spark.createDataFrame(
        [(100, [10, 11], {"highway": "path"}), (101, [11, 12], {"highway": "path"})],
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


def test_without_limiter_keeps_everything(spark, clip_file):
    mapping = load_mapping_str(MAPPING % (clip_file, clip_file), fmt="json")
    nodes = spark.createDataFrame(
        [(1, 0.5, 0.5, {"amenity": "cafe"}), (2, 5.0, 5.0, {"amenity": "cafe"})],
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
