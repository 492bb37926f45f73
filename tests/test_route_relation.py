"""Import-phase assertions from /root/reference/test/route_relation_test.go
(relation and relation_member tables). Diff-phase assertions come with the
streaming path.
"""

import math

import pytest
from pyspark.sql import functions as F

from imposm3_spark.geom import wkb as wkblib
from imposm3_spark.mapping.config import load_mapping
from imposm3_spark.pipeline.engine import ImportPipeline
from imposm3_spark.sources.osm_xml import read_osm_xml

FIXTURE = "/root/reference/test/route_relation.osm"
MAPPING = "/root/reference/test/route_relation_mapping.yml"


@pytest.fixture(scope="module")
def tables(spark):
    mapping = load_mapping(MAPPING)
    nodes, ways, relations = read_osm_xml(spark, FIXTURE)
    pipe = ImportPipeline(mapping, srid=3857)
    out = pipe.run(nodes, ways, relations)
    return {name: df.cache() for name, df in out.items()}


def test_relation_data(tables):
    # route_relation_test.go:65-77 — hstore tags of the relation rows
    rows = tables["routes"].filter(F.col("osm_id") == -100901).collect()
    assert len(rows) == 1
    assert '"name"=>"Bus 301: A => B"' in rows[0]["tags"]

    rows = tables["routes"].filter(F.col("osm_id") == -100911).collect()
    assert len(rows) == 1
    assert '"name"=>"Bus 301"' in rows[0]["tags"]


def test_member_updated_by_node(tables):
    # route_relation_test.go:79-89 (import state): node member with name
    rows = (
        tables["route_members"]
        .filter((F.col("osm_id") == -110901) & (F.col("member") == 110101))
        .collect()
    )
    assert len(rows) == 1
    assert rows[0]["name"] == "Stop"


def test_member_geom(tables):
    # route_relation_test.go:91-106: way member geometry length (mercator)
    rows = (
        tables["route_members"]
        .filter((F.col("osm_id") == -100902) & (F.col("member") == 100502))
        .collect()
    )
    assert len(rows) == 1
    parsed = wkblib.parse_wkb(bytes(rows[0]["geometry"]))
    assert parsed["type"] == "LineString"
    coords = parsed["coords"]
    length = sum(
        math.hypot(coords[i + 1][0] - coords[i][0], coords[i + 1][1] - coords[i][1])
        for i in range(len(coords) - 1)
    )
    assert abs(length - 111.32448543701321) < 1e-8

    # member without name -> from_member column is ''
    rows = (
        tables["route_members"]
        .filter((F.col("osm_id") == -100902) & (F.col("member") == 100503))
        .collect()
    )
    assert len(rows) == 1
    assert rows[0]["name"] == ""


def test_no_route_with_missing_member(tables):
    # route_relation_test.go:108-114: all-or-nothing member import
    rows = (
        tables["route_members"]
        .filter((F.col("osm_id") == -120901) & (F.col("member") == 120101))
        .collect()
    )
    assert rows == []


def test_master_route_members(tables):
    # master_routes table: relation members of the route_master relation
    rows = tables["master_routes"].filter(F.col("osm_id") == -100911).collect()
    assert len(rows) >= 1
    # member relation's name comes through from_member
    by_member = {r["member"]: r for r in rows}
    assert 100901 in by_member
    assert by_member[100901]["subname"] == "Bus 301: A => B"
