"""type_mappings routing for `geometry`-type tables (mapping/mapping.go:75-82,
config/config.go TypeMappings): one table declares per-kind tag rules —
points/linestrings/polygons each contribute their own match set, so the same
table accepts a shop node as a point AND a shop closed way as a polygon while
rejecting a shop open way (shop is absent from `linestrings`).

The single_table fixture is the reference's own type_mappings exercise
(test/single_table_mapping.json:30-44)."""

import pytest
from pyspark.sql import functions as F

from imposm3_spark.mapping.config import load_mapping, load_mapping_str
from imposm3_spark.mapping.matcher import (
    LINESTRING,
    POINT,
    POLYGON,
    compile_match_units,
)
from imposm3_spark.pipeline.engine import ImportPipeline
from imposm3_spark.sources.osm_xml import NODE_SCHEMA, WAY_SCHEMA

MAPPING = load_mapping("/root/reference/test/single_table_mapping.json")


def _rule_keys(units):
    return {r.key for u in units for r in u.rules}


def test_per_kind_rules_compile_separately():
    # points: amenity/poi/shop; linestrings: highway; polygons: landuse/building/shop
    assert _rule_keys(compile_match_units(MAPPING, POINT)) == {"amenity", "poi", "shop"}
    assert _rule_keys(compile_match_units(MAPPING, LINESTRING)) == {"highway"}
    assert _rule_keys(compile_match_units(MAPPING, POLYGON)) == {
        "landuse",
        "building",
        "shop",
    }


@pytest.fixture(scope="module")
def routed(spark):
    """Minimal fixture that hits every routing cell: shop node (point rule),
    shop open way (no linestring rule -> dropped), shop closed way (polygon
    rule), highway open way (linestring rule), highway node (dropped)."""
    nodes = spark.createDataFrame(
        [
            (1, 10.0, 50.0, {"shop": "bakery"}, None),
            (2, 10.1, 50.0, {"highway": "bus_stop"}, None),
            (10, 10.0, 50.0, {}, None),
            (11, 10.1, 50.0, {}, None),
            (12, 10.1, 50.1, {}, None),
            (13, 10.0, 50.1, {}, None),
        ],
        NODE_SCHEMA,
    )
    ways = spark.createDataFrame(
        [
            (100, [10, 11], {"shop": "mall"}, None),  # open: not a linestring rule
            (101, [10, 11, 12, 13, 10], {"shop": "mall"}, None),  # closed: polygon
            (102, [10, 11], {"highway": "residential"}, None),  # open: linestring
        ],
        WAY_SCHEMA,
    )
    rels = spark.createDataFrame(
        [],
        "id bigint, members array<struct<id:bigint,type:tinyint,role:string>>, "
        "tags map<string,string>, metadata struct<user_id:int,user_name:string,"
        "version:int,timestamp:bigint,changeset:bigint>",
    )
    out = ImportPipeline(MAPPING, srid=3857).run(nodes, ways, rels)
    return {r["osm_id"]: r for r in out["all"].collect()}


def test_shop_node_routes_as_point(routed):
    assert 1 in routed  # single-id-space: node keeps its id


def test_highway_node_dropped(routed):
    assert 2 not in routed  # highway only in linestrings


def test_shop_open_way_dropped(routed):
    assert -100 not in routed and 100 not in routed


def test_shop_closed_way_routes_as_polygon(routed):
    assert -101 in routed  # way ids negated in single id space


def test_highway_open_way_routes_as_linestring(routed):
    assert -102 in routed


def test_geometry_table_without_per_kind_rules_matches_nothing(spark):
    """A geometry table with empty type_mappings and no main mapping has no
    rules at all — compile_match_units must yield zero units, not a
    match-everything unit."""
    m = load_mapping_str(
        """
        {"tables": {"empty": {
            "type": "geometry",
            "columns": [{"type": "id", "name": "osm_id", "key": null},
                        {"type": "geometry", "name": "geometry", "key": null}]
        }}}
        """,
        fmt="json",
    )
    for tt in (POINT, LINESTRING, POLYGON):
        assert compile_match_units(m, tt) == []
