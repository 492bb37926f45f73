"""Mapping DSL vectors from /root/reference/mapping/filter_test.go and
filter_tags_test.go — tag prefilter keep/drop matrices and require/reject/
regexp element filters, evaluated through the compiled Spark expressions."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from imposm3_spark.mapping.config import load_mapping_str
from imposm3_spark.mapping.matcher import (
    LINESTRING,
    POINT,
    compile_match_units,
    table_filter_expr,
    tag_prefilter_expr,
)

TAGS_SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)


def run_prefilter(spark, mapping, kind, cases):
    df = spark.createDataFrame(list(enumerate(cases)), TAGS_SCHEMA)
    out = df.select("i", tag_prefilter_expr(mapping, kind, F.col("tags")).alias("t")).collect()
    return [dict(r["t"]) for r in sorted(out, key=lambda r: r["i"])]


NODE_FILTER_MAPPING = """
tables:
  places:
    type: point
    columns:
    - {key: name, name: name, type: string}
    - {name: z_order, type: enumerate, args: {values: [village, town, city, county]}}
    - {key: population, name: population, type: integer}
    mapping:
      place: [city, town, village]
  transport_points:
    type: point
    columns: []
    mapping:
      highway: [bus_stop]
  highways:
    type: linestring
    mapping:
      highway: [__any__]
"""


def test_tag_filter_nodes(spark):
    # filter_test.go:11-69
    m = load_mapping_str(NODE_FILTER_MAPPING)
    cases = [
        ({}, {}),
        ({"name": "foo"}, {"name": "foo"}),
        ({"name": "foo", "unknown": "foo"}, {"name": "foo"}),
        ({"place": "unknown"}, {}),
        ({"place": "village"}, {"place": "village"}),
        ({"population": "1000"}, {"population": "1000"}),
        ({"highway": "bus_stop"}, {"highway": "bus_stop"}),
        ({"highway": "residential"}, {}),
    ]
    results = run_prefilter(spark, m, "node", [c[0] for c in cases])
    for (tags, expected), result in zip(cases, results):
        assert result == expected, f"{tags}: {result} != {expected}"


WAY_FILTER_MAPPING = """
tables:
  buildings:
    type: polygon
    mapping:
      building: [__any__]
  highways:
    type: linestring
    columns:
    - {key: name, name: name, type: string}
    - {key: tunnel, name: tunnel, type: boolint}
    - {key: oneway, name: oneway, type: direction}
    mapping:
      highway: [track]
  places:
    type: point
    mapping:
      place: [city, town, village]
"""


def test_tag_filter_ways(spark):
    # filter_test.go:71-127
    m = load_mapping_str(WAY_FILTER_MAPPING)
    cases = [
        ({}, {}),
        ({"name": "foo"}, {"name": "foo"}),
        ({"name": "foo", "unknown": "foo"}, {"name": "foo"}),
        ({"highway": "unknown"}, {}),
        ({"highway": "track"}, {"highway": "track"}),
        ({"building": "whatever"}, {"building": "whatever"}),
        ({"place": "village"}, {}),
        ({"oneway": "yes", "tunnel": "1"}, {"oneway": "yes", "tunnel": "1"}),
    ]
    results = run_prefilter(spark, m, "way", [c[0] for c in cases])
    for (tags, expected), result in zip(cases, results):
        assert result == expected, f"{tags}: {result} != {expected}"


REL_FILTER_MAPPING = """
tags:
  include: [source]
tables:
  landuse:
    type: polygon
    mapping:
      landuse: [farm]
  buildings:
    type: polygon
    columns:
    - {key: name, type: string, name: name}
    mapping:
      building: [__any__]
  highways:
    type: linestring
    mapping:
      highway: [track]
  places:
    type: point
    mapping:
      place: [city, town, village]
"""


def test_tag_filter_relations(spark):
    # filter_test.go:129-187
    m = load_mapping_str(REL_FILTER_MAPPING)
    cases = [
        ({}, {}),
        ({"name": "foo"}, {"name": "foo"}),
        ({"unknown": "foo"}, {}),
        ({"landuse": "unknown"}, {}),
        ({"highway": "track"}, {"highway": "track"}),
        ({"place": "town"}, {}),
        ({"landuse": "farm"}, {"landuse": "farm"}),
        (
            {"landuse": "farm", "type": "multipolygon"},
            {"landuse": "farm", "type": "multipolygon"},
        ),
        ({"type": "multipolygon"}, {"type": "multipolygon"}),
        ({"type": "boundary"}, {"type": "boundary"}),
        ({"building": "yes"}, {"building": "yes"}),
        ({"source": "JOSM"}, {"source": "JOSM"}),
    ]
    results = run_prefilter(spark, m, "relation", [c[0] for c in cases])
    for (tags, expected), result in zip(cases, results):
        assert result == expected, f"{tags}: {result} != {expected}"


# ---- require/reject/regexp element filters (filter_tags_test.go) ----


def run_filter_matcher(spark, mapping_yaml, cases, table_type=LINESTRING, closed=False):
    """True per case iff any match unit accepts the tags."""
    m = load_mapping_str(mapping_yaml)
    units = compile_match_units(m, table_type)
    df = spark.createDataFrame(list(enumerate(cases)), TAGS_SCHEMA)
    accept = F.lit(False)
    for unit in units:
        match = unit.match_expr(F.col("tags"))
        ok = match.isNotNull() & table_filter_expr(
            m, unit.table, F.col("tags"), match["key"], F.lit(closed), relation=False
        )
        accept = accept | ok
    rows = df.select("i", accept.alias("ok")).collect()
    return [r["ok"] for r in sorted(rows, key=lambda r: r["i"])]


REQUIRE_MAPPING = """
tables:
  admin:
    fields:
    - {name: id, type: id}
    - {key: admin_level, name: admin_level, type: integer}
    filters:
      require:
        boundary: ["administrative", "maritime"]
    mapping:
      admin_level: ['2', '4']
    type: linestring
"""


def test_filters_require(spark):
    # filter_tags_test.go:11-55
    accept = [
        {"admin_level": "2", "boundary": "administrative"},
        {"admin_level": "2", "boundary": "maritime"},
        {"admin_level": "4", "boundary": "administrative", "name": "N4"},
    ]
    reject = [
        {"admin_level": "0", "boundary": "administrative"},
        {"admin_level": "2", "boundary": "postal_code"},
        {"admin_level": "2", "boundary": ""},
        {"admin_level": "2"},
        {"admin_level": "__any__", "boundary": "__any__"},
        {"boundary": "administrative"},
        {"name": "maritime"},
    ]
    results = run_filter_matcher(spark, REQUIRE_MAPPING, accept + reject)
    assert results == [True] * len(accept) + [False] * len(reject)


BUILDING_MAPPING = r"""
tables:
  buildings:
    fields:
    - {name: id, type: id}
    - {key: building, name: building, type: string}
    filters:
      reject:
        building: ["no", "none"]
      require_regexp:
        'addr:housenumber': '^\d+[a-zA-Z,]*$'
        building: '^[a-z_]+$'
    mapping:
      building: [__any__]
    type: linestring
"""


def test_filters_building_reject_and_regexp(spark):
    # filter_tags_test.go:105-190 (subset)
    accept = [
        {"building": "yes", "addr:housenumber": "1a"},
        {"building": "house", "addr:housenumber": "131"},
        {"building": "garage", "addr:housenumber": "0"},
        {"building": "_", "addr:housenumber": "333"},
    ]
    reject = [
        {"building": "no", "addr:housenumber": "1a"},
        {"building": "none", "addr:housenumber": "1a"},
        {"building": "yes"},  # missing required housenumber
        {"building": "yes", "addr:housenumber": "a1"},  # regexp fails
        {"building": "Yes", "addr:housenumber": "1"},  # uppercase fails regexp
    ]
    results = run_filter_matcher(spark, BUILDING_MAPPING, accept + reject)
    assert results == [True] * len(accept) + [False] * len(reject)
