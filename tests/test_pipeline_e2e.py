"""End-to-end import of the reference's complete_db fixture.

Ports the import-phase assertions of /root/reference/test/completedb_test.go
(diff-phase assertions live in the streaming tests). Fixture:
test/complete_db.osm + complete_db_mapping.json.
"""

import pytest
from pyspark.sql import functions as F

from imposm3_spark.geom import py_geom, wkb as wkblib
from imposm3_spark.mapping.config import load_mapping
from imposm3_spark.pipeline.engine import ImportPipeline
from imposm3_spark.sources.osm_xml import read_osm_xml

FIXTURE = "/root/reference/test/complete_db.osm"
MAPPING = "/root/reference/test/complete_db_mapping.json"

MISSING = object()


@pytest.fixture(scope="module")
def tables(spark):
    mapping = load_mapping(MAPPING)
    nodes, ways, relations = read_osm_xml(spark, FIXTURE)
    pipe = ImportPipeline(mapping, srid=3857)
    out = pipe.run(nodes, ways, relations)
    return {name: df.cache() for name, df in out.items()}


def rows_of(tables, name, osm_id):
    return tables[name].filter(F.col("osm_id") == osm_id).collect()


def assert_records(tables, checks):
    """checks: (table, osm_id, expected_type_or_MISSING)"""
    for table, osm_id, expected in checks:
        rows = rows_of(tables, table, osm_id)
        if expected is MISSING:
            assert not rows, f"{table}/{osm_id}: expected missing, got {rows}"
        else:
            assert len(rows) == 1, f"{table}/{osm_id}: expected 1 row, got {rows}"
            assert rows[0]["type"] == expected, f"{table}/{osm_id}: {rows[0]['type']!r} != {expected!r}"


def geom_area(row):
    parsed = wkblib.parse_wkb(bytes(row["geometry"]))
    if parsed["type"] == "Polygon":
        polys = [parsed["coords"]]
    elif parsed["type"] == "MultiPolygon":
        polys = parsed["coords"]
    else:
        return 0.0
    return py_geom.multipolygon_area(polys)


def test_tables_produced(tables):
    for t in ("roads", "landusages", "amenities", "buildings", "admin", "waterareas"):
        assert t in tables, f"missing table {t}: have {sorted(tables)}"


def test_only_new_style_multipolygon(tables):
    # completedb_test.go:85-91
    assert_records(
        tables,
        [
            ("landusages", -1001, "wood"),
            ("landusages", -1011, MISSING),
            ("landusages", -1021, MISSING),
        ],
    )


def test_landusage_to_waterarea_import(tables):
    # completedb_test.go:93-120 (import state)
    assert_records(
        tables,
        [
            ("waterareas", 11001, MISSING),
            ("waterareas", -13001, MISSING),
            ("landusages", 11001, "park"),
            ("landusages", -13001, "park"),
        ],
    )


def test_changed_hole_tags_import(tables):
    # completedb_test.go:122-135: multipolygon relation with untagged hole
    assert_records(
        tables,
        [
            ("waterareas", 14011, MISSING),
            ("waterareas", -14011, MISSING),
            ("landusages", 14001, "park"),
            ("landusages", -14001, MISSING),
        ],
    )


def test_split_outer_multipolygon_way(tables):
    # completedb_test.go:137-144
    assert_records(
        tables,
        [("roads", 15002, MISSING), ("landusages", -15001, "park")],
    )
    rows = rows_of(tables, "landusages", -15001)
    assert abs(geom_area(rows[0]) - 9816216452) / 9816216452 < 0.005


def test_merge_outer_multipolygon_way(tables):
    # completedb_test.go:146-153
    assert_records(
        tables,
        [("landusages", -16001, "park"), ("roads", 16002, "residential")],
    )
    rows = rows_of(tables, "landusages", -16001)
    assert abs(geom_area(rows[0]) - 12779350582) / 12779350582 < 0.005


def test_broken_multipolygon_ways(tables):
    # completedb_test.go:155-170
    assert_records(
        tables,
        [
            ("landusages", -17001, MISSING),
            ("roads", 17001, "residential"),
            ("roads", 17002, MISSING),
            ("landusages", -17101, MISSING),
            ("roads", 17101, "residential"),
            ("roads", 17102, MISSING),
        ],
    )


def test_way_with_invalid_layer(tables):
    # completedb_test.go:172-177: layer not a valid int32 -> z_order NULL...
    # actually z_order = rank only (layer parse fails -> 0)
    rows = rows_of(tables, "roads", 17003)
    assert len(rows) == 1
    assert rows[0]["z_order"] is None


def test_node_way_inserted_twice(tables):
    # completedb_test.go:179-185: way with two mappings -> two rows, same table
    rows = sorted(rows_of(tables, "roads", 18001), key=lambda r: r["type"])
    assert [r["type"] for r in rows] == ["residential", "tram"]


def test_outer_way_inserted_twice(tables):
    # completedb_test.go:187-196
    assert_records(
        tables,
        [
            ("landusages", -19001, "farmland"),
            ("landusages", 19002, "farmyard"),
            ("landusages", 19001, "farm"),
        ],
    )


def test_outer_way_inserted(tables):
    # completedb_test.go:198-205
    assert_records(
        tables,
        [
            ("landusages", 19101, "farm"),
            ("landusages", 19102, "farmyard"),
            ("admin", -19101, "administrative"),
        ],
    )
