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
    from imposm3_spark.pipeline.generalize import build_generalized_tables

    mapping = load_mapping(MAPPING)
    nodes, ways, relations = read_osm_xml(spark, FIXTURE)
    pipe = ImportPipeline(mapping, srid=3857)
    out = pipe.run(nodes, ways, relations)
    out = {name: df.cache() for name, df in out.items()}
    out.update(build_generalized_tables(mapping, out))
    return out


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


def geom_length(row):
    parsed = wkblib.parse_wkb(bytes(row["geometry"]))
    assert parsed["type"] == "LineString"
    return py_geom.line_length(parsed["coords"])


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
    assert abs(geom_area(rows[0]) - 9816216452) < 1


def test_merge_outer_multipolygon_way(tables):
    # completedb_test.go:146-153
    assert_records(
        tables,
        [("landusages", -16001, "park"), ("roads", 16002, "residential")],
    )
    rows = rows_of(tables, "landusages", -16001)
    assert abs(geom_area(rows[0]) - 12779350582) < 1


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


def test_node_way_ref_import_state(tables):
    # completedb_test.go:207-222 (record part)
    assert_records(
        tables,
        [("roads", 20001, "residential"), ("barrierpoints", 20001, "block")],
    )


def test_way_rel_ref_import_state(tables):
    # completedb_test.go:224-236
    assert_records(
        tables,
        [("roads", 21001, "residential"), ("landusages", -21001, "park")],
    )


def test_old_style_mp_relation_way_inserted(tables):
    # completedb_test.go:239-248
    assert_records(
        tables,
        [
            ("landusages", -9001, "park"),
            ("landusages", 9009, "park"),
            ("landusages", -9101, "park"),
            ("landusages", 9109, "park"),
            ("landusages", 9110, "scrub"),
        ],
    )
    assert rows_of(tables, "landusages", -9001)[0]["name"] == "rel 9001"
    assert rows_of(tables, "landusages", 9009)[0]["name"] == "way 9009"


def test_relation_ways_inserted(tables):
    # completedb_test.go:250-262
    assert_records(
        tables,
        [
            ("landusages", -9201, "park"),
            ("landusages", 9201, MISSING),
            ("landusages", 9209, MISSING),
            ("landusages", 9210, MISSING),
            ("roads", 9209, "secondary"),
            ("roads", 9210, "residential"),
        ],
    )
    assert rows_of(tables, "landusages", -9201)[0]["name"] == ""


def test_relation_way_inserted(tables):
    # completedb_test.go:264-270
    assert_records(
        tables,
        [("landusages", -8001, "park"), ("roads", 8009, "residential")],
    )
    assert rows_of(tables, "landusages", -8001)[0]["name"] == "rel 8001"


def test_single_node_ways_not_inserted(tables):
    # completedb_test.go:272-279
    assert_records(
        tables,
        [
            ("landusages", 30001, MISSING),
            ("landusages", 30002, MISSING),
            ("landusages", 30003, MISSING),
        ],
    )


def test_polygon_with_duplicate_nodes_is_valid(tables):
    # completedb_test.go:281-284
    rows = rows_of(tables, "landusages", 30005)
    assert len(rows) == 1 and rows[0]["type"] == "park"
    assert geom_area(rows[0]) > 0


def test_incomplete_polygons(tables):
    # completedb_test.go:286-293
    assert_records(
        tables,
        [("landusages", 30004, MISSING), ("landusages", 30006, MISSING)],
    )


def test_relation_before_remove(tables):
    # completedb_test.go:306-313
    assert_records(
        tables,
        [("buildings", 50011, "yes"), ("landusages", -50021, "park")],
    )


def test_old_style_relation_ignored(tables):
    # completedb_test.go:315-322
    assert_records(
        tables,
        [("buildings", 50111, "yes"), ("buildings", -50121, MISSING)],
    )


def test_duplicate_ids_import(tables):
    # completedb_test.go:324-333: way and relation with the same id
    assert_records(
        tables,
        [
            ("buildings", 51001, "way"),
            ("buildings", -51001, "mp"),
            ("buildings", 51011, "way"),
            ("buildings", -51011, "mp"),
        ],
    )


def test_relation_updated_by_node_import(tables):
    # completedb_test.go:335-338
    rows = rows_of(tables, "buildings", -52121)
    assert len(rows) == 1
    assert abs(geom_area(rows[0]) - 13653930440.868315) < 1


def test_ring_with_gap(tables):
    # completedb_test.go:362-370: gap below maxGap closes for the relation,
    # the (unclosed) way itself is not inserted
    assert len(rows_of(tables, "landusages", -7301)) == 1
    assert_records(tables, [("landusages", 7311, MISSING)])


def test_multipolygon_with_open_ring(tables):
    # completedb_test.go:372-375
    assert len(rows_of(tables, "landusages", -7401)) == 1


def test_updated_nodes_zigzag_length(tables):
    # completedb_test.go:377-380
    rows = rows_of(tables, "roads", 60000)
    assert len(rows) == 1
    assert abs(geom_length(rows[0]) - 14035.61150207768) < 1


def test_generalized_linestring_source_length(tables):
    # completedb_test.go:349-360 (base table part)
    # (the Go helper ignores the type field for geom asserts)
    rows = rows_of(tables, "roads", 7201)
    assert len(rows) == 1
    assert abs(geom_length(rows[0]) - 1243660.044819) < 1


def test_update_node_to_coord_import(tables):
    # completedb_test.go:382-388
    assert_records(
        tables,
        [("amenities", 70001, "police"), ("amenities", 70002, MISSING)],
    )


def test_enumerate_key(tables):
    # completedb_test.go:390-397
    rows = {r["osm_id"]: r for r in tables["landusages"].filter(F.col("osm_id").isin(100001, 100002, 100003)).collect()}
    assert rows[100001]["type"] == "park" and rows[100001]["enum"] == 1
    assert rows[100002]["type"] == "park" and rows[100002]["enum"] == 0
    assert rows[100003]["type"] == "wood" and rows[100003]["enum"] == 15


def test_area_mapping(tables):
    # completedb_test.go:399-419: type-dependent area defaults
    assert_records(
        tables,
        [
            ("roads", 301151, "pedestrian"),
            ("landusages", 301151, MISSING),
            ("roads", 301152, MISSING),
            ("landusages", 301152, "pedestrian"),
            ("roads", 301153, MISSING),
            ("landusages", 301153, "track"),
            ("roads", 301154, "track"),
            ("landusages", 301154, MISSING),
        ],
    )


def test_landusage_to_waterarea_gen_import(tables):
    # completedb_test.go:93-120 (generalized tables)
    assert_records(
        tables,
        [
            ("waterareas_gen0", 11001, MISSING),
            ("waterareas_gen1", 11001, MISSING),
            ("landusages_gen0", 11001, "park"),
            ("landusages_gen0", -13001, "park"),
            ("landusages_gen1", 11001, "park"),
            ("landusages_gen1", -13001, "park"),
        ],
    )


def test_generalized_banana_polygon_is_valid(tables):
    # completedb_test.go:340-347: self-touching polygon survives import and
    # generalization
    assert len(rows_of(tables, "landusages", 7101)) == 1
    assert len(rows_of(tables, "landusages_gen0", 7101)) == 1
    assert len(rows_of(tables, "landusages_gen1", 7101)) == 1


def test_generalized_linestring_length(tables):
    # completedb_test.go:349-360: geometry survives simplification
    for table in ("roads_gen0", "roads_gen1"):
        rows = rows_of(tables, table, 7201)
        assert len(rows) == 1, table
        assert abs(geom_length(rows[0]) - 1243660.044819) < 1, table


def test_residential_not_generalized(tables):
    # completedb_test.go:295-304: residential road filtered out of gen tables
    assert_records(
        tables,
        [
            ("roads", 40001, "residential"),
            ("roads_gen0", 40001, MISSING),
            ("roads_gen1", 40002, MISSING),
        ],
    )


def test_hstore_tags(tables):
    # completedb_test.go:421-427
    rows = rows_of(tables, "buildings", 401151)
    assert len(rows) == 1
    assert '"amenity"=>"fuel"' in rows[0]["tags"]
    assert '"opening_hours"=>"24/7"' in rows[0]["tags"]
