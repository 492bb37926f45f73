"""Expire-tiles e2e: import expire_tiles.osm, apply expire_tiles.osc,
assert the EXACT expired tile set — a port of
/root/reference/test/expire_tiles_test.go:17-170 (CheckExpireFile),
including the no-unexpected-tiles sweep."""

import pytest
from pyspark.sql import functions as F

from imposm3_spark.diff.update import (
    OsmState,
    apply_changes_to_state,
    compute_frontier,
    expired_tiles_for_batch,
)
from imposm3_spark.mapping.config import load_mapping
from imposm3_spark.pipeline.engine import ImportPipeline
from imposm3_spark.sources.osm_xml import read_osc_xml, read_osm_xml

FIXTURE = "/root/reference/test/expire_tiles.osm"
CHANGES = "/root/reference/test/expire_tiles.osc"
MAPPING = "/root/reference/test/expire_tiles_mapping.yml"


@pytest.fixture(scope="module")
def batch(spark):
    mapping = load_mapping(MAPPING)
    pipe = ImportPipeline(mapping, srid=3857)
    nodes, ways, relations = read_osm_xml(spark, FIXTURE)
    state = OsmState(nodes, ways, relations)
    changes = read_osc_xml(spark, CHANGES)
    new_state = apply_changes_to_state(state, changes)
    frontier = compute_frontier(state, new_state, changes)
    tiles = expired_tiles_for_batch(pipe, state, new_state, frontier, max_zoom=14)
    return pipe, state, new_state, {(r["z"], r["x"], r["y"]) for r in tiles.collect()}


def test_initial_import_tables(spark):
    """Elements subtest (expire_tiles_test.go:61-73): roads + buildings
    rows exist after import."""
    mapping = load_mapping(MAPPING)
    pipe = ImportPipeline(mapping, srid=3857)
    nodes, ways, relations = read_osm_xml(spark, FIXTURE)
    out = pipe.run(nodes, ways, relations)
    road_ids = {r["osm_id"] for r in out["roads"].select("osm_id").collect()}
    assert {20151, 20251, 20351, 20651} <= road_ids
    bld_ids = {r["osm_id"] for r in out["buildings"].select("osm_id").collect()}
    assert {-30191, -30291, -30391, -30491} <= bld_ids


# (reason, [(x, y, z)...], expire?) — expire_tiles_test.go:95-147
CASES = [
    ("create node", [(8328, 8146, 14)], True),
    ("modify node (old)", [(8237, 8146, 14)], True),
    ("modify node (new)", [(8237, 8237, 14)], True),
    ("modify node to unmapped (old)", [(8373, 8146, 14), (8374, 8146, 14)], True),
    ("modify node to unmapped (new)", [(8373, 8146, 14), (8374, 8146, 14)], False),
    ("delete node", [(8282, 8146, 14), (8283, 8146, 14)], True),
    ("delete way", [(8283, 8100, 14)], True),
    ("modify way", [(8237, 8100, 14)], True),
    ("modify way from node (old)", [(8328, 8100, 14)], True),
    ("modify way from node (new)", [(8328, 8283, 14)], True),
    ("create way", [(8374, 8100, 14)], True),
    ("create long way", [(8419, 8100, 14), (8420, 8100, 14), (8421, 8100, 14)], True),
    ("delete way including its nodes", [(8465, 8100, 14)], True),
    ("modify relation", [(8237, 8055, 14)], True),
    ("delete relation", [(8283, 8055, 14)], True),
    ("modify relation from way", [(8328, 8055, 14)], True),
    ("modify relation from nodes (old)", [(8374, 8055, 14)], True),
    ("modify relation from nodes (new)", [(8374, 8328, 14)], True),
    (
        "create polygon (box)",
        [
            (8237, 8007, 14), (8237, 8008, 14), (8237, 8009, 14),
            (8238, 8007, 14), (8238, 8008, 14), (8238, 8009, 14),
            (8239, 8007, 14), (8239, 8008, 14), (8239, 8009, 14),
        ],
        True,
    ),
    (
        "create polygon (zoom out)",
        [
            (2073, 2002, 12), (2076, 1999, 12), (2076, 2000, 12),
            (2073, 2001, 12), (2070, 2000, 12), (2070, 2002, 12),
            (2071, 2002, 12), (2077, 1999, 12), (2073, 1997, 12),
            (2074, 1999, 12), (2075, 2001, 12), (2077, 1997, 12),
            (2071, 1997, 12), (2075, 1998, 12), (2073, 2000, 12),
            (2076, 1998, 12), (2074, 1998, 12), (2071, 2000, 12),
            (2076, 1997, 12), (2076, 2001, 12), (2075, 2002, 12),
            (2072, 1997, 12), (2076, 2002, 12), (2070, 1998, 12),
            (2074, 2000, 12), (2077, 2001, 12), (2075, 1997, 12),
            (2074, 1997, 12), (2071, 2001, 12), (2075, 1999, 12),
            (2072, 1999, 12), (2072, 2001, 12), (2077, 2000, 12),
            (2073, 1999, 12), (2077, 2002, 12), (2072, 2000, 12),
            (2071, 1999, 12), (2072, 1998, 12), (2075, 2000, 12),
            (2072, 2002, 12), (2071, 1998, 12), (2073, 1998, 12),
            (2070, 1999, 12), (2077, 1998, 12), (2074, 2002, 12),
            (2074, 2001, 12), (2070, 1997, 12), (2070, 2001, 12),
        ],
        True,
    ),
]


def test_exact_expired_tiles(batch):
    _pipe, _state, _new_state, tiles = batch
    remaining = set(tiles)
    for reason, case_tiles, expire in CASES:
        for x, y, z in case_tiles:
            if expire:
                assert (z, x, y) in tiles, f"missing expire tile for {reason} {(z, x, y)}"
                remaining.discard((z, x, y))
            else:
                # like the reference, the non-expire check runs against the
                # not-yet-claimed set (the same coords may be legitimately
                # expired by the OLD side of the change)
                assert (z, x, y) not in remaining, f"found expire tile for {reason} {(z, x, y)}"
    assert not remaining, f"unexpected tiles expired: {sorted(remaining)}"
