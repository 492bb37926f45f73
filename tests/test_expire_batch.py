"""Tile expiry wired through a diff batch (T7 in apply_batch context)."""

import pytest
from pyspark.sql import functions as F

from imposm3_spark.diff.update import (
    OsmState,
    apply_changes_to_state,
    compute_frontier,
    expired_tiles_for_batch,
)
from imposm3_spark.expire.tiles import point_tiles
from imposm3_spark.mapping.config import load_mapping_str
from imposm3_spark.pipeline.engine import ImportPipeline
from imposm3_spark.sources.osm_xml import CHANGE_SCHEMA, NODE_SCHEMA, WAY_SCHEMA

MAPPING = """
tables:
  pois:
    type: point
    mapping: {amenity: [cafe]}
    columns: [{name: osm_id, type: id}]
  paths:
    type: linestring
    mapping: {highway: [path]}
    columns: [{name: osm_id, type: id}]
"""


def test_expired_tiles_for_batch(spark):
    mapping = load_mapping_str(MAPPING)
    pipe = ImportPipeline(mapping)
    nodes = spark.createDataFrame(
        [
            (1, 3.0010, 1.0010, {"amenity": "cafe"}, None),
            (10, 3.0, 2.0, {}, None),
            (11, 3.05, 2.0, {}, None),
        ],
        NODE_SCHEMA,
    )
    ways = spark.createDataFrame([(100, [10, 11], {"highway": "path"}, None)], WAY_SCHEMA)
    rels = spark.createDataFrame(
        [], "id bigint, members array<struct<id:bigint,type:tinyint,role:string>>, tags map<string,string>"
    )
    state = OsmState(nodes, ways, rels)

    # the batch moves node 1 and node 10 (which drags way 100 into the frontier)
    changes = spark.createDataFrame(
        [
            (0, "modify", "node", (1, 3.5, 1.5, {"amenity": "cafe"}, None), None, None),
            (1, "modify", "node", (10, 3.01, 2.0, {}, None), None, None),
        ],
        CHANGE_SCHEMA,
    )
    new_state = apply_changes_to_state(state, changes)
    frontier = compute_frontier(state, new_state, changes)
    tiles = {(r["z"], r["x"], r["y"]) for r in expired_tiles_for_batch(pipe, state, new_state, frontier).collect()}

    # old and new node positions both expired
    assert set(point_tiles(3.0010, 1.0010, 14)) <= tiles
    assert set(point_tiles(3.5, 1.5, 14)) <= tiles
    # the dependent way's line tiles (old and new first-node) expired
    assert set(point_tiles(3.05, 2.0, 14)) & tiles  # shared endpoint region
    # node 10 is UNMAPPED: it expires only through way 100's line walk,
    # not as its own padded point (match-aware expiry,
    # test/expire_tiles_test.go:100-104)
    assert len(tiles) >= 5
