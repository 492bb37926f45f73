"""PBF source round-trip: encode the complete_db fixture to PBF, read it
back distributed, compare against the XML parse. This pins the wire format
(varint/zigzag/delta/string-table) without external fixtures."""

import pytest
from pyspark.sql import functions as F

from imposm3_spark.sources.osm_xml import read_osm_xml
from imposm3_spark.sources.pbf import read_pbf, scan_blobs, write_pbf

FIXTURE = "/root/reference/test/complete_db.osm"


@pytest.fixture(scope="module")
def pbf_path(spark, tmp_path_factory):
    nodes, ways, rels = read_osm_xml(spark, FIXTURE)
    n_rows = [(r["id"], r["lon"], r["lat"], dict(r["tags"])) for r in nodes.collect()]
    w_rows = [(r["id"], list(r["refs"]), dict(r["tags"])) for r in ways.collect()]
    r_rows = [
        (r["id"], [(m["id"], m["type"], m["role"]) for m in r["members"]], dict(r["tags"]))
        for r in rels.collect()
    ]
    path = str(tmp_path_factory.mktemp("pbf") / "complete_db.pbf")
    write_pbf(path, n_rows, w_rows, r_rows, block_size=500)
    return path, (nodes, ways, rels)


def test_blob_index(pbf_path):
    path, _ = pbf_path
    blobs = scan_blobs(path)
    assert blobs[0][0] == "OSMHeader"
    assert all(b[0] == "OSMData" for b in blobs[1:])
    assert len(blobs) > 2  # multiple data blocks at block_size=500


def test_roundtrip(spark, pbf_path):
    path, (nodes, ways, rels) = pbf_path
    n2, w2, r2 = read_pbf(spark, path)

    assert n2.count() == nodes.count()
    assert w2.count() == ways.count()
    assert r2.count() == rels.count()

    # coords survive within the PBF 100-nanodegree granularity
    orig = {r["id"]: (r["lon"], r["lat"]) for r in nodes.collect()}
    for row in n2.collect():
        lon, lat = orig[row["id"]]
        assert abs(row["lon"] - lon) < 1e-7 + 1e-12
        assert abs(row["lat"] - lat) < 1e-7 + 1e-12

    # tags and refs are exact
    ow = {r["id"]: (list(r["refs"]), dict(r["tags"])) for r in ways.collect()}
    for row in w2.collect():
        refs, tags = ow[row["id"]]
        assert list(row["refs"]) == refs
        assert dict(row["tags"]) == tags

    orels = {
        r["id"]: ([(m["id"], m["type"], m["role"]) for m in r["members"]], dict(r["tags"]))
        for r in rels.collect()
    }
    for row in r2.collect():
        members, tags = orels[row["id"]]
        assert [(m["id"], m["type"], m["role"]) for m in row["members"]] == members
        assert dict(row["tags"]) == tags


def test_pipeline_from_pbf(spark, pbf_path):
    """The import pipeline produces identical results from PBF input."""
    from imposm3_spark.mapping.config import load_mapping
    from imposm3_spark.pipeline.engine import ImportPipeline

    path, _ = pbf_path
    mapping = load_mapping("/root/reference/test/complete_db_mapping.json")
    n2, w2, r2 = read_pbf(spark, path)
    pipe = ImportPipeline(mapping, srid=3857)
    roads = pipe.way_tables(w2, pipe.prepare_coords(n2))["roads"]
    rows = sorted(
        roads.filter(F.col("osm_id") == 18001).collect(), key=lambda r: r["type"]
    )
    assert [r["type"] for r in rows] == ["residential", "tram"]
