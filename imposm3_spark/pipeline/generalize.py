"""Generalized tables (SURVEY §2.4 A6; reference: database/postgis/
postgis.go:249-362, columns.go:46-64).

Each generalized table is `SELECT <cols> FROM <source> WHERE <sql_filter>`
with geometry columns passed through ST_SimplifyPreserveTopology(tol) and
validated_geometry additionally through buffer(0). Gen-of-gen sources are
materialized in topological order (postgis.go:550-565).

Spark shape: a per-table DataFrame transform — simplification is a pandas
UDF over the WKB column (row-parallel, no shuffle); the sql_filter is
evaluated by Catalyst after rewriting the PostGIS-only `ST_Area(geometry)`
call onto a computed area column.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, DoubleType

from imposm3_spark.geom import py_geom, wkb as wkblib
from imposm3_spark.mapping.config import Mapping, Table


def _simplify_parsed(parsed: dict, tolerance: float, validated: bool) -> bytes | None:
    srid = parsed["srid"]
    t = parsed["type"]
    if t == "Point":
        return None  # unchanged marker
    if t == "LineString":
        out = py_geom.simplify_dp(parsed["coords"], tolerance)
        return wkblib.linestring_wkb(out, srid)
    if t == "Polygon":
        rings = [py_geom.simplify_ring(r, tolerance) for r in parsed["coords"]]
        if validated:
            return _revalidate(rings, srid)
        return wkblib.polygon_wkb(rings, srid)
    if t == "MultiPolygon":
        polys = [[py_geom.simplify_ring(r, tolerance) for r in p] for p in parsed["coords"]]
        if validated:
            flat: list[list] = [r for p in polys for r in p]
            return _revalidate(flat, srid)
        return wkblib.multipolygon_wkb(polys, srid)
    return None


def _revalidate(rings: list[list], srid: int | None) -> bytes:
    """buffer(0) analog after simplification (validated_geometry columns):
    re-split any ring the simplification made self-intersecting."""
    out_polys: list[list[list]] = []
    shells: list[py_geom.Ring] = []
    for ring in rings:
        shells.extend(py_geom.make_valid_rings(ring))
    for r in shells:
        r.area = py_geom.ring_area(r.coords)
    shells.sort(key=lambda r: -r.area)
    if not shells:
        return wkblib.polygon_wkb([], srid)
    out_polys, _ = py_geom.build_multipolygon(shells)
    if len(out_polys) == 1:
        return wkblib.polygon_wkb(out_polys[0], srid)
    return wkblib.multipolygon_wkb(out_polys, srid)


def make_simplify_udf(tolerance: float, validated: bool):
    @pandas_udf(BinaryType())
    def simplify(wkb_col: pd.Series) -> pd.Series:
        out = []
        for buf in wkb_col:
            if buf is None:
                out.append(None)
                continue
            parsed = wkblib.parse_wkb(bytes(buf))
            enc = _simplify_parsed(parsed, tolerance, validated)
            out.append(bytes(buf) if enc is None else enc)
        return pd.Series(out, dtype=object)

    return simplify


@pandas_udf(DoubleType())
def wkb_area_udf(wkb_col: pd.Series) -> pd.Series:
    out = []
    for buf in wkb_col:
        if buf is None:
            out.append(0.0)
            continue
        parsed = wkblib.parse_wkb(bytes(buf))
        if parsed["type"] == "Polygon":
            out.append(py_geom.multipolygon_area([parsed["coords"]]))
        elif parsed["type"] == "MultiPolygon":
            out.append(py_geom.multipolygon_area(parsed["coords"]))
        else:
            out.append(0.0)
    return pd.Series(out)


_ST_AREA_RE = re.compile(r"ST_Area\s*\(\s*geometry\s*\)", re.IGNORECASE)


def _rewrite_sql_filter(sql_filter: str) -> str:
    """PostGIS sql_filter -> Spark SQL: ST_Area(geometry) becomes the
    computed __geom_area column; everything else (type IN (...), class
    IN (...)) is plain SQL."""
    return _ST_AREA_RE.sub("__geom_area", sql_filter)


def generalization_order(mapping: Mapping) -> list[str]:
    """Topological order: tables sourced from base tables first, then
    gen-of-gen layers (postgis.go:258-301)."""
    remaining = dict(mapping.generalized_tables)
    done: list[str] = []
    while remaining:
        progressed = False
        for name, gt in list(remaining.items()):
            if gt.source not in remaining:
                done.append(name)
                del remaining[name]
                progressed = True
        if not progressed:
            raise ValueError(f"cyclic generalized_tables: {sorted(remaining)}")
    return done


def _geometry_cols(table: Table) -> dict[str, bool]:
    """geometry column name -> is_validated."""
    out = {}
    for col in table.columns:
        if col.type == "geometry":
            out[col.name] = False
        elif col.type == "validated_geometry":
            out[col.name] = True
    return out


def _root_base_table(mapping: Mapping, name: str) -> Table:
    """Base (non-generalized) table a gen chain roots in — column types
    come from there (postgis.go:249-302)."""
    base = mapping.generalized_tables[name].source
    while base in mapping.generalized_tables:
        base = mapping.generalized_tables[base].source
    return mapping.tables[base]


def _generalize_df(df: DataFrame, gt, base_table: Table) -> DataFrame:
    """The gen-table SELECT body: sql_filter + per-geometry simplify."""
    if gt.sql_filter:
        df = (
            df.withColumn("__geom_area", wkb_area_udf(F.col("geometry")))
            .filter(F.expr(_rewrite_sql_filter(gt.sql_filter)))
            .drop("__geom_area")
        )
    for col_name, validated in _geometry_cols(base_table).items():
        df = df.withColumn(
            col_name, make_simplify_udf(gt.tolerance, validated)(F.col(col_name))
        )
    return df


def build_generalized_tables(
    mapping: Mapping, tables: dict[str, DataFrame]
) -> dict[str, DataFrame]:
    """Materialize every generalized table from the base output tables."""
    out: dict[str, DataFrame] = {}
    for name in generalization_order(mapping):
        gt = mapping.generalized_tables[name]
        src_df = out.get(gt.source) or tables.get(gt.source)
        if src_df is None:
            continue
        out[name] = _generalize_df(src_df, gt, _root_base_table(mapping, name))
    return out


def _id_column(table: Table) -> str:
    """Name of the source table's id-typed column (spec.go:201-213 —
    the reference panics when missing; we raise)."""
    for col in table.columns:
        if col.type == "id":
            return col.name
    raise ValueError(f"table {table.name} has no id column for gen refresh")


def refresh_generalized_tables(
    mapping: Mapping,
    gens: dict[str, DataFrame],
    tables: dict[str, DataFrame],
    affected_ids: dict[str, DataFrame],
) -> dict[str, DataFrame]:
    """Per-id incremental gen refresh (SURVEY §2.3 J7, §2.8 T6; reference
    postgis.go:463-523 updatedIDs + spec.go DeleteSQL/InsertSQL): for each
    gen table, DELETE the affected osm_ids, then re-INSERT the
    generalization of just those rows from the (already updated) source.

    gens: previous gen tables; tables: NEW base tables (post apply_batch);
    affected_ids: table-type -> DataFrame(osm_id) as produced by
    diff.update.affected_osm_ids. Gen-of-gen sources read the refreshed
    parent (topological order), exactly like the reference's dependency-
    ordered worker pool."""
    out: dict[str, DataFrame] = {}
    for name in generalization_order(mapping):
        gt = mapping.generalized_tables[name]
        base_table = _root_base_table(mapping, name)
        src_df = out.get(gt.source) or tables.get(gt.source)
        old = gens.get(name)
        if src_df is None:
            if old is not None:
                out[name] = old
            continue
        ids = affected_ids.get(base_table.type)
        if old is None or ids is None:
            out[name] = _generalize_df(src_df, gt, base_table)
            continue
        id_col = _id_column(base_table)
        ids_renamed = ids.withColumnRenamed("osm_id", id_col).distinct()
        # deliberately UNHINTED (round-10 negative result): forcing
        # F.broadcast(ids_renamed) here built a separate BroadcastExchange
        # per gen table per batch and A/B-measured the gens stage at
        # 6.7-23.4 s vs 5.8-6.2 s unhinted — the gen tables are small
        # enough that the planner's choice already beats paying 8 broadcast
        # builds of the same id set
        kept = old.join(ids_renamed, id_col, "left_anti")
        subset = src_df.join(ids_renamed, id_col, "leftsemi")
        out[name] = kept.unionByName(_generalize_df(subset, gt, base_table))
    return out
