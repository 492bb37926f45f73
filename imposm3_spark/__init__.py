"""imposm3_spark — a PySpark-native rebuild of the omniscale/imposm3 engine.

The reference (studied at /root/reference) is a Go ETL engine that imports
OpenStreetMap data into PostGIS and keeps it updated from OSM change streams.
This package re-expresses the same operator surface (SURVEY.md §2) as
idiomatic PySpark: DataFrames for the dataflow, Spark SQL expressions for the
mapping DSL, `applyInPandas` for geometry assembly, and foreachBatch-style
incremental maintenance for diffs.

Design notes (Spark-first, built for 100 TB):
- Elements are plain DataFrames (nodes/ways/relations) with MAP tag columns.
- The YAML mapping compiles to broadcast match tables + column expressions;
  Catalyst handles pushdown/pruning — nothing is hand-scheduled.
- Reference resolution (way->coords, relation->ways) is posexplode + shuffle
  join + regroup; the reference's LevelDB caches are subsumed by shuffle.
- Geometry lives as ARRAY<STRUCT<x,y>> until the sink, where it becomes WKB.
"""

__version__ = "0.1.0"

from imposm3_spark.session import get_spark  # noqa: F401
