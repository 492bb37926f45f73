"""Reference-resolution joins (SURVEY §2.3 J1-J4).

The reference resolves way refs and relation members with LevelDB point
lookups (cache/delta.go:162-198 FillWay, cache/ways.go:99-114 FillMembers).
In Spark these are bulk equi-joins:

  J1  posexplode(refs) ⋈ coords on node id → regroup ordered by position
  J2  explode(members) where type=1 ⋈ ways on way id
  J3  J1 applied to member ways
  J4  explode(members) ⋈ nodes/coords/relations for relation_member rows

Completeness semantics are inner-ish: ANY missing ref drops the whole way
(FillWay returns NotFound → writer skips); any missing member way drops the
whole relation (writer/relations.go:80-99).

Scale notes: the exploded ref table is the biggest shuffle of the whole
import (≈ #node-refs rows ~ 8x #nodes on a planet file). We shuffle only
(way_id, pos, ref) + the coord payload — tags and the rest of the way row
are joined back AFTER the aggregation, so shuffled bytes stay minimal.
Mega-ways/relations create skew; AQE skew-join handles it (enabled in
session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_way_coords(
    ways: DataFrame,
    coords: DataFrame,
    keep_cols: list[str] | None = None,
    unique_ids: bool = False,
) -> DataFrame:
    """J1: attach `coords ARRAY<STRUCT<x,y>>` to each way, position-ordered.

    `coords` must have columns (id, x, y) — already projected to the target
    SRID. Ways with any unresolved ref are dropped (cache/delta.go:185-190).

    ``unique_ids=True`` asserts each way id appears on exactly one input row
    (true for the ways table itself; false for exploded relation members) —
    it skips the dedup shuffle, and when no extra columns need re-attaching
    the result is the aggregation output directly (saves the join-back
    shuffle of the full ways table).
    """
    keep_cols = keep_cols if keep_cols is not None else [c for c in ways.columns if c != "refs"]
    distinct_ways = ways.select("id", "refs")
    if not unique_ids:
        # the same way id may appear on multiple input rows (e.g. a way
        # shared by several relations) — resolve each distinct way once
        distinct_ways = distinct_ways.dropDuplicates(["id"])
    exploded = distinct_ways.select(
        "id", F.posexplode("refs").alias("pos", "ref")
    )
    joined = exploded.join(
        coords.select(F.col("id").alias("ref"), "x", "y"), on="ref", how="left"
    )
    agg = joined.groupBy("id").agg(
        F.count("*").alias("_n_refs"),
        F.count("x").alias("_n_resolved"),
        F.array_sort(
            F.collect_list(F.struct("pos", F.struct("x", "y").alias("c")))
        ).alias("_pts"),
    )
    complete = agg.filter(F.col("_n_refs") == F.col("_n_resolved")).select(
        "id", F.transform("_pts", lambda p: p["c"]).alias("coords")
    )
    if unique_ids and not [c for c in keep_cols if c != "id"]:
        return complete
    return ways.select("id", *[c for c in keep_cols if c != "id"]).join(complete, on="id", how="inner")


def explode_way_members(relations: DataFrame) -> DataFrame:
    """(rel_id, member_pos, member) for way members (type=1)."""
    return relations.select(
        F.col("id").alias("rel_id"),
        F.posexplode("members").alias("member_pos", "member"),
    ).filter(F.col("member.type") == 1)


def resolve_member_ways(relations: DataFrame, ways: DataFrame) -> tuple[DataFrame, DataFrame]:
    """J2: resolve way members to (rel_id, member_pos, way_id, refs, way_tags).

    Returns (resolved, complete_rel_ids). A relation with ANY unresolved way
    member is dropped from complete_rel_ids (writer/relations.go:80-86).
    """
    members = explode_way_members(relations)
    resolved = members.join(
        ways.select(
            F.col("id").alias("way_id"),
            F.col("refs").alias("way_refs"),
            F.col("tags").alias("way_tags"),
        ),
        members["member.id"] == F.col("way_id"),
        "left",
    )
    status = resolved.groupBy("rel_id").agg(
        (F.count("*") == F.count("way_id")).alias("_complete")
    )
    complete_ids = status.filter("_complete").select("rel_id")
    return resolved.filter(F.col("way_id").isNotNull()), complete_ids
