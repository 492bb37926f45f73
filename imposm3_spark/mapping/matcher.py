"""Mapping compiler: tag->table match rules as pure Spark column expressions.

Parity target: /root/reference/mapping/matcher.go:125-233 (tagMatcher) and
mapping/mapping.go:169-189 (mappings), 279-362 (typed/relation filters),
mapping/filter.go:15-124 (tag prefilter).

Design (Spark-first): the reference evaluates matches as hash-map lookups per
element. We compile each (table, sub_mapping) into ONE column expression:

    array_min(filter(array(<candidate structs>), x -> x IS NOT NULL))

where each candidate is `WHEN tags[k] = v THEN struct(order, k, v)`. The
struct's first field is the declaration order, so `array_min` implements the
"lowest order wins" tie-break (matcher.go:180-186) without any shuffle,
join, or UDF — the whole match stage is whole-stage-codegen'd and runs at
scan speed. Per-table outputs are separate DataFrames over one shared scan
(the writes are per-table anyway), so Catalyst prunes and pushes each table's
predicate independently.
"""

from __future__ import annotations

import fnmatch
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from imposm3_spark.mapping.config import KeyValues, Mapping, Table

ANY = "__any__"

# element-kind -> which table types participate (mapping/matcher.go:8-91)
POINT, LINESTRING, POLYGON, GEOMETRY, RELATION, RELATION_MEMBER = (
    "point",
    "linestring",
    "polygon",
    "geometry",
    "relation",
    "relation_member",
)

MATCH_STRUCT = "struct<ord:int,key:string,value:string>"


@dataclass
class Rule:
    key: str
    value: str
    order: int


@dataclass
class MatchUnit:
    """One (table, sub_mapping) match target = one output row stream.

    An element matching several units of the SAME table through different
    sub-mappings inserts multiple rows (DestTable identity includes
    SubMapping — matcher.go:167,180-186)."""

    table: Table
    sub_mapping: str
    rules: list[Rule] = field(default_factory=list)

    def match_expr(self, tags: Column) -> Column:
        """NULL when no rule matches, else struct(ord,key,value) of the
        lowest-order matching rule."""
        candidates = []
        for r in self.rules:
            if r.key == ANY:
                # matches every element (any_any mapping)
                candidates.append(
                    F.struct(
                        F.lit(r.order).alias("ord"),
                        F.lit(ANY).alias("key"),
                        F.lit(ANY).alias("value"),
                    )
                )
            elif r.value == ANY:
                candidates.append(
                    F.when(
                        tags.getItem(r.key).isNotNull(),
                        F.struct(
                            F.lit(r.order).alias("ord"),
                            F.lit(r.key).alias("key"),
                            tags.getItem(r.key).alias("value"),
                        ),
                    )
                )
            else:
                candidates.append(
                    F.when(
                        tags.getItem(r.key) == r.value,
                        F.struct(
                            F.lit(r.order).alias("ord"),
                            F.lit(r.key).alias("key"),
                            F.lit(r.value).alias("value"),
                        ),
                    )
                )
        if not candidates:
            return F.lit(None).cast(MATCH_STRUCT)
        arr = F.filter(F.array(*candidates), lambda x: x.isNotNull())
        return F.array_min(arr)


def _rules_of(kv: KeyValues) -> list[Rule]:
    return [Rule(k, ov.value, ov.order) for k, vals in kv.items() for ov in vals]


def compile_match_units(mapping: Mapping, table_type: str) -> list[MatchUnit]:
    """All match units for one element-kind pipeline (mapping.go:169-189).

    Tables of `table_type` or of type `geometry` participate; geometry
    tables contribute their per-kind type_mappings."""
    units: list[MatchUnit] = []
    for table in mapping.tables.values():
        if table.type not in (table_type, GEOMETRY):
            continue
        main_rules = _rules_of(table.mapping)
        if table_type == POINT:
            main_rules += _rules_of(table.type_mappings.points)
        elif table_type == LINESTRING:
            main_rules += _rules_of(table.type_mappings.linestrings)
        elif table_type == POLYGON:
            main_rules += _rules_of(table.type_mappings.polygons)
        if main_rules:
            units.append(MatchUnit(table=table, sub_mapping="", rules=main_rules))
        for sub_name, sub_kv in table.mappings.items():
            sub_rules = _rules_of(sub_kv)
            if sub_rules:
                units.append(MatchUnit(table=table, sub_mapping=sub_name, rules=sub_rules))
    return units


# ---------------------------------------------------------------------------
# per-table element filters (mapping.go:279-410)
# ---------------------------------------------------------------------------


def _kv_filter(tags: Column, key: str, values: list[str], require: bool) -> Column:
    """require/reject filter — mapping.go:434-469.

    require: tag present AND value in list (or just present for __any__).
    reject:  NOT (tag present AND value in list)."""
    v = tags.getItem(key)
    if ANY in values:
        hit = v.isNotNull()
    else:
        # coalesce: absent tag -> NULL -> must mean 'no hit', not unknown
        hit = F.coalesce(v.isin(*values), F.lit(False)) if values else F.lit(False)
    return hit if require else ~hit


def _regexp_filter(tags: Column, key: str, pattern: str, require: bool) -> Column:
    # mapping.go:421-432. NOTE Go uses RE2, Spark uses Java regex; the
    # constructs used in mappings (alternation, classes, anchors) agree.
    v = tags.getItem(key)
    hit = v.rlike(pattern)
    return F.coalesce(hit, F.lit(False)) if require else ~F.coalesce(hit, F.lit(False))


def table_filter_expr(
    mapping: Mapping,
    table: Table,
    tags: Column,
    match_key: Column,
    closed: Column,
    relation: bool,
) -> Column:
    """AND of all element filters for one table (the reference applies them
    as short-circuiting closures; we emit one boolean expression).

    `closed` is the way-closed flag column (lit(True) for relations,
    lit(False) for nodes). `relation` adds the relation-type filters
    (mapping.go:332-362)."""
    preds: list[Column] = []

    f = table.filters
    for key, vals in f.require.items():
        preds.append(_kv_filter(tags, key, [ov.value for ov in vals], require=True))
    for key, vals in f.reject.items():
        preds.append(_kv_filter(tags, key, [ov.value for ov in vals], require=False))
    for key, val in f.exclude_tags:
        preds.append(_kv_filter(tags, key, [val], require=False))
    for key, pat in f.require_regexp.items():
        preds.append(_regexp_filter(tags, key, pat, require=True))
    for key, pat in f.reject_regexp.items():
        preds.append(_regexp_filter(tags, key, pat, require=False))

    # typed area/linear filters (mapping.go:295-330) — only for concrete
    # linestring/polygon tables, keyed on the MATCHED key
    area = F.coalesce(tags.getItem("area"), F.lit(""))
    if table.type == LINESTRING and mapping.areas.area_tags:
        in_area_tags = match_key.isin(*mapping.areas.area_tags)
        keep = ~(closed & ((area == "yes") | ((area != "no") & in_area_tags)))
        preds.append(keep)
    if table.type == POLYGON and mapping.areas.linear_tags:
        in_linear_tags = match_key.isin(*mapping.areas.linear_tags)
        keep = ~(closed & (area == "no")) & ~((area != "yes") & in_linear_tags)
        preds.append(keep)

    if relation:
        # mapping.go:332-362: explicit relation_types, else polygon tables
        # accept only multipolygon/boundary/land_area
        if table.relation_types:
            preds.append(tags.getItem("type").isin(*table.relation_types))
        elif table.type == POLYGON:
            preds.append(tags.getItem("type").isin("multipolygon", "boundary", "land_area"))

    if not preds:
        return F.lit(True)
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


# ---------------------------------------------------------------------------
# tag prefilter (F1) — mapping/filter.go:15-124
# ---------------------------------------------------------------------------


def _match_tag_set(mapping: Mapping, table_types: list[str]) -> tuple[set[str], set[tuple[str, str]], set[str]]:
    """(any-value keys, exact (k,v) pairs, extra keys) referenced by the
    mapping for the given table types."""
    any_keys: set[str] = set()
    pairs: set[tuple[str, str]] = set()
    for tt in table_types:
        for unit in compile_match_units(mapping, tt):
            for r in unit.rules:
                if r.value == ANY or r.key == ANY:
                    any_keys.add(r.key)
                else:
                    pairs.add((r.key, r.value))
    extra: set[str] = set()
    for tt in table_types:
        for table in mapping.tables.values():
            if table.type not in (tt, GEOMETRY):
                continue
            for col in table.columns:
                if col.key:
                    extra.add(col.key)
                extra.update(col.keys)
            for k, _v in table.filters.exclude_tags:
                extra.add(k)
            # require/reject/regexp filter keys must survive the prefilter
            # too, or filters can't evaluate (reference keeps them via column
            # keys in practice; we are explicit)
            extra.update(table.filters.require)
            extra.update(table.filters.reject)
            extra.update(table.filters.require_regexp)
            extra.update(table.filters.reject_regexp)
            if tt in (POLYGON, RELATION, RELATION_MEMBER) and table.relation_types:
                extra.add("type")
    extra.update(mapping.tags.include)
    extra.add("area")  # always kept — mapping.go:271-272
    return any_keys, pairs, extra


def _prefilter_sets(mapping: Mapping, kind: str) -> tuple[set, dict]:
    """Shared compilation for the tag prefilter (expression AND pushdown
    forms): (keep_any key set, {key: allowed-values} pair map) for one
    element kind. Single source of truth — tag_prefilter_expr and
    python_tag_filter MUST stay semantically identical (test_pbf.py pins
    them against each other on a fixture)."""
    if kind == "node":
        types = [POINT]
        extra_types = [POINT, RELATION_MEMBER]
    elif kind == "way":
        types = [LINESTRING, POLYGON]
        extra_types = [LINESTRING, POLYGON, RELATION_MEMBER]
    else:
        types = [LINESTRING, POLYGON, RELATION, RELATION_MEMBER]
        extra_types = types
    any_keys, pairs, _ = _match_tag_set(mapping, types)
    _, _, extra = _match_tag_set(mapping, extra_types)
    if kind == "relation":
        # keep `type` for common relations — filter.go:46-51
        pairs = set(pairs) | {
            ("type", "multipolygon"),
            ("type", "boundary"),
            ("type", "land_area"),
        }
    by_key: dict[str, set] = {}
    for pk, pv in pairs:
        by_key.setdefault(pk, set()).add(pv)
    return any_keys | extra, by_key


def tag_prefilter_expr(mapping: Mapping, kind: str, tags: Column) -> Column:
    """map_filter expression dropping tags no table references (filter.go).

    kind: 'node' | 'way' | 'relation'. With tags.load_all, only the
    `exclude` globs are dropped (filter.go:92-124). Column pruning for MAP
    columns is manual in Spark — this is the equivalent of the reference
    running its prefilter in the reader, and it shrinks the shuffled bytes
    of every downstream join, which is the thing that matters at 100 TB.
    """
    if mapping.tags.load_all:
        exact = [k for k in mapping.tags.exclude if not any(c in k for c in "?*[")]
        globs = [k for k in mapping.tags.exclude if any(c in k for c in "?*[")]

        def keep_fn(k: Column, v: Column) -> Column:
            keep = ~k.isin(*exact) if exact else F.lit(True)
            for g in globs:
                keep = keep & ~k.rlike("^" + fnmatch.translate(g).replace("(?s:", "(?s:").rstrip("\\Z") + "$")
            return keep

        return F.map_filter(tags, keep_fn)

    keep_any_set, by_key = _prefilter_sets(mapping, kind)
    keep_any = sorted(keep_any_set)

    def keep_fn(k: Column, v: Column) -> Column:
        keep = k.isin(*keep_any) if keep_any else F.lit(False)
        for pk in sorted(by_key):
            keep = keep | ((k == pk) & v.isin(*sorted(by_key[pk])))
        return keep

    return F.map_filter(tags, keep_fn)


def python_tag_filter(mapping: Mapping, kind: str):
    """Python-side analog of tag_prefilter_expr for SOURCE pushdown.

    Returns a plain-data closure `dict -> dict` applied inside the PBF/XML
    decode loop (sources/pbf.py read_pbf(mapping=...)), the exact Spark
    analog of the reference running its tag prefilter in the reader
    goroutines before anything is cached (reader/reader.go:124,166,238).
    Filtering at decode time — before rows are serialized into DataFrames —
    cuts the Python->JVM transfer and every downstream shuffle byte, which
    at 100 TB is the dominant cost of carrying never-referenced tags.

    Semantics are identical to tag_prefilter_expr (same _match_tag_set
    compilation); tests pin the two against each other.
    """
    if mapping.tags.load_all:
        exact = {k for k in mapping.tags.exclude if not any(c in k for c in "?*[")}
        globs = [k for k in mapping.tags.exclude if any(c in k for c in "?*[")]

        def keep_load_all(tags: dict) -> dict:
            return {
                k: v
                for k, v in tags.items()
                if k not in exact and not any(fnmatch.fnmatchcase(k, g) for g in globs)
            }

        return keep_load_all

    keep_any, by_key = _prefilter_sets(mapping, kind)

    def keep(tags: dict) -> dict:
        return {
            k: v
            for k, v in tags.items()
            if k in keep_any or v in by_key.get(k, ())
        }

    return keep
