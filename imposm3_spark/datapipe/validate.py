"""Data-quality validation: declarative expectations evaluated in ONE
pass over a table (the Great-Expectations shape, Spark-first).

Reference parity note: imposm3 validates geometries (geom limits); this
generalizes the idea into the tabular audit surface a pipeline needs
before training on a drop: null fractions, range violations, set
membership, uniqueness.

Scale design: every rule compiles to a conditional-count aggregate over
the SAME single scan (map-side combinable, zero shuffles beyond the one
final 1-row aggregate); uniqueness is the only rule that needs its own
shuffle (a distinct count) and is computed in the same job via a
count_distinct aggregate. Output is one row per rule —
(rule, violations, total, ok) — so the audit composes with alerting
joins downstream.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    # a boolean Column: TRUE when the row VIOLATES the expectation
    violation: Column


def not_null(col: str) -> Rule:
    return Rule(f"{col}_not_null", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Rule:
    return Rule(
        f"{col}_in_range",
        F.col(col).isNotNull() & ~F.col(col).between(F.lit(lo), F.lit(hi)),
    )


def member_of(col: str, allowed: list) -> Rule:
    return Rule(
        f"{col}_member_of",
        F.col(col).isNotNull() & ~F.col(col).isin(*allowed),
    )


def matches(col: str, pattern: str) -> Rule:
    return Rule(
        f"{col}_matches",
        F.col(col).isNotNull() & ~F.col(col).rlike(pattern),
    )


def validate(df: DataFrame, rules: list[Rule], unique_col: str | None = None) -> DataFrame:
    """Evaluate all rules in one aggregate pass; returns one row per rule:
    (rule, violations, total, ok). `unique_col` adds a `<col>_unique`
    rule whose violation count is total - count_distinct."""
    aggs = [F.count(F.lit(1)).alias("_total")]
    for r in rules:
        aggs.append(
            F.sum(F.when(r.violation, 1).otherwise(0)).alias(r.name)
        )
    if unique_col is not None:
        aggs.append(F.count_distinct(F.col(unique_col)).alias("_distinct"))
    row = df.agg(*aggs)

    selects = []
    for r in rules:
        selects.append(
            F.struct(
                F.lit(r.name).alias("rule"),
                F.col(r.name).cast("long").alias("violations"),
                F.col("_total").alias("total"),
                (F.col(r.name) == 0).alias("ok"),
            )
        )
    if unique_col is not None:
        uviol = F.col("_total") - F.col("_distinct")
        selects.append(
            F.struct(
                F.lit(f"{unique_col}_unique").alias("rule"),
                uviol.cast("long").alias("violations"),
                F.col("_total").alias("total"),
                (uviol == 0).alias("ok"),
            )
        )
    return row.select(F.explode(F.array(*selects)).alias("r")).select(
        "r.rule", "r.violations", "r.total", "r.ok"
    )


def profile(
    df: DataFrame,
    num_cols: list[str] | None = None,
    str_cols: list[str] | None = None,
    date_cols: list[str] | None = None,
) -> DataFrame:
    """One-pass data-profiling card: per column, the row count, null
    count, EXACT distinct count, and min/max — numerics as doubles,
    strings lexicographically, dates as day indexes vs 2000-01-01. The
    dataset-card artifact an ingest pipeline publishes next to every
    drop (the profiling sibling of `validate`).

    Execution: every column unpivots into ONE (column, num, str) stream
    — a single scan and a single aggregation keyed by the tiny column
    dimension; no per-column pass, no expand-based multi-countDistinct
    (which would replay the input once per column at 100 TB).
    """
    num_cols = num_cols or []
    str_cols = str_cols or []
    date_cols = date_cols or []
    entries = []
    for c in num_cols:
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(c).cast("double").alias("num"),
                F.lit(None).cast("string").alias("str"),
            )
        )
    for c in date_cols:
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.datediff(F.col(c).cast("date"), F.lit("2000-01-01").cast("date"))
                .cast("double")
                .alias("num"),
                F.lit(None).cast("string").alias("str"),
            )
        )
    for c in str_cols:
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(None).cast("double").alias("num"),
                F.col(c).cast("string").alias("str"),
            )
        )
    long = df.select(F.explode(F.array(*entries)).alias("e")).select(
        "e.column", "e.num", "e.str"
    )
    val = F.coalesce(F.col("str"), F.col("num").cast("string"))
    return (
        long.groupBy("column")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(val.isNull(), 1).otherwise(0)).alias("n_nulls"),
            F.countDistinct(val).alias("n_distinct"),
            F.round(F.min("num"), 6).alias("min_num"),
            F.round(F.max("num"), 6).alias("max_num"),
            F.min("str").alias("min_str"),
            F.max("str").alias("max_str"),
        )
    )
