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
