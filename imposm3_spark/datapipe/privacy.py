"""Privacy-risk audits over tabular data: k-anonymity and l-diversity.

A release is k-anonymous when every combination of quasi-identifier (QI)
values is shared by at least k rows, and l-diverse when every such
equivalence class contains at least l distinct values of the sensitive
attribute (Sweeney, "k-anonymity: a model for protecting privacy",
IJUFKS'02; Machanavajjhala et al., "l-diversity", ICDE'06). The audit —
not the anonymization itself — is the operator a pipeline needs: given a
proposed QI set, how many rows sit in classes smaller than k, and how
weak is the sensitive-value diversity?

Reference parity: imposm3 has no privacy surface; this belongs to the
training-data governance set layered on the analytics engine (the same
family as the PII scrub in datapipe/text.py).

Scale (100 TB): two hash aggregations, both map-side combinable — one
over the QI tuple (class sizes + distinct-sensitive counts), one over
the class-size histogram. No window, no join, no skew pitfall beyond a
degenerate QI choice (a single hot class), which aggregation handles by
construction. count_distinct inside the first groupBy is exact and
shuffles (QI, sensitive) pairs once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
) -> DataFrame:
    """Class-size histogram of the QI equivalence classes.

    Returns one row per observed class size:
    (class_size, n_classes, n_rows, min_l, at_risk) where min_l is the
    WEAKEST l-diversity among classes of that size and at_risk flags
    sizes below k. All values are exact integers/booleans.
    """
    classes = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.count_distinct(F.col(sensitive_col)).alias("l_div"),
    )
    return (
        classes.groupBy("class_size")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("class_size").alias("n_rows"),
            F.min("l_div").alias("min_l"),
        )
        .select(
            "class_size",
            "n_classes",
            "n_rows",
            "min_l",
            (F.col("class_size") < F.lit(k)).alias("at_risk"),
        )
    )


def k_anonymity_oracle(
    qi_sql: list[str],
    sensitive_sql: str,
    table: str,
    k: int = 5,
) -> str:
    """DuckDB oracle: the same two aggregations in ANSI SQL."""
    qi = ", ".join(qi_sql)
    return f"""
    WITH classes AS (
      SELECT {qi}, count(*) AS class_size,
             count(DISTINCT {sensitive_sql}) AS l_div
      FROM {table}
      GROUP BY {qi}
    )
    SELECT class_size,
           count(*) AS n_classes,
           CAST(sum(class_size) AS BIGINT) AS n_rows,
           CAST(min(l_div) AS BIGINT) AS min_l,
           class_size < {k} AS at_risk
    FROM classes
    GROUP BY class_size
    """
