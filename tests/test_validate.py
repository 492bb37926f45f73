"""Declarative validation: each rule type catches its violation class,
clean data passes, and the whole audit is one aggregate pass."""

from __future__ import annotations

from imposm3_spark.datapipe import validate as dv


def _audit(spark, rows, rules, unique_col=None):
    df = spark.createDataFrame(rows, "id long, qty double, flag string")
    out = dv.validate(df, rules, unique_col=unique_col)
    return {r.rule: (r.violations, r.total, r.ok) for r in out.collect()}


def test_each_rule_type(spark):
    rows = [
        (1, 5.0, "A"),
        (2, None, "N"),     # null qty
        (3, 99.0, "R"),     # out of range
        (4, 5.0, "X"),      # not a member
        (1, 5.0, "A"),      # duplicate id
    ]
    got = _audit(
        spark,
        rows,
        [
            dv.not_null("qty"),
            dv.in_range("qty", 1, 50),
            dv.member_of("flag", ["A", "N", "R"]),
            dv.matches("flag", "^[ANR]$"),
        ],
        unique_col="id",
    )
    assert got["qty_not_null"] == (1, 5, False)
    assert got["qty_in_range"] == (1, 5, False)
    assert got["flag_member_of"] == (1, 5, False)
    assert got["flag_matches"] == (1, 5, False)
    assert got["id_unique"] == (1, 5, False)


def test_clean_data_passes(spark):
    rows = [(i, float(i + 1), "A") for i in range(4)]
    got = _audit(
        spark,
        rows,
        [dv.not_null("qty"), dv.in_range("qty", 1, 50)],
        unique_col="id",
    )
    assert all(ok for _, _, ok in got.values())
    assert all(v == 0 for v, _, _ in got.values())


def test_single_pass_plan(spark):
    """The audit is ONE aggregate over one scan — no join of per-rule
    subqueries, no repeated scans."""
    df = spark.createDataFrame(
        [(1, 2.0, "A")], "id long, qty double, flag string"
    )
    out = dv.validate(df, [dv.not_null("qty"), dv.in_range("qty", 1, 50)])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1  # the source appears once
