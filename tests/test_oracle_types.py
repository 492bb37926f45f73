"""Gate-integrity guard: no registered DuckDB oracle may emit output
columns the driver's comparator renders incompatibly with Spark.

Round-5 forensics: every driver-red (but locally-green) query's oracle had
a HUGEINT output column — DuckDB silently widens sum(BIGINT)/sum(INTEGER)
to HUGEINT, and the driver's fetch path renders HUGEINT differently from
Spark's BIGINT even when values are equal (the local gate's fetchall()
collapses both to Python int, masking it). Bare decimal literals likewise
produce DECIMAL, whose string form ("0.500000") differs from DOUBLE.

This test binds every oracle against the sf0.001 views and asserts the
resolved output types are HUGEINT/UHUGEINT/DECIMAL-free. Type resolution
happens at plan time (no execution), so the sweep is cheap.
"""

from __future__ import annotations

import duckdb
import pytest

from imposm3_spark import benchqueries as bq
from scripts.check_oracle import TABLES, banned_duck_types

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_oracle_emits_banned_types(con):
    offenders = {}
    for name, sql in bq.ORACLES.items():
        bad = banned_duck_types(con, sql)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracles emit driver-incompatible output types (CAST them): {offenders}"
    )


def test_no_query_emits_complex_spark_types(spark):
    """Round-8 forensics: the driver's comparator sorts result frames with
    pandas ``sort_values`` over every column, which raises ``TypeError:
    unhashable type: 'list'`` on ArrayType cells (three value-correct
    queries went driver-red on exactly this). Registered queries must
    flatten Array/Map/Struct outputs to scalar renderings. Schema
    resolution only — queries are planned, not executed (except the few
    with eager driver-side phases, cheap at sf0.001)."""
    from scripts.check_oracle import banned_spark_types

    offenders = {}
    for name, fn in bq.QUERIES.items():
        bad = banned_spark_types(fn(spark, SF_DIR).schema)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"queries emit driver-uncanonicalizable complex columns "
        f"(flatten to scalars): {offenders}"
    )


class TestDriverCanonicalizationSimulation:
    """Pin the gate's ban list to the driver comparator's ACTUAL pandas
    behavior (round-9 addendum): the driver canonicalizes result frames
    with ``df.sort_values(by=all_columns)``. These tests run that exact
    operation on frames shaped like each Spark output type, so if a
    pandas upgrade ever changes what is sortable, the mismatch between
    ban list and reality surfaces here instead of as a driver red."""

    @staticmethod
    def _driver_sort(df):
        return df.sort_values(by=list(df.columns))

    def test_map_cells_break_driver_sort(self):
        # MapType arrives driver-side as dict cells — unhashable/unorderable
        import pandas as pd

        df = pd.DataFrame({"k": [1, 2], "m": [{"a": 1}, {"b": 2}]})
        with pytest.raises(TypeError):
            self._driver_sort(df)

    def test_array_cells_break_driver_sort(self):
        import pandas as pd

        df = pd.DataFrame({"k": [1, 2], "a": [[1, 2], [3]]})
        with pytest.raises(TypeError):
            self._driver_sort(df)

    def test_struct_cells_break_driver_sort(self, spark):
        # StructType arrives as pyspark Row cells; Rows are tuples, which
        # pandas CAN sort — but only until two rows tie on every scalar
        # column and the tuple must compare against a None/NaN cell, or
        # against a Row of different field types. The driver's comparator
        # is only safe if struct outputs never reach it — banned.
        import pandas as pd
        from pyspark.sql import functions as F

        pdf = spark.range(2).select(
            F.lit(1).alias("k"),
            F.struct(F.col("id").alias("a")).alias("s"),
        ).toPandas()
        mixed = pd.concat([pdf, pd.DataFrame({"k": [1, 1], "s": [None, 3]})])
        with pytest.raises(TypeError):
            self._driver_sort(mixed)

    def test_scalar_nulls_survive_driver_sort(self):
        # NULLs in SCALAR columns are fine (pandas orders NaN/None last) —
        # the ban list must NOT grow to nullable scalars, or every outer
        # join query would be forced through needless coalesce wrapping.
        import pandas as pd

        df = pd.DataFrame(
            {
                "i": [1, None, 2],
                "s": ["b", None, "a"],
                "f": [float("nan"), 1.0, 0.5],
            }
        )
        out = self._driver_sort(df)
        assert list(out["i"])[:2] == [1, 2]

    def test_ban_list_matches_simulation(self, spark):
        # the three banned Spark types are exactly the frame shapes the
        # simulation proves unsortable
        from pyspark.sql import functions as F

        from scripts.check_oracle import banned_spark_types

        df = spark.range(1).select(
            F.array(F.lit(1)).alias("arr"),
            F.create_map(F.lit("k"), F.lit(1)).alias("m"),
            F.struct(F.lit(1).alias("a")).alias("s"),
            F.lit(1).alias("scalar_ok"),
            F.lit(None).cast("string").alias("null_scalar_ok"),
        )
        assert [c for c, _ in banned_spark_types(df.schema)] == ["arr", "m", "s"]


def test_gate_flags_complex_output_schema(spark):
    """The audit itself must catch a deliberately array-returning query."""
    from pyspark.sql import functions as F

    from scripts.check_oracle import banned_spark_types

    df = spark.range(1).select(
        F.array(F.lit(1), F.lit(2)).alias("arr"),
        F.create_map(F.lit("k"), F.lit(1)).alias("m"),
        F.struct(F.lit(1).alias("a")).alias("s"),
        F.lit(1).alias("ok"),
    )
    bad = banned_spark_types(df.schema)
    assert [c for c, _ in bad] == ["arr", "m", "s"]
