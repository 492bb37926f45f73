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
