"""Hostile-session replica of the driver correctness gate: the Spark
session is built the way a FOREIGN driver would build it — no repo
session factory, a non-UTC JVM/session timezone, and parquet NTZ
inference DISABLED — then every query runs through the
`__spark_entry__.queries()` wrappers (whose `_pin_session` must undo all
of that). Proves the driver contract is environment-proof, not
green-by-luck.

Usage: python scripts/check_oracle_hostile.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.check_oracle import TABLES, value_hash  # noqa: E402


def hostile_spark():
    from pyspark.sql import SparkSession

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ["PYTHONPATH"] = repo + os.pathsep + os.environ.get("PYTHONPATH", "")
    return (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("hostile-oracle-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=America/New_York")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.executorEnv.PYTHONPATH", repo)
        .getOrCreate()
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = hostile_spark()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error {exc}")
            n_fail += 1
            continue
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        ok = (
            sorted(cols) == sorted(ocols)
            and len(rows) == len(orows)
            and value_hash(cols, rows) == value_hash(ocols, orows)
        )
        if ok:
            n_pass += 1
            print(f"PASS {name}")
        else:
            n_fail += 1
            print(f"FAIL {name}: rows {len(rows)} vs {len(orows)}")
    print(f"\n{n_pass} pass, {n_fail} fail (hostile session)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
