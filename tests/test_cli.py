"""CLI smoke tests (`python -m imposm3_spark`, cmd/imposm/main.go parity):
import -> parquet tables, diff -> updated parquet, version/usage."""

import pytest
from pyspark.sql import functions as F

from imposm3_spark.cli import main

FIX = "/root/reference/test"


def test_version(capsys):
    assert main(["version"]) == 0
    assert capsys.readouterr().out.strip()


def test_usage_errors():
    assert main([]) == 2
    assert main(["bogus"]) == 2


@pytest.fixture(scope="module")
def imported(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("cli_out")
    rc = main(
        [
            "import",
            "-mapping",
            f"{FIX}/single_table_mapping.json",
            "-read",
            f"{FIX}/single_table.osm",
            "-write-parquet",
            str(out),
            "-diff",
        ]
    )
    assert rc == 0
    return out


def test_import_writes_parquet_tables(spark, imported):
    df = spark.read.parquet(str(imported / "all"))
    assert df.count() == 14  # single_table fixture row count
    assert {f.name for f in df.schema.fields} >= {"osm_id", "geometry", "tags"}
    # -diff persisted element state for the diff subcommand
    assert spark.read.parquet(str(imported / "_state" / "nodes")).count() > 0


def test_ddl_connection_prints_statements(capsys):
    rc = main(
        [
            "import",
            "-mapping",
            f"{FIX}/single_table_mapping.json",
            "-read",
            f"{FIX}/single_table.osm",
            "-connection",
            "ddl:",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert 'CREATE TABLE "import"."osm_all"' in out
    assert "AddGeometryColumn" in out


def _point_x(df, osm_id):
    from imposm3_spark.geom import wkb as wkblib

    row = df.filter(F.col("osm_id") == osm_id).collect()[0]
    return wkblib.parse_wkb(bytes(row["geometry"]))["coords"][0]


def test_diff_applies_osc(spark, imported):
    from imposm3_spark.geom.proj import py_wgs_to_merc

    x_before = _point_x(spark.read.parquet(str(imported / "all")), 31101)
    assert abs(x_before - py_wgs_to_merc(80.0, 47.0)[0]) < 0.01
    rc = main(
        [
            "diff",
            "-mapping",
            f"{FIX}/single_table_mapping.json",
            "-write-parquet",
            str(imported),
            f"{FIX}/single_table.osc",
        ]
    )
    assert rc == 0
    after = spark.read.parquet(str(imported / "all"))
    # node 31101 moved lon 80 -> 81 (single_table.osc modify block)
    assert abs(_point_x(after, 31101) - py_wgs_to_merc(81.0, 47.0)[0]) < 0.01
    # tables remain valid parquet with the same schema
    assert {f.name for f in after.schema.fields} >= {"osm_id", "geometry", "tags"}


def test_query_cache_parity(imported, capsys):
    """S13 `query-cache` analog: look up elements + dependents from the
    persisted state (cache/query/query.go:160-205)."""
    import json

    # single_table.osm: way 20101 spans nodes 20001-20002
    rc = main(
        [
            "query",
            "-write-parquet",
            str(imported),
            "-node",
            "20001",
            "-way",
            "20101",
            "-deps",
            "-full",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    w = out["ways"]["20101"]
    assert w["id"] == 20101 and 20001 in w["refs"]
    assert "20001" in w["nodes"]  # -full recursion
    n = out["nodes"]["20001"]
    assert "20101" in n["ways"]  # -deps reverse lookup

    # missing id -> null, reference behavior
    rc = main(["query", "-write-parquet", str(imported), "-node", "99999999"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["nodes"]["99999999"] is None


def test_cli_curate(spark, tmp_path):
    from imposm3_spark.cli import main

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and that is that " * 3),
            (2, "the cat sat on the mat and that is that " * 3),  # exact dup
            (3, "a completely different document about the weather in spring " * 2),
            (4, "xx"),  # fails quality (too short)
        ],
        "doc_id long, text string",
    )
    src = tmp_path / "docs.parquet"
    docs.write.parquet(str(src))
    out = tmp_path / "curated"
    rc = main(["curate", "-read", str(src), "-out", str(out)])
    assert rc == 0
    got = spark.read.parquet(str(out))
    ids = sorted(r["doc_id"] for r in got.select("doc_id").collect())
    assert ids == [1, 3]  # dup dropped (min id kept), low-quality dropped
    assert "quality" in got.columns and "n_tokens" in got.columns


def test_config_file_merge_under_flags(spark, tmp_path, capsys):
    """`-config conf.json` (config.go:64-154): config fills flags left at
    their defaults — mapping, srid, cachedir->write-parquet, dbschemas —
    while explicit flags win; `-limitto NONE` clears a config limitto."""
    import json

    out = tmp_path / "out"
    conf = tmp_path / "conf.json"
    conf.write_text(json.dumps({
        "mapping": f"{FIX}/single_table_mapping.json",
        "srid": 3857,
        "cachedir": str(tmp_path / "config_dir_overridden_by_flag"),
        "limitto": str(tmp_path / "does_not_exist.geojson"),
        "connection": "ddl:",
        "schemas": {"import": "staging", "production": "live"},
    }))
    rc = main([
        "import",
        "-config", str(conf),
        "-read", f"{FIX}/single_table.osm",
        # explicit flags beat config:
        "-write-parquet", str(out),
        "-limitto", "NONE",
    ])
    assert rc == 0
    ddl = capsys.readouterr().out
    # connection came from config; schemas from config reached the DDL
    assert '"staging"."osm_all"' in ddl
    # mapping came from config, explicit -write-parquet won over cachedir
    assert spark.read.parquet(str(out / "all")).count() == 14
    assert not (tmp_path / "config_dir_overridden_by_flag").exists()


def test_config_file_validation(tmp_path):
    import json

    import pytest as _pytest

    conf = tmp_path / "bad.json"
    conf.write_text(json.dumps({"mapping": f"{FIX}/single_table_mapping.json",
                                "srid": 9999}))
    with _pytest.raises(SystemExit):
        main(["import", "-config", str(conf), "-read", f"{FIX}/single_table.osm"])
    # missing mapping everywhere -> error
    conf2 = tmp_path / "empty.json"
    conf2.write_text("{}")
    with _pytest.raises(SystemExit):
        main(["import", "-config", str(conf2), "-read", f"{FIX}/single_table.osm"])


def test_config_replication_interval_floor(tmp_path):
    """run: replication_interval (minutes, floored at 1) maps to the poll
    interval; diffdir may come from the config file."""
    import json

    from imposm3_spark.cli import main as cli_main
    from imposm3_spark.config import merge_config
    import argparse

    # unit-level: merge semantics without spinning the runner
    from imposm3_spark import cli as climod
    p = argparse.ArgumentParser()
    climod._base_flags(p)
    p.add_argument("-diffdir", default="")
    p.add_argument("-url", default="")
    p.add_argument("-expiretiles-dir", dest="expiretiles_dir", default="")
    p.add_argument("-expiretiles-zoom", dest="expiretiles_zoom", type=int, default=0)
    p.add_argument("-poll-interval", dest="poll_interval", type=float, default=0.0)
    conf = tmp_path / "run.json"
    conf.write_text(json.dumps({
        "mapping": f"{FIX}/single_table_mapping.json",
        "diffdir": "/tmp/diffs",
        "replication_url": "https://example.org/replication/minute",
        "replication_interval": 0.25,   # floored to 1 minute
        "expiretiles_zoom": 99,         # clamped to 14
    }))
    args = p.parse_args(["-config", str(conf)])
    merge_config(args, p)
    assert args.diffdir == "/tmp/diffs"
    assert args.url == "https://example.org/replication/minute"
    assert args.poll_interval == 60.0
    assert args.expiretiles_zoom == 14


def test_cli_curate_gopher_scrub_benchmark(spark, tmp_path):
    """The extended curate flags: -gopher adds the rule-table gate,
    -benchmark drops eval-contaminated docs, -scrub redacts PII in the
    surviving text."""
    from imposm3_spark.cli import main

    good = "the cat sat on the mat and that is that again today " * 3
    leaky = "the benchmark answer is exactly this secret phrase here ok now"
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, leaky),  # shares 3-grams with the benchmark -> dropped
            (3, "contact me at someone@example.com about the cat and the dog in a house that is here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "the benchmark answer is exactly this secret phrase")],
        "doc_id long, text string",
    )
    src, bsrc, out = tmp_path / "d.parquet", tmp_path / "b.parquet", tmp_path / "o"
    docs.write.parquet(str(src))
    bench.write.parquet(str(bsrc))
    rc = main(
        [
            "curate",
            "-read", str(src),
            "-out", str(out),
            "-min-quality", "0.5",
            "-gopher",
            "-scrub",
            "-benchmark", str(bsrc),
        ]
    )
    assert rc == 0
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(str(out)).collect()}
    assert 2 not in got  # decontaminated
    assert 1 in got and 3 in got
    assert "<EMAIL>" in got[3] and "@" not in got[3]  # scrubbed


def test_analyze_subcommand(tmp_path, capsys):
    from imposm3_spark.cli import main

    # -list prints registered names
    assert main(["analyze", "-list"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "tpch_q1" in out and len(out) > 100

    # unknown name errors
    assert main(["analyze", "-name", "nope_missing"]) == 2

    # run a real query to parquet
    dest = str(tmp_path / "q1")
    assert (
        main(
            [
                "analyze",
                "-name",
                "tpch_q1",
                "-sf-dir",
                "/root/testdata/sf0.001",
                "-out",
                dest,
            ]
        )
        == 0
    )
    import duckdb

    n = duckdb.connect().execute(f"SELECT count(*) FROM '{dest}/*.parquet'").fetchone()[0]
    assert n > 0


def test_cli_gate_subcommand(capsys):
    """The gate subcommand replays the oracle comparison for selected
    queries and exits 0 on all-green."""
    from imposm3_spark.cli import main

    rc = main(["gate", "-sf-dir", "/root/testdata/sf0.001", "-only", "tpch_q6"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "PASS tpch_q6" in out and "0 fail" in out


def test_cli_sql_subcommand(capsys):
    """Ad-hoc SQL runs against the pre-registered testdata views and the
    result matches a direct duckdb evaluation."""
    import duckdb

    from imposm3_spark.cli import main

    rc = main([
        "sql", "-sf-dir", "/root/testdata/sf0.001",
        "-e", "SELECT count(*) AS n, count(DISTINCT o_custkey) AS c FROM orders",
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0
    n, c = duckdb.sql(
        "SELECT count(*), count(DISTINCT o_custkey) FROM '/root/testdata/sf0.001/orders.parquet'"
    ).fetchall()[0]
    assert out == f"{n}\t{c}"
