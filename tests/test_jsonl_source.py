"""JSONL corpus source: schema contract, quarantine of malformed lines,
deterministic id backfill, round-trip through the writer, and drop-in
compatibility with a datapipe operator."""

from __future__ import annotations

import json

from imposm3_spark.sources.jsonl import read_jsonl, write_jsonl


def _write(tmp_path, lines, name="corpus.jsonl"):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_canonical_shape_and_quarantine(spark, tmp_path):
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world", "lang": "en", "source": "a"}),
        json.dumps({"text": "sin id ni fuente", "lang": "es"}),
        '{"text": "broken json...',
        json.dumps({"doc_id": 3, "text": "", "lang": "en", "source": "a"}),
        json.dumps({"doc_id": 4, "lang": "en", "source": "a"}),
    ]
    docs, quarantine = read_jsonl(spark, _write(tmp_path, lines))
    rows = {r.doc_id: r for r in docs.collect()}
    assert set(docs.columns) == {"doc_id", "text", "lang", "source", "n_chars"}
    assert rows[1].text == "hello world" and rows[1].n_chars == 11
    # missing id backfilled deterministically; defaults applied
    backfilled = [r for r in rows.values() if r.text == "sin id ni fuente"]
    assert len(backfilled) == 1 and backfilled[0].source == "unknown"
    again, _ = read_jsonl(spark, _write(tmp_path, lines, "again.jsonl"))
    assert sorted(r.doc_id for r in again.collect()) == sorted(rows)
    # empty text and missing text dropped; broken line quarantined intact
    assert len(rows) == 2
    q = quarantine.collect()
    assert len(q) == 1 and q[0].raw_line.startswith('{"text": "broken')


def test_roundtrip_writer(spark, tmp_path):
    lines = [
        json.dumps({"doc_id": i, "text": f"doc number {i}", "lang": "en", "source": "s"})
        for i in range(20)
    ]
    docs, _ = read_jsonl(spark, _write(tmp_path, lines))
    out = str(tmp_path / "out")
    write_jsonl(docs, out, target_file_rows=7)
    docs2, q2 = read_jsonl(spark, out + "/*.json")
    assert q2.count() == 0
    assert sorted((r.doc_id, r.text) for r in docs2.collect()) == sorted(
        (r.doc_id, r.text) for r in docs.collect()
    )


def test_datapipe_drop_in(spark, tmp_path):
    """A datapipe operator (exact dedup) runs unchanged on the JSONL
    source output."""
    from imposm3_spark.datapipe.dedup import exact_dedup

    lines = [
        json.dumps({"doc_id": 1, "text": "same text here", "lang": "en", "source": "a"}),
        json.dumps({"doc_id": 2, "text": "same text here", "lang": "en", "source": "b"}),
        json.dumps({"doc_id": 3, "text": "different", "lang": "en", "source": "a"}),
    ]
    docs, _ = read_jsonl(spark, _write(tmp_path, lines))
    kept = exact_dedup(docs)
    assert kept.count() == 2  # one of the two identical texts dropped


def test_compact_parquet(spark, tmp_path):
    from imposm3_spark.sources.jsonl import compact_parquet

    src = str(tmp_path / "frag")
    # fragment: 40 tiny files
    spark.range(0, 4000).selectExpr("id", "id % 7 AS k").repartition(
        40
    ).write.parquet(src)
    import glob

    assert len(glob.glob(src + "/part-*.parquet")) == 40

    dest = str(tmp_path / "compact")
    parts = compact_parquet(spark, src, dest, target_file_rows=1000)
    files = glob.glob(dest + "/part-*.parquet")
    assert parts == 4 and len(files) == 4
    # same data
    a = sorted(r.id for r in spark.read.parquet(src).collect())
    b = sorted(r.id for r in spark.read.parquet(dest).collect())
    assert a == b

    # ordered compaction: per-file id ranges disjoint
    dest2 = str(tmp_path / "ordered")
    compact_parquet(spark, src, dest2, target_file_rows=1000, order_col="id")
    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(glob.glob(dest2 + "/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        cols = {md.schema.column(c).name: c for c in range(md.num_columns)}
        mins, maxs = [], []
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(cols["id"]).statistics
            mins.append(st.min); maxs.append(st.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (alo, ahi), (blo, bhi) in zip(ranges, ranges[1:]):
        assert ahi < blo  # disjoint file ranges -> pruning works
