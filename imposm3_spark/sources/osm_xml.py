"""OSM XML source: .osm files -> nodes/ways/relations DataFrames.

The reference consumes PBF (vendor/go-osm/parser/pbf); its test fixtures are
hand-written .osm XML converted to PBF via osmosis (test/Makefile:17-19). We
parse the XML directly — same logical records (element.go:32-87).

Driver-side parse is fine for fixtures (KBs). For planet-scale input the
engine expects pre-converted Parquet or the PBF reader (sources/pbf.py);
this module also works distributed via mapInPandas over whole-file rows if
ever needed — fixtures don't need it.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

NODE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), False),
    ]
)

WAY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("refs", T.ArrayType(T.LongType()), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), False),
    ]
)

MEMBER_TYPE = {"node": 0, "way": 1, "relation": 2}  # element.go:53-59

RELATION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField(
            "members",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.LongType(), False),
                        T.StructField("type", T.ByteType(), False),
                        T.StructField("role", T.StringType(), True),
                    ]
                )
            ),
            False,
        ),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), False),
    ]
)

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("pos", T.LongType(), False),  # order within the file
        T.StructField("op", T.StringType(), False),  # create|modify|delete
        T.StructField("kind", T.StringType(), False),  # node|way|relation
        T.StructField("node", NODE_SCHEMA, True),
        T.StructField("way", WAY_SCHEMA, True),
        T.StructField("relation", RELATION_SCHEMA, True),
    ]
)


def _tags(elem: ET.Element) -> dict[str, str]:
    return {t.attrib["k"]: t.attrib["v"] for t in elem.findall("tag")}


def _parse_node(e: ET.Element) -> tuple:
    return (
        int(e.attrib["id"]),
        float(e.attrib.get("lon", "nan")) if "lon" in e.attrib else None,
        float(e.attrib.get("lat", "nan")) if "lat" in e.attrib else None,
        _tags(e),
    )


def _parse_way(e: ET.Element) -> tuple:
    return (
        int(e.attrib["id"]),
        [int(nd.attrib["ref"]) for nd in e.findall("nd")],
        _tags(e),
    )


def _parse_relation(e: ET.Element) -> tuple:
    return (
        int(e.attrib["id"]),
        [
            (int(m.attrib["ref"]), MEMBER_TYPE[m.attrib["type"]], m.attrib.get("role", ""))
            for m in e.findall("member")
        ],
        _tags(e),
    )


def _read_xml(path: str | Path) -> ET.Element:
    path = Path(path)
    if path.suffix == ".gz":
        with gzip.open(path, "rb") as fh:
            return ET.fromstring(fh.read())
    return ET.fromstring(path.read_text())


def read_osm_xml(
    spark: SparkSession, path: str | Path
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Parse a .osm XML file into (nodes, ways, relations) DataFrames."""
    root = _read_xml(path)
    nodes = [_parse_node(e) for e in root.findall("node")]
    ways = [_parse_way(e) for e in root.findall("way")]
    rels = [_parse_relation(e) for e in root.findall("relation")]
    return (
        spark.createDataFrame(nodes, NODE_SCHEMA),
        spark.createDataFrame(ways, WAY_SCHEMA),
        spark.createDataFrame(rels, RELATION_SCHEMA),
    )


def parse_osc_rows(root: ET.Element, pos_offset: int = 0) -> list[tuple]:
    """OsmChange XML root -> CHANGE_SCHEMA tuples (order preserved)."""
    rows: list[tuple] = []
    for block in root:
        op = block.tag  # create | modify | delete
        if op not in ("create", "modify", "delete"):
            continue
        for e in block:
            pos = pos_offset + len(rows)
            if e.tag == "node":
                rows.append((pos, op, "node", _parse_node(e), None, None))
            elif e.tag == "way":
                rows.append((pos, op, "way", None, _parse_way(e), None))
            elif e.tag == "relation":
                rows.append((pos, op, "relation", None, None, _parse_relation(e)))
    return rows


def read_osc_xml(spark: SparkSession, path: str | Path) -> DataFrame:
    """Parse an OsmChange (.osc / .osc.gz) file into a CDC DataFrame.

    Parity: vendor/go-osm/parser/diff + update/process.go:33-46. Each row is
    one change: op (create|modify|delete), kind, and the element payload.
    """
    return spark.createDataFrame(parse_osc_rows(_read_xml(path)), CHANGE_SCHEMA)
