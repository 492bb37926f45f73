"""Bucketed on-disk element state for the diff path (SURVEY §1.4, §2.8 T4).

The reference keeps element state in LevelDB so a diff batch can join
changed ids against it with point lookups (cache/osm.go). The Spark analog
at 100 TB is a BUCKETED parquet table per element kind: `bucketBy(id)` +
`sortBy(id)` means every per-batch id-join — the frontier semi-joins (J8),
the anti-join+union state upsert (T4), way→coord re-resolution (J1) —
reads the big state side already hash-partitioned on the join key, so the
shuffle happens only on the (tiny) change side. Across batches the state
never moves: one Exchange per batch instead of re-shuffling the planet.

Buckets are hash(id) % n — the same co-location contract the reference
gets from LevelDB key order. Writes go through a staged swap: each save
writes `<table>__v{N}` then repoints the current-version marker, so a
crashed write never corrupts the readable state (the reference's analog
is LevelDB's atomic WriteBatch).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from imposm3_spark.diff.update import OsmState

_KINDS = ("nodes", "ways", "relations")


class BucketedStateStore:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        prefix: str = "osm_state",
        buckets: int = 64,
    ):
        """`path`: directory for the external table files. `buckets`: size
        for the id hash — pick so each bucket's rows fit an executor task
        (a planet's 10^10 nodes at 64B/row → ~4096 buckets; tests use
        small values)."""
        self.spark = spark
        self.path = path
        self.prefix = prefix
        self.buckets = buckets
        self._version = self._read_version()

    # ---- versioning (atomic publish) ----

    def _marker(self) -> str:
        return os.path.join(self.path, "CURRENT")

    def _read_version(self) -> int:
        try:
            with open(self._marker()) as fh:
                return int(fh.read().strip())
        except (FileNotFoundError, ValueError):
            return 0

    def _publish_version(self, v: int) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = self._marker() + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(v))
        os.replace(tmp, self._marker())

    def _table(self, kind: str, version: int) -> str:
        return f"{self.prefix}_{kind}__v{version}"

    # ---- save / load ----

    def save(self, state: OsmState) -> None:
        """Write all three element tables bucketed by id, then atomically
        publish the new version; drop the superseded one."""
        new_v = self._version + 1
        for kind in _KINDS:
            df: DataFrame = getattr(state, kind)
            name = self._table(kind, new_v)
            (
                df.write.mode("overwrite")
                .option("path", os.path.join(self.path, name))
                .bucketBy(self.buckets, "id")
                .sortBy("id")
                .format("parquet")
                .saveAsTable(name)
            )
        self._publish_version(new_v)
        old_v, self._version = self._version, new_v
        if old_v:
            for kind in _KINDS:
                self.spark.sql(f"DROP TABLE IF EXISTS {self._table(kind, old_v)}")

    def load(self) -> OsmState:
        """Current state as bucketed-scan DataFrames (bucket metadata is
        only attached by spark.table — a raw parquet read of the same
        files would lose the co-partitioning)."""
        v = self._read_version()
        if v == 0:
            raise FileNotFoundError(f"no published state under {self.path}")
        self._version = v
        return OsmState(
            *[self.spark.table(self._table(kind, v)) for kind in _KINDS]
        )
