"""Incrementally-maintained rollup tables over a stream (materialized-view
maintenance).

Pattern: `foreachBatch` computes the micro-batch's PARTIAL aggregate
(count/sum are mergeable), merges it into a versioned parquet rollup, and
publishes atomically — the streaming analog of the reference's
generalized-table refresh (T6), generalized beyond OSM.

Exactly-once across restarts: Structured Streaming may REPLAY the last
uncommitted micro-batch after a failure; the store records the last
applied `batch_id` in its version marker and makes replays no-ops — the
same bookkeeping move as the reference's `last.state.txt`
(update/cmd.go:322-384).

Scale: the merge shuffles only (existing keys ∪ batch keys), which for a
rollup is orders of magnitude smaller than the stream; the stream itself
is touched once per batch for the partial aggregate (map-side combine).
Versions are whole directories with an atomic marker flip, so readers
never see a partial table.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MERGEABLE = {"count", "sum", "hll"}


class RollupStore:
    """Versioned parquet rollup keyed by ``key_cols``.

    ``agg_spec`` maps output column -> ("count", None), ("sum",
    source_col), or ("hll", source_col). All are MERGEABLE: count/sum
    partials combine by summation, hll partials (HyperLogLog++ register
    sets from ``hll_sketch_agg``, ~KB binary per key) combine with
    ``hll_union_agg`` — so the store maintains approximate distinct
    counts over the full stream history while only ever shuffling
    rollup-sized state. ``estimates()`` exposes hll columns as bigint
    estimates.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        agg_spec: dict[str, tuple[str, str | None]],
        retain_versions: int = 2,
    ):
        for name, (kind, _src) in agg_spec.items():
            if kind not in _MERGEABLE:
                raise ValueError(f"{name}: non-mergeable agg {kind!r}")
        if retain_versions < 1:
            raise ValueError("retain_versions must be >= 1")
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.agg_spec = dict(agg_spec)
        self.retain_versions = retain_versions
        os.makedirs(path, exist_ok=True)

    # ---- versioning -------------------------------------------------

    def _marker(self) -> str:
        return os.path.join(self.path, "CURRENT")

    def _read_marker(self) -> tuple[int, int]:
        """(version, last_batch_id); (0, -1) before the first publish."""
        try:
            with open(self._marker()) as fh:
                v, b = fh.read().split()
                return int(v), int(b)
        except (FileNotFoundError, ValueError):
            return 0, -1

    def _publish(self, version: int, batch_id: int) -> None:
        tmp = self._marker() + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(f"{version} {batch_id}")
        os.replace(tmp, self._marker())

    def _table_dir(self, version: int) -> str:
        return os.path.join(self.path, f"v{version}")

    @property
    def last_batch_id(self) -> int:
        return self._read_marker()[1]

    def current(self) -> DataFrame | None:
        v, _ = self._read_marker()
        if v == 0:
            return None
        return self.spark.read.parquet(self._table_dir(v))

    # ---- merge ------------------------------------------------------

    def _partial(self, batch_df: DataFrame) -> DataFrame:
        aggs = []
        for name, (kind, src) in self.agg_spec.items():
            if kind == "count":
                aggs.append(F.count("*").alias(name))
            elif kind == "hll":
                aggs.append(F.hll_sketch_agg(src).alias(name))
            else:
                aggs.append(F.sum(src).alias(name))
        return batch_df.groupBy(*self.key_cols).agg(*aggs)

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Merge one micro-batch. Replays (batch_id <= last applied) are
        no-ops, making the foreachBatch sink effectively exactly-once."""
        version, last = self._read_marker()
        if batch_id <= last:
            return
        partial = self._partial(batch_df)
        cur = self.current()
        merged = (
            partial
            if cur is None
            else cur.unionByName(partial)
            .groupBy(*self.key_cols)
            .agg(
                *[
                    (
                        F.hll_union_agg(name) if kind == "hll" else F.sum(name)
                    ).alias(name)
                    for name, (kind, _src) in self.agg_spec.items()
                ]
            )
        )
        new_dir = self._table_dir(version + 1)
        merged.write.mode("overwrite").parquet(new_dir)
        self._publish(version + 1, batch_id)
        self._gc(current=version + 1)

    def _gc(self, current: int) -> None:
        """Delete every version older than ``current - retain_versions + 1``.

        Retaining the previous version (default retain=2) closes the reader
        race (a reader that loaded CURRENT just before the flip can still
        finish scanning v{n-1}); sweeping ALL stale v{k} dirs — not just the
        immediately previous one — means a crash between _publish and the
        sweep leaks nothing permanently: the next publish collects it."""
        floor = current - self.retain_versions + 1
        for name in os.listdir(self.path):
            if not name.startswith("v"):
                continue
            try:
                k = int(name[1:])
            except ValueError:
                continue
            if k < floor:
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)

    def estimates(self) -> DataFrame | None:
        """Current rollup with hll sketch columns replaced by their
        bigint estimates (count/sum columns pass through unchanged)."""
        cur = self.current()
        if cur is None:
            return None
        cols = [F.col(c) for c in self.key_cols]
        for name, (kind, _src) in self.agg_spec.items():
            if kind == "hll":
                cols.append(
                    F.hll_sketch_estimate(F.col(name)).alias(name)
                )
            else:
                cols.append(F.col(name))
        return cur.select(*cols)

    # ---- streaming sink ---------------------------------------------

    def sink(self):
        """foreachBatch callback: `.writeStream.foreachBatch(store.sink())`."""

        def write(batch_df: DataFrame, batch_id: int) -> None:
            self.apply_batch(batch_df, batch_id)

        return write
