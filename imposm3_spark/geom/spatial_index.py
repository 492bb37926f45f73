"""Z-order (Morton) spatial clustering for the parquet write path.

At 100 TB the dominant cost of a spatial query is which row groups the
scan can SKIP. Parquet keeps min/max statistics per row group; if rows
are written in random spatial order, every row group's x/y min-max spans
the planet and nothing prunes. Sorting the write by a space-filling-curve
key makes row groups spatially tight, so a bbox predicate over the
quantized coordinates prunes most of the file — the standard lakehouse
"Z-ORDER BY" technique, expressed here as plain Spark expressions (bit
interleave = shifts and ORs, whole-stage codegen'd; no UDF).

The reference's analog is its spatial GIST index on the PostGIS side
(postgis.go finish/optimize); on a data lake the ordering IS the index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(v: Column, lo: float, hi: float, bits: int) -> Column:
    """Clamp v into [lo, hi] and quantize to an integer in [0, 2^bits)."""
    cells = (1 << bits) - 1
    frac = (v.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    frac = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    return F.round(frac * F.lit(float(cells))).cast("bigint")


def interleave_bits(qx: Column, qy: Column, bits: int) -> Column:
    """Morton interleave: bit b of qx -> bit 2b, bit b of qy -> bit 2b+1.
    Pure shift/and/or expression tree — stays inside codegen."""
    out = F.lit(0).cast("bigint")
    for b in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(qx, b).bitwiseAND(F.lit(1)), 2 * b)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(qy, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return out


def zorder_key(
    x: Column,
    y: Column,
    bbox: tuple[float, float, float, float],
    bits: int = 16,
) -> Column:
    """Z-order key of a point within ``bbox`` (minx, miny, maxx, maxy).
    bits=16 gives a 32-bit key: ~600 m cells at planet scale in web
    mercator — row-group-sized locality, not a precise index."""
    minx, miny, maxx, maxy = bbox
    return interleave_bits(
        quantize(x, minx, maxx, bits), quantize(y, miny, maxy, bits), bits
    )


def cluster_by_zorder(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bbox: tuple[float, float, float, float],
    bits: int = 16,
    n_files: int | None = None,
) -> DataFrame:
    """Return ``df`` re-ordered for a spatially-clustered write:
    range-partitioned AND sorted within partitions by the z-order key, so
    every output file covers a compact spatial extent and its parquet
    min/max stats prune. Use directly before ``.write.parquet(...)``."""
    keyed = df.withColumn("__z", zorder_key(F.col(x_col), F.col(y_col), bbox, bits))
    parts = n_files or df.sparkSession.sparkContext.defaultParallelism
    return (
        keyed.repartitionByRange(parts, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
