"""Deterministic sampling operators for training-data curation.

Training pipelines need REPRODUCIBLE samples: the same corpus + the same
config must yield the same subset on any engine, any partitioning, any
executor count. Random() is out; everything here keys off the first 32
bits of md5 over the row id — the repo-wide convention for
engine-independent hashing (DuckDB reproduces it bit-exactly with
``CAST(concat('0x', substr(md5(CAST(id AS VARCHAR)), 1, 8)) AS BIGINT)``).
md5 mixes EVERY output bit, so modulus selection is uniform even on
structured id sets (block-allocated ids, shard-encoded low bits) — the
failure mode of multiplicative hashing, whose low bits are unmixed — and
the arithmetic cannot overflow in any engine.

Scale design:
- `hash_sample` is a pure filter — scan-speed, no shuffle, pushes down.
- `stratified_quota` (top-K per stratum by hash order) is one window over
  a shuffle on the stratum key. Strata counts are usually modest (sources,
  languages); per-stratum skew is bounded by the quota itself — the window
  only materializes rank <= K per partition via the rank filter, and at
  100 TB the right physical shape is exactly this: one exchange on the
  stratum key, no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def det_hash(id_col: Column) -> Column:
    """Deterministic 32-bit hash of an integer id: the first 8 hex chars
    of md5(CAST(id AS STRING)) as an unsigned integer. Uniform in all
    bits; reproducible in any engine with md5()."""
    return F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("bigint")


def hash_sample(df: DataFrame, id_col: str, pct: int) -> DataFrame:
    """Keep ~pct% of rows, deterministically, by id hash. Pure filter.
    Nested property: the pct=5 sample is a subset of the pct=20 sample."""
    return df.filter(det_hash(F.col(id_col)) % 100 < pct)


def stratified_quota(
    df: DataFrame, strata_col: str, id_col: str, quota: int
) -> DataFrame:
    """Keep at most `quota` rows per stratum, chosen by deterministic hash
    order (ties broken by id, so the selection is a total order)."""
    rk = "_rk"
    while rk in df.columns:  # never clobber a caller column
        rk += "_"
    w = Window.partitionBy(strata_col).orderBy(
        det_hash(F.col(id_col)).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn(rk, F.row_number().over(w))
        .filter(F.col(rk) <= quota)
        .drop(rk)
    )
