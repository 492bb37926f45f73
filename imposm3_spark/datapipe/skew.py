"""Skew-safe building blocks: salted aggregation and salted broadcast join.

At 100 TB a handful of hot keys (one viral user_id, one near-empty
language bucket, the "" tag value) can put an entire aggregation or join
on one straggler task. Two standard remedies, expressed as reusable
DataFrame combinators with EXACT semantics (both are value-checked
against plain GROUP BY / JOIN oracles):

- ``salted_agg``: two-phase aggregation. Phase 1 groups by
  (key, salt = hash(whole row) % n_salts) so a hot key's rows spread over
  ``n_salts`` reducers; phase 2 merges the partial states per key. Works
  for any algebraic aggregate (sum/count/min/max — and avg as sum+count).
  This is what AQE's skew handling cannot do for aggregations (AQE splits
  skewed JOIN partitions, not skewed GROUP BY keys).
- ``salted_broadcast_join``: replicate-broadcast join for when the SMALL
  side is the skewed one is unnecessary (broadcast handles it); the
  combinator here targets a large probe side joining a medium build side
  whose keys are skewed in the probe: build rows are replicated n_salts
  times (explode), probe rows get a deterministic salt, and the join key
  becomes (key, salt) — each hot key now lands on n_salts reducers.

Salts are deterministic (xxhash64 of stable columns, not rand()), so runs
are reproducible and retried tasks produce identical output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import MapType


def _salt(cols: list[str], n_salts: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}. The partial/merge pair per fn: sum/sum,
    count/sum, min/min, max/max. ``salt_cols`` defaults to every non-key
    column used by the aggregates (deterministic spread).
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for _out, (_c, fn) in aggs.items():
        if fn not in merge_fn:
            raise ValueError(f"unsupported aggregate {fn}")
    salt_cols = salt_cols or sorted({c for c, _fn in aggs.values()})
    salted = df.withColumn("__salt", _salt(salt_cols, n_salts))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            getattr(F, fn)(F.col(c)).alias(out)
            for out, (c, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            getattr(F, merge_fn[fn])(F.col(out)).alias(out)
            for out, (_c, fn) in aggs.items()
        ]
    )


def salted_broadcast_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the probe side's ``key`` distribution is skewed:
    build rows explode into n_salts copies keyed (key, salt); probe rows
    take one deterministic salt — a hot probe key spreads over n_salts
    reducers instead of one. Exact same rows as probe.join(build, key).

    ``salt_cols``: probe columns hashed for the salt (default: all probe
    columns except the key — row-identity spread)."""
    salt_cols = salt_cols or [c for c in probe.columns if c != key]
    if not salt_cols:
        raise ValueError("need at least one non-key probe column to salt on")
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    p = probe.withColumn("__salt", _salt(salt_cols, n_salts))
    return p.join(b, [key, "__salt"], how).drop("__salt")


def hot_keys(
    probe: DataFrame,
    key: str,
    threshold: int,
    sample_mod: int = 100,
    sample_cols: list[str] | None = None,
) -> DataFrame:
    """Estimate the probe keys whose row count exceeds ``threshold``.

    Counts a deterministic 1/``sample_mod`` hash-sample of the probe (so
    the detection pass shuffles ~1% of one column, not the table) and
    scales up.

    ``sample_cols`` picks the columns hashed for the sample — default:
    every hashable (non-map) column. The hash must VARY WITHIN a key:
    hashing the key alone samples 1% of keys all-or-nothing, and a probe
    projected down to columns that repeat per key has the same failure
    (identical rows always hash together — with sample_mod=100 such a key
    is invisible 99% of the time). When the probe carries no per-row
    distinguishing column, pass sample_cols=[<a unique id>] or add one
    upstream; the function raises if only the key itself is available."""
    if sample_cols is None:
        hashable = [
            f.name
            for f in probe.schema.fields
            if not isinstance(f.dataType, MapType)
        ]
        sample_cols = [c for c in hashable if c != key] or hashable
    if sample_cols == [key]:
        raise ValueError(
            "hot_keys needs a column that varies within a key to sample on "
            "(hashing only the key samples keys all-or-nothing); pass "
            "sample_cols or add a row-id column"
        )
    s = probe.filter(
        F.pmod(F.xxhash64(*[F.col(c) for c in sample_cols]), F.lit(sample_mod)) == 0
    )
    return (
        s.groupBy(key)
        .agg((F.count("*") * sample_mod).alias("est"))
        .filter(F.col("est") > threshold)
        .select(key)
    )


# above this many hot keys an isin() predicate stops being sensible; the
# threshold bound (rows/threshold) should keep real workloads far below it
_MAX_COLLECTED_HOT_KEYS = 10_000


def hot_key_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    threshold: int = 1_000_000,
    how: str = "inner",
    sample_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-immune equi-join that pays nothing on cold keys.

    The full-replication salted join (salted_broadcast_join) multiplies
    the ENTIRE build side by n_salts — wasteful when skew is confined to
    a handful of keys, which is what real skew looks like. This splits by
    measured key frequency instead:

    - cold keys: plain shuffle join (AQE handles residual imbalance);
    - hot keys:  the build rows for hot keys are AT MOST a few rows per
      hot key times a bounded hot-key count — broadcast them and join
      WITHOUT shuffling the (huge, skewed) hot probe slice at all.

    The union is exactly probe JOIN build. Cost: ONE detection pass (a 1%
    hash-sample aggregation, collected to the driver — bounded by
    rows/threshold keys) plus the split join; when no key is hot this
    returns the plain join unchanged, so the overhead on unskewed data is
    exactly the detection pass. `threshold` is the per-key probe row count
    above which a key routes to the broadcast path — size it near
    rows-per-task (a key under it cannot straggle a task by more than ~1
    task's work). This call is EAGER: the detection sample runs a Spark
    job immediately.

    Only inner/left joins are safe to split this way (the split is on the
    probe key value; right/full outer would need build-side accounting).
    """
    if how not in ("inner", "left"):
        raise ValueError("hot_key_join supports inner/left joins")
    hk_rows = [
        r[0]
        for r in hot_keys(
            probe, key, threshold, sample_cols=sample_cols
        ).limit(_MAX_COLLECTED_HOT_KEYS + 1).collect()
    ]
    if not hk_rows:
        return probe.join(build, key, how)
    if len(hk_rows) > _MAX_COLLECTED_HOT_KEYS:
        # degenerate "everything is hot" — splitting buys nothing, and a
        # broadcast of the hot build slice would no longer be small
        return probe.join(build, key, how)
    is_hot = F.col(key).isin(hk_rows)
    cold = probe.filter(~is_hot).join(build, key, how)
    hot = probe.filter(is_hot).join(
        F.broadcast(build.filter(is_hot)), key, how
    )
    return cold.unionByName(hot)
