"""Model/score evaluation over distributed data: exact tie-corrected
ROC AUC (Mann-Whitney U form) without a global sort.

Reference parity note: imposm3 has no evaluation surface; this is part
of the analytics-engine extension set (scoring quality classifiers,
filter heuristics, ranking features over a corpus).

Exactness: with per-distinct-score counts t (total) and p (positives),
and less = #rows with strictly smaller score, the tie-averaged rank sum
of positives satisfies

    2*R_pos = sum_scores p * (2*less + t + 1)        (exact BIGINT)

so  AUC = (2*R_pos - P*(P+1)) / (2*P*N)  is ONE fixed-order float
division over exact integers — bit-identical to the SQL oracle.

Scale design (100 TB):

* One groupBy collapses the corpus to the distinct-score table (map-side
  combine); everything after runs at distinct-score cardinality.
* The prefix sum over score order uses the repo's two-phase pattern
  (range repartition + localCheckpoint to pin ONE sampled partitioning,
  per-partition totals -> driver prefix offsets -> mapInPandas local
  cumsum) — never a single-task global window.
* The rank-sum terms are O(P * n), so the BIGINT S stays in range up to
  ~3e9 rows; beyond that, switch the accumulators to DECIMAL(38,0) —
  noted here rather than silently overflowing (ANSI mode throws).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_prefix_counts(g: DataFrame, order_col: str) -> DataFrame:
    """Add `less` = sum of `t` over all rows with strictly smaller
    `order_col`, via the two-phase prefix-sum pattern."""
    from pyspark import TaskContext
    from pyspark.sql.types import LongType, StructField, StructType

    from imposm3_spark.datapipe.sampling import plan_parallelism

    n_parts = plan_parallelism(g)
    ordered = g.repartitionByRange(n_parts, order_col).sortWithinPartitions(
        order_col
    )
    ordered = ordered.localCheckpoint(eager=True)
    totals = (
        ordered.select(F.spark_partition_id().alias("_pid"), "t")
        .groupBy("_pid")
        .agg(F.sum("t").alias("s"))
        .collect()
    )
    by_pid = {r["_pid"]: int(r["s"]) for r in totals}
    offsets = {}
    acc = 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]

    schema = StructType(list(ordered.schema.fields) + [StructField("less", LongType())])

    def add_less(batches):
        pid = TaskContext.get().partitionId()
        running = offsets.get(pid, 0)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cum = pdf["t"].cumsum() + running
            running = int(cum.iloc[-1])
            yield pdf.assign(less=(cum - pdf["t"]).astype("int64"))

    return ordered.mapInPandas(add_less, schema=schema)


def roc_auc(
    df: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """Exact tie-corrected ROC AUC of `score_col` as a ranking of the
    binary `label_col` (1 = positive). Returns ONE row:
    (pos_cnt, neg_cnt, auc_num, auc_den, auc) where
    auc == auc_num / auc_den exactly — the integer pair is the exact
    rank-statistic rational (2*sum_pos_ranks - pc*(pc+1)) / (2*pc*nc),
    the representation the oracle gate compares."""
    g = (
        df.select(
            F.col(score_col).alias("score"),
            F.col(label_col).cast("long").alias("pos"),
        )
        .groupBy("score")
        .agg(F.sum("pos").alias("p"), F.count(F.lit(1)).alias("t"))
    )
    c = _with_prefix_counts(g, "score")
    agg = c.agg(
        F.sum(F.col("p") * (F.lit(2) * F.col("less") + F.col("t") + F.lit(1))).alias("s2"),
        F.sum("p").alias("pc"),
        F.sum(F.col("t") - F.col("p")).alias("nc"),
    )
    nonzero = (F.col("pc") > 0) & (F.col("nc") > 0)
    num = (F.col("s2") - F.col("pc") * (F.col("pc") + F.lit(1))).cast("bigint")
    den = (F.lit(2) * F.col("pc") * F.col("nc")).cast("bigint")
    return agg.select(
        F.col("pc").alias("pos_cnt"),
        F.col("nc").alias("neg_cnt"),
        F.when(nonzero, num).alias("auc_num"),
        F.when(nonzero, den).alias("auc_den"),
        F.when(
            nonzero,
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("auc"),
    )


def deterministic_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    mod: int = 4,
    keep: int = 0,
    salt: str = "sample:",
) -> DataFrame:
    """Engine-portable deterministic row sample (the `sample_frac` knob
    for exact-truth evaluations): keep rows whose salted-id md5 bucket
    equals ``keep`` — a keep-rate of 1/mod. The hash is the first 8 hex
    digits of md5(salt || id) as an integer, reproducible bit-for-bit in
    any engine (pair with :func:`deterministic_sample_sql` in oracles).

    Scale rationale: exact pairwise truth sets (ppjoin, exact Jaccard)
    are quadratic in corpus size by definition. Evaluations don't need
    the full corpus — a deterministic 1/mod document sample bounds the
    truth-set cost by 1/mod^2 while keeping the eval reproducible and
    oracle-checkable, unlike rand()-based sampling. See docs/SCALE.md.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return df.where(h % mod == keep)


def sampled_table_sql(
    sql: str, table: str = "documents", id_col: str = "doc_id", mod: int = 2
) -> str:
    """Rewrite an oracle that reads `table` to read the deterministic
    1/mod sample instead (default mod=2: a 1/2 keep rate, so PAIRWISE
    truth cost drops by 1/4): merge a shadowing CTE (schema-qualified
    base so DuckDB doesn't see a circular reference) into the first WITH
    clause — the exact same rows :func:`deterministic_sample` keeps on
    the Spark side. A ``WITH RECURSIVE`` clause keeps RECURSIVE first
    (it applies to the whole CTE list)."""
    cte = (
        f"{table} AS (SELECT * FROM main.{table} WHERE "
        + deterministic_sample_sql(id_col=id_col, mod=mod)
        + "), "
    )
    for kw in ("WITH RECURSIVE ", "WITH "):
        head, _, tail = sql.partition(kw)
        if tail:
            return head + kw + cte + tail
    raise AssertionError("oracle has no WITH clause to merge into")


def sampled_docs_sql(sql: str, mod: int = 2) -> str:
    """`sampled_table_sql` over the documents table (the common case)."""
    return sampled_table_sql(sql, table="documents", id_col="doc_id", mod=mod)


def deterministic_sample_sql(
    id_col: str = "doc_id",
    mod: int = 4,
    keep: int = 0,
    salt: str = "sample:",
) -> str:
    """DuckDB predicate computing the identical sample as
    :func:`deterministic_sample` (same md5-prefix hash, same bucket)."""
    return (
        f"CAST(concat('0x', substr(md5('{salt}' || CAST({id_col} AS VARCHAR)),"
        f" 1, 8)) AS BIGINT) % {mod} = {keep}"
    )
