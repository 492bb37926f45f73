"""Profile the bench query loop: split each query's timed cost into
driver-side plan CONSTRUCTION (fn(spark, sf_dir) — py4j Column building),
ANALYSIS (df.schema — catalyst analysis), and EXECUTION (df.count(), the
bench's timed action). Writes /tmp/loop_profile_<tag>.json.

The bench's timed region is construction + count; this decomposition says
whether the loop total is dominated by small-query fixed overhead (driver
work) or by real executor compute — guide §1 (measure first) before
touching any operator.

Usage: python scripts/profile_loop_r10.py <tag> [--queries name ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from imposm3_spark import benchqueries as bq
from imposm3_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "profile"
    names = sys.argv[3:] if len(sys.argv) > 3 and sys.argv[2] == "--queries" else list(bq.QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("loop-profile-r10")
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup discipline as bench.py
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    @pandas_udf("long")
    def _warm(v: pd.Series) -> pd.Series:
        return v

    spark.range(1000).select(F.sum(_warm(F.col("id")))).collect()
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    for _name in names:
        try:
            bq.QUERIES[_name](spark, warm_dir).count()
        except Exception:
            pass
    gc.collect()
    for _ in range(3):
        spark.range(1_000_000).count()
        time.sleep(1.0)

    out = {}
    for name in names:
        fn = bq.QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        _ = df.schema  # triggers analysis
        t2 = time.perf_counter()
        n = df.count()
        t3 = time.perf_counter()
        out[name] = {
            "build": round(t1 - t0, 4),
            "analyze": round(t2 - t1, 4),
            "execute": round(t3 - t2, 4),
            "total": round(t3 - t0, 4),
            "rows": n,
        }
        df = None
        gc.collect()
    path = f"/tmp/loop_profile_{tag}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    tot = {k: sum(v[k] for v in out.values()) for k in ("build", "analyze", "execute", "total")}
    print(json.dumps({"tag": tag, "n": len(out), "sums": {k: round(v, 2) for k, v in tot.items()}}))
    top = sorted(out.items(), key=lambda x: -x[1]["total"])[:25]
    for q, v in top:
        print(f"{v['total']:8.3f}  build={v['build']:6.3f} analyze={v['analyze']:6.3f} exec={v['execute']:7.3f}  {q}")
    print(f"written: {path}")
    spark.stop()


if __name__ == "__main__":
    main()
