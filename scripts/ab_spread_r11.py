"""In-JVM alternating-arm A/B of the spread_small_input change (round 11).

One warm JVM; for each query, arms alternate B,A,B,A,... where arm A is
the committed code and arm B sets SPARK_GRAFT_SPREAD=0 (the kill switch
read per call inside spread_small_input). Alternation inside one session
cancels the box's slow-set drift (round-10 protocol); medians per arm.

Usage: python scripts/ab_spread_r11.py <trials-per-arm> <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imposm3_spark import benchqueries as bq  # noqa: E402
from imposm3_spark.session import get_spark  # noqa: E402


def main() -> None:
    trials = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-spread-r11")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        fn = bq.QUERIES[name]
        # one unmeasured warmup per arm (codegen compile)
        for arm in ("0", "1"):
            os.environ["SPARK_GRAFT_SPREAD"] = arm
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        arms = {"0": [], "1": []}
        for i in range(trials * 2):
            arm = "0" if i % 2 == 0 else "1"
            os.environ["SPARK_GRAFT_SPREAD"] = arm
            spark.sparkContext.setJobDescription(f"{name} arm={arm} t={i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            arms[arm].append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        os.environ.pop("SPARK_GRAFT_SPREAD", None)
        med0, med1 = statistics.median(arms["0"]), statistics.median(arms["1"])
        out[name] = {"off_median": med0, "on_median": med1,
                     "off": arms["0"], "on": arms["1"]}
        print(f"{name}: spread-off {med0:.3f} s -> spread-on {med1:.3f} s "
              f"(off {arms['0']} | on {arms['1']})", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
