"""Attribute the driver-side "build" phase of heavy queries: py4j round
trips (call count x per-call latency) vs JVM-side catalyst planning
(few calls, one slow). Guide §1 (measure first) — the round's loop
profile showed 177 s of the 331 s loop is build; this says WHICH KIND.

For each query: cProfile fn(spark, sf_dir), report wall, py4j
send_command call count + cumulative time, and the top own-time Python
frames. A high call count (tens of thousands) means Column-construction
chatter; a low count with high cumtime means the JVM is planning
(lazy localCheckpoint forces physical planning at build).

Usage: python scripts/profile_build_r10.py <query> [query ...]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imposm3_spark import benchqueries as bq  # noqa: E402
from imposm3_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("build-profile-r10")
    spark.sparkContext.setLogLevel("ERROR")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    for name in names:
        # warm once (JIT + table handles) so the profile sees steady state
        try:
            bq.QUERIES[name](spark, warm_dir).count()
        except Exception:
            pass
    for name in names:
        fn = bq.QUERIES[name]
        pr = cProfile.Profile()
        t0 = time.perf_counter()
        pr.enable()
        df = fn(spark, sf_dir)
        pr.disable()
        wall = time.perf_counter() - t0
        s = io.StringIO()
        st = pstats.Stats(pr, stream=s)
        st.sort_stats("cumulative").print_stats(18)
        txt = s.getvalue()
        # py4j chatter metric
        sends = [
            ln
            for ln in txt.splitlines()
            if "java_gateway" in ln and ("send_command" in ln or "_get_connection" in ln)
        ]
        print(f"\n===== {name}: build wall {wall:.3f} s =====")
        for ln in sends[:4]:
            print("  py4j:", ln.strip())
        for ln in txt.splitlines()[4:30]:
            print(ln)
        t1 = time.perf_counter()
        n = df.count()
        print(f"  execute(count)={time.perf_counter()-t1:.3f} s rows={n}")
    spark.stop()


if __name__ == "__main__":
    main()
