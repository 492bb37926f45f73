"""Per-query bench medians across BENCH_HISTORY.jsonl runs.

Single-run walls on the bench box swing 2x with roaming slow sets
(docs/ROUND9.md forensics: same-code query loops at 272 s and 359 s in
one session; round-8 recorded 251-498 s). bench.py appends every run's
per-query timings to BENCH_HISTORY.jsonl; this tool prints the median
(and min/max spread) per query so regressions are judged on the robust
statistic, not one sample.

Besides the median table, the tool emits a REGRESSION VERDICT for the
newest run at each sf: any query whose newest wall exceeds 1.5x its
median across >=3 total samples is flagged (the threshold sits above the
box's observed same-code noise envelope for mid-loop queries, below a
real plan regression). Exit code 2 when the newest sf0.1 run has flags,
so round scripts can gate on it.

Usage:
    python scripts/bench_medians.py [top_n]      # default 25, 0 = all
"""

from __future__ import annotations

import json
import os
import statistics
import sys

HISTORY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_HISTORY.jsonl",
)


def main() -> int:
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    if not os.path.exists(HISTORY):
        print(f"no history at {HISTORY} — run bench.py first")
        return 1
    rc = 0
    all_runs = [json.loads(ln) for ln in open(HISTORY) if ln.strip()]
    by_sf: dict[float, list[dict]] = {}
    for r in all_runs:
        by_sf.setdefault(r.get("sf"), []).append(r)
    for sf in sorted(by_sf, key=lambda x: (x is None, x)):
        runs = by_sf[sf]
        per_q: dict[str, list[float]] = {}
        for r in runs:
            for q, sec in r.get("queries", {}).items():
                per_q.setdefault(q, []).append(sec)
        rows = sorted(
            (
                (statistics.median(v), min(v), max(v), len(v), q)
                for q, v in per_q.items()
            ),
            reverse=True,
        )
        totals = [r["total"] for r in runs if r.get("total") is not None]
        print(
            f"\nsf={sf}: {len(runs)} runs; loop total median "
            f"{statistics.median(totals):.1f} s (min {min(totals):.1f}, "
            f"max {max(totals):.1f})"
        )
        print(f"{'median':>8} {'min':>7} {'max':>7} {'n':>3}  query")
        for med, lo, hi, n, q in rows[: top_n or None]:
            print(f"{med:8.2f} {lo:7.2f} {hi:7.2f} {n:3d}  {q}")

        # regression verdict: newest run vs per-query median (needs >=3
        # samples so one noisy tail can't both set and trip the bar).
        # Exit-code flags additionally require the SAME query over the bar
        # in the two newest runs: the box's same-code noise envelope is a
        # documented 2x on whole runs (docs/ROUND9.md forensics — run 9 of
        # the history flagged 50+ queries across every family at once,
        # which is a slow BOX, not 50 plan regressions), and genuine plan
        # regressions persist while turbulence roams.
        ordered = sorted(runs, key=lambda r: r.get("ts", 0))
        newest = ordered[-1]
        prev = ordered[-2] if len(ordered) >= 2 else {}

        def over(run, q):
            hist = per_q.get(q, [])
            sec = run.get("queries", {}).get(q)
            if sec is None or len(hist) < 3:
                return None
            med = statistics.median(hist)
            # ignore sub-second queries: fixed job overhead dominates them
            # and 1.5x of 0.3 s is scheduler jitter, not a plan
            return (sec / med, sec, med) if sec > 1.5 * med and sec > 1.0 else None

        flags, persistent = [], []
        for q in newest.get("queries", {}):
            hit = over(newest, q)
            if hit:
                flags.append((*hit, q))
                if over(prev, q):
                    persistent.append(q)
        if flags:
            kind = "PERSISTENT (2 newest runs)" if persistent else "newest run only"
            print(f"  regression flags >1.5x median, n>=3 — {kind}:")
            for ratio, sec, med, q in sorted(flags, reverse=True):
                mark = " [persistent]" if q in persistent else ""
                print(f"    {q}: {sec:.2f} s vs median {med:.2f} s ({ratio:.2f}x){mark}")
            if sf == 0.1 and persistent:
                rc = 2
        else:
            print("  regression verdict: clean (newest run within 1.5x medians)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
