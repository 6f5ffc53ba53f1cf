"""Per-query ratio analysis for the 1000x full-headline run (round 8).

Reads the refreshed 100x section of BENCH_SCALING.json and the
.scratch/bench_1000x_r8.json artifact (last line = the bench JSON) and
prints per-query 100x->1000x ratios sorted descending — the cliff-hunt
view the r6/r7 full-scale runs used. Queries absent from either side
(new-in-r8, or excluded ceilings) print separately.

Usage: python tools/compare_1000x.py [bench_1000x_json] [scaling_json]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    bench_path = sys.argv[1] if len(sys.argv) > 1 else ".scratch/bench_1000x_r8.json"
    scaling_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SCALING.json"
    last = [
        ln for ln in open(bench_path).read().splitlines() if ln.startswith("{")
    ][-1]
    b1000 = json.loads(last)
    scaling = json.load(open(scaling_path))
    q100 = scaling["sf10f_100x"]["queries"]
    q1000 = b1000["queries"]

    rows = []
    for name, t in q1000.items():
        if name in q100 and q100[name] > 0:
            rows.append((t / q100[name], name, q100[name], t))
    rows.sort(reverse=True)
    print(f"total_1000x={b1000['value']}s  canary={b1000.get('canary_ratio')}")
    print(f"{'ratio':>7}  {'100x_s':>8}  {'1000x_s':>8}  query")
    for r, name, a, t in rows:
        print(f"{r:7.2f}  {a:8.2f}  {t:8.2f}  {name}")
    only_new = sorted(set(q1000) - set(q100))
    if only_new:
        print("\nno 100x baseline (new/replaced queries):")
        for name in only_new:
            print(f"  {name}: {q1000[name]}s")


if __name__ == "__main__":
    main()
