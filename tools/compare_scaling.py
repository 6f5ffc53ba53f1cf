"""Compare two bench JSON artifacts and print per-query ratios.

Usage: python tools/compare_scaling.py BASE.json SCALED.json [factor]

Prints queries sorted by ratio descending, flagging anything whose
wall grew more than sqrt(factor) (superlinear-suspect at a
factor-times data scale-up under 32 fixed cores, where perfectly
linear work with perfect parallelism would grow ~factor/32 .. factor).
Pure file tool — no Spark.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    base = json.load(open(sys.argv[1]))
    scaled = json.load(open(sys.argv[2]))
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    bq, sq = base["queries"], scaled["queries"]
    rows = []
    for name, sv in sq.items():
        if name in bq and bq[name] > 0:
            rows.append((round(sv / bq[name], 2), name, bq[name], sv))
    rows.sort(reverse=True)
    flag_at = factor ** 0.5
    for r, name, b, s in rows:
        flag = "  <-- SUPERLINEAR-SUSPECT" if r > flag_at else ""
        print(f"{r:8.2f}x  {name:36s} {b:9.3f} -> {s:9.3f}{flag}")
    print(
        f"\ntotal: {base.get('value')} -> {scaled.get('value')} "
        f"({round(scaled.get('value', 0) / max(base.get('value', 1), 0.001), 2)}x); "
        f"canary base {base.get('canary_ratio')} scaled {scaled.get('canary_ratio')}"
    )


if __name__ == "__main__":
    main()
