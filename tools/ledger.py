"""Driver-evidence ledger: union of CORRECTNESS_r*.json vs the registry.

VERDICT r3 "What's wrong" #1: the hand-maintained rotation notes lost six
never-recorded queries. This script replaces hand accounting — it unions
every ``CORRECTNESS_r*.json`` in the repo root against the live registry
and reports, per query, the most recent round with a driver-recorded row
(and its status), so the next round's window can be built mechanically.

Usage::

    python tools/ledger.py            # summary + never-recorded list
    python tools/ledger.py --ages     # full per-query age table
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from udacity_data_engineering_capstone_project_spark.plans.registry import ALL_QUERIES  # noqa: E402


def load_rounds(root: str) -> dict[int, dict]:
    rounds = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)
    return rounds


def ledger(root: str = ".") -> dict:
    rounds = load_rounds(root)
    latest = max(rounds) if rounds else 0
    per_query: dict[str, dict] = {}
    for name in ALL_QUERIES:
        last_round, status = None, None
        for r in sorted(rounds, reverse=True):
            if name in rounds[r]:
                last_round = r
                row = rounds[r][name]
                if isinstance(row, dict):
                    if row.get("err") == "no_oracle":
                        status = "no_oracle"
                    elif row.get("err"):
                        status = "err"
                    elif row.get("hash_match"):
                        status = "green"
                    elif row.get("rows_match") and "hash_match" not in row:
                        status = "rows_only"
                    else:
                        status = "rows_only" if row.get("rows_match") else "MISMATCH"
                else:
                    status = str(row)
                break
        per_query[name] = {
            "last_round": last_round,
            "status": status,
            "age": (latest - last_round) if last_round is not None else None,
        }
    never = [n for n, v in per_query.items() if v["last_round"] is None]
    return {
        "rounds_seen": sorted(rounds),
        "registry_size": len(ALL_QUERIES),
        "recorded_ever": len(ALL_QUERIES) - len(never),
        "never_recorded": never,
        "per_query": per_query,
    }


def main() -> None:
    led = ledger(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    print(
        f"registry={led['registry_size']} recorded_ever={led['recorded_ever']} "
        f"never_recorded={len(led['never_recorded'])} rounds={led['rounds_seen']}"
    )
    for n in led["never_recorded"]:
        print(f"  NEVER  {n}")
    if "--ages" in sys.argv:
        for n, v in sorted(
            led["per_query"].items(),
            key=lambda kv: (-(kv[1]["age"] if kv[1]["age"] is not None else 99), kv[0]),
        ):
            print(f"  r{v['last_round']}  age={v['age']}  {str(v['status']):<12} {n}")


if __name__ == "__main__":
    main()
