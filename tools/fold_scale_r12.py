"""Fold the round-12 scale runs into BENCH_SCALING.json.

Round-12 goals (VERDICT r11 next #1/#2/#7):

- ``sf10f_100x_r12``: the 100x denominator becomes a per-query MIN of
  TWO quiet runs (the r11 base + this round's second stamp, VERDICT
  #7) for queries whose executed code did not change — bounding the
  run-to-run variance under every decade gate. Rows whose executed
  path changed this round (SERVING_CHANGED: routing-plan budget
  pre-check on the IVF serves; heal tolerance + crossing-dir
  auto-compaction on the index maintenance paths) take the r12 run
  alone — the no-vintage-mixing rule.
- ``sf100_1000x_r12``: SERVING_CHANGED rows from the r12 1000x run;
  every other row carried from ``sf100_1000x_r11`` (same executed
  code). Per ADVICE r11 #5, any SERVING_CHANGED row that did NOT land
  in the r12 1000x run is dropped from the tier AND the gap is logged
  to stderr and recorded in the methodology string, so lost coverage
  is visible in the artifact instead of silent.
- decade ratios re-folded against the two-run 100x base, feeding the
  q9 adjudication table in SCALE.md (probe artifact:
  .scratch/probe_q9_r12.json).

Usage: python tools/fold_scale_r12.py [--write] [--force]
"""

from __future__ import annotations

import json
import sys

#: rows whose EXECUTED code changed in round 12 — r11 values at either
#: tier are old-code for these and are never min'd in.
SERVING_CHANGED = {
    "ann_topk_ivf",
    "ann_recall_sweep",
    "ivf_trained_recall",
    "bitext_mining_ivf",
    "ann_hubness_audit_ivf",
    "trigram_search_appended",
    "trigram_search_indexed",
    "minhash_pairs_indexed",
}


def last_json(path: str) -> dict:
    lines = [ln for ln in open(path).read().splitlines() if ln.startswith("{")]
    return json.loads(lines[-1])


def main() -> None:
    write = "--write" in sys.argv
    force = "--force" in sys.argv
    scaling = json.load(open("BENCH_SCALING.json"))

    b100_r12 = last_json(".scratch/bench_100x_r12.json")
    quiet = (
        b100_r12.get("canary_ratio", 99) <= 1.2
        and b100_r12.get("episode_suspect") is False
    )
    if not quiet and not force:
        print(
            f"100x r12 run NOT quiet (canary_ratio="
            f"{b100_r12.get('canary_ratio')}, episode_suspect="
            f"{b100_r12.get('episode_suspect')}) — refusing to stamp; "
            "rerun stage 2 or pass --force.",
            file=sys.stderr,
        )
        sys.exit(1)

    prev100 = scaling["sf10f_100x_r11"]["queries"]
    q100, src100 = {}, {}
    for q, t in b100_r12["queries"].items():
        q100[q], src100[q] = t, "r12"
    for q, t in prev100.items():
        if q in SERVING_CHANGED:
            continue  # r11 base is old-code for these
        if q not in q100 or t < q100[q]:
            q100[q], src100[q] = t, "r11_quiet_min"

    b1000_r12 = last_json(".scratch/bench_1000x_r12.json")
    prev1000 = scaling["sf100_1000x_r11"]["queries"]
    q1000, src1000 = {}, {}
    for q, t in b1000_r12["queries"].items():
        q1000[q], src1000[q] = t, "r12"
    for q, t in prev1000.items():
        if q in SERVING_CHANGED:
            continue
        if q not in q1000:
            q1000[q], src1000[q] = t, "r11_same_code"

    # ADVICE r11 #5: make lost coverage visible — changed rows the r12
    # 1000x run did not measure are dropped from the tier, loudly.
    missing_1000 = sorted(SERVING_CHANGED - set(b1000_r12["queries"]))
    if missing_1000:
        print(
            f"COVERAGE GAP: SERVING_CHANGED rows with no r12 1000x "
            f"measurement (dropped from the tier): {missing_1000}",
            file=sys.stderr,
        )
    gap_note = (
        ""
        if not missing_1000
        else f" COVERAGE GAP: changed rows not measured at 1000x this "
        f"round and therefore dropped from the tier: {missing_1000}."
    )

    ratios = {}
    for q, t1000 in q1000.items():
        base = q100.get(q)
        if base:
            ratios[q] = round(t1000 / base, 1)

    tier100 = {
        "queries": q100,
        "base_source": src100,
        "value": round(sum(q100.values()), 3),
        "runs": {
            "r12": {
                "canary_ratio": b100_r12.get("canary_ratio"),
                "episode_suspect": b100_r12.get("episode_suspect"),
            },
            "r11": {
                "canary_ratio": scaling["sf10f_100x_r11"].get("canary_ratio"),
                "episode_suspect": scaling["sf10f_100x_r11"].get(
                    "episode_suspect"
                ),
            },
        },
        "methodology": (
            "Round-12 100x base (VERDICT r11 next #7): per-query MIN of "
            "the TWO quiet-gated runs (r11 + r12) for same-executed-code "
            "rows; SERVING_CHANGED rows (routing-plan budget pre-check, "
            "heal tolerance, crossing-dir auto-compaction) take the r12 "
            "run alone — no vintage mixing."
            + (
                ""
                if quiet
                else " WARNING: stamped with --force on a NON-quiet r12 "
                "run; its rows carry inflation (understates ratios)."
            )
        ),
    }
    tier1000 = {
        "queries": q1000,
        "base_source": src1000,
        "runs": {
            "r12": {
                "canary_ratio": b1000_r12.get("canary_ratio"),
                "episode_suspect": b1000_r12.get("episode_suspect"),
            }
        },
        "ratio_vs_100x_r12": ratios,
        "methodology": (
            "Round-12 1000x tier: SERVING_CHANGED rows measured on r12 "
            "code; unchanged rows carried from sf100_1000x_r11 (source "
            "'r11_same_code'). Ratios divide by the two-run folded "
            "quiet 100x base." + gap_note
        ),
    }

    print(
        json.dumps(
            {
                "n_100x": len(q100),
                "n_1000x": len(q1000),
                "missing_changed_1000x": missing_1000,
                "worst_ratios": dict(
                    sorted(ratios.items(), key=lambda kv: -kv[1])[:10]
                ),
            },
            indent=1,
        )
    )
    if write:
        scaling["sf10f_100x_r12"] = tier100
        scaling["sf100_1000x_r12"] = tier1000
        with open("BENCH_SCALING.json", "w") as fh:
            json.dump(scaling, fh, indent=1)
        print("written to BENCH_SCALING.json", file=sys.stderr)


if __name__ == "__main__":
    main()
