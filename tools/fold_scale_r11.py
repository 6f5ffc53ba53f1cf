"""Fold the round-11 scale runs into BENCH_SCALING.json.

Round-11 goals (VERDICT r10 next #1/#2/#3/#4):

- ``sf10f_100x_r11``: ONE trustworthy 100x base — a run that passed
  tools/quiet_gate.py (canary_ratio <= 1.2 AND episode_suspect false),
  ending the min-across-episode-suspect-runs era. Every decade ratio
  this round divides by it. If the accepted run still carries
  episode_suspect=true (the runner exhausted its retries), the fold
  refuses to stamp unless --force is given, and says so in the tier's
  methodology string.
- ``sf100_1000x_r11``: the r11-changed rows (two-level serving
  adoption, trigram auto-compact) measured on r11 code, with same-code
  carryover from the r10 tier for queries whose executed code did NOT
  change this round (listed per query in ``base_source``). Queries
  whose code changed (SERVING_CHANGED) must come from the r11 run —
  r10 values for them are discarded, never min'd (the no-vintage-mixing
  rule).
- decade ratios re-folded against the quiet 100x base, with the two
  watch items (star_join_bucketed 13.2x, heavy_hitter_tokens 12.3x)
  re-stated from clean bases plus their phase-probe artifacts
  (.scratch/probe_starjoin_r11.json / probe_hh_r11.json).

Usage: python tools/fold_scale_r11.py [--write] [--force]
"""

from __future__ import annotations

import json
import sys

#: rows whose EXECUTED code changed in round 11 (two-level adoption,
#: bounded cell dial, trigram postings/auto-compact): the r10 1000x
#: values are old-code and invalid for these.
SERVING_CHANGED = {
    "ann_topk_ivf",
    "ann_recall_sweep",
    "ivf_trained_recall",
    "bitext_mining_ivf",
    "trigram_search_appended",
    "trigram_search_indexed",
    "trigram_search_like",  # postings derivation length guard
}


def last_json(path: str) -> dict:
    lines = [ln for ln in open(path).read().splitlines() if ln.startswith("{")]
    return json.loads(lines[-1])


def main() -> None:
    write = "--write" in sys.argv
    force = "--force" in sys.argv
    scaling = json.load(open("BENCH_SCALING.json"))

    b100 = last_json(".scratch/bench_100x_r11.json")
    quiet = (
        b100.get("canary_ratio", 99) <= 1.2
        and b100.get("episode_suspect") is False
    )
    if not quiet and not force:
        print(
            f"100x base NOT quiet (canary_ratio={b100.get('canary_ratio')}, "
            f"episode_suspect={b100.get('episode_suspect')}) — refusing to "
            "stamp; rerun stage 2 or pass --force.",
            file=sys.stderr,
        )
        sys.exit(1)

    b1000 = last_json(".scratch/bench_1000x_r11.json")
    runs = [("r11a", b1000)]
    for tag in ("b", "c"):
        try:
            runs.append(
                (f"r11{tag}", last_json(f".scratch/bench_1000x_r11{tag}.json"))
            )
        except FileNotFoundError:
            pass
    prev1000 = scaling["sf100_1000x_r10"]["queries"]
    q1000, src1000 = {}, {}
    # per-query MIN across same-code r11 runs (the episode defense —
    # run A carried canary 1.65; inflation is one-sided)
    for name, art in runs:
        for q, t in art["queries"].items():
            if q not in q1000 or t < q1000[q]:
                q1000[q], src1000[q] = t, name
    for q, t in prev1000.items():
        if q in q1000 or q in SERVING_CHANGED:
            continue
        q1000[q], src1000[q] = t, "r10_same_code"

    ratios = {}
    for q, t1000 in q1000.items():
        base = b100["queries"].get(q)
        if base:
            ratios[q] = round(t1000 / base, 1)

    tier100 = {
        "queries": b100["queries"],
        "value": b100["value"],
        "n_iters": b100.get("n_iters"),
        "canary_ratio": b100.get("canary_ratio"),
        "episode_suspect": b100.get("episode_suspect"),
        "methodology": (
            "Round-11 QUIET 100x base (VERDICT r10 next #1): one full-"
            "headline run accepted by tools/quiet_gate.py "
            f"(canary_ratio={b100.get('canary_ratio')}, episode_suspect="
            f"{b100.get('episode_suspect')}) — no min-folding across "
            "episode-suspect runs, no cross-round fallbacks; every decade "
            "ratio below divides by this run."
            + (
                ""
                if quiet
                else " WARNING: stamped with --force on a NON-quiet run; "
                "ratios carry base inflation (understates them)."
            )
        ),
    }
    tier1000 = {
        "queries": q1000,
        "base_source": src1000,
        "n_iters": b1000.get("n_iters"),
        "runs": {
            name: {
                "canary_ratio": art.get("canary_ratio"),
                "episode_suspect": art.get("episode_suspect"),
            }
            for name, art in runs
        },
        "ratio_vs_100x_r11": ratios,
        "methodology": (
            "Round-11 1000x tier: r11-changed rows (two-level serving "
            "adoption; trigram auto-compact+postings guard) measured on "
            "r11 code — per-query MIN across the same-code r11a/r11b "
            "runs (each run's canary under 'runs'; inflation is "
            "one-sided); unchanged rows carried from sf100_1000x_r10 "
            "(source 'r10_same_code' — same executed code, the vintage "
            "rule). Ratios divide by the r11 QUIET 100x base."
        ),
    }

    print(json.dumps({"sf10f_100x_r11": {k: v for k, v in tier100.items() if k != "queries"},
                      "worst_ratios": dict(sorted(ratios.items(), key=lambda kv: -kv[1])[:10])},
                     indent=1))
    if write:
        scaling["sf10f_100x_r11"] = tier100
        scaling["sf100_1000x_r11"] = tier1000
        with open("BENCH_SCALING.json", "w") as fh:
            json.dump(scaling, fh, indent=1)
        print("written to BENCH_SCALING.json", file=sys.stderr)


if __name__ == "__main__":
    main()
