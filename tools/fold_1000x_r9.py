"""Fold the round-9 full-method scale runs into BENCH_SCALING.json.

Builds the first-class ``sf100_1000x`` tier (VERDICT r8 #4) from:

- ``.scratch/bench_100x_r9.json``  — the post-fix 100x refresh (full
  headline, warmed, n_iters=1, the tier methodology);
- ``.scratch/bench_1000x_r9.json`` — the 1000x tier at the SAME
  standard (warmed + one timed iteration, canary-gated, 512 shuffle
  partitions);
- the prior ``sf10f_100x`` section — for UNCHANGED queries the 100x
  base is min(old tier, new run): the box runs multi-minute degraded
  episodes (NOTES.md round-9) and per-query minima across runs are
  the defense; for queries whose plan CHANGED in round 9 (sqrt dials,
  Arrow router, trigram serve) the old number is invalid and the new
  run is the only base — each carries its mini-canary reading so an
  episode-inflated base is visible rather than silent.

Usage: python tools/fold_1000x_r9.py [--write]
"""

from __future__ import annotations

import json
import sys

CHANGED_R9 = {
    "semantic_dedup_flags",
    "ann_hubness_audit_ivf",
    "bitext_mining_ivf",
    "ann_topk_ivf",
    "ann_recall_sweep",
    "ivf_trained_recall",
    "trigram_search_indexed",
    "ann_hubness_audit",
}


def last_json(path: str) -> dict:
    lines = [l for l in open(path).read().splitlines() if l.startswith("{")]
    return json.loads(lines[-1])


def main() -> None:
    scaling = json.load(open("BENCH_SCALING.json"))
    old100 = scaling["sf10f_100x"]["queries"]
    new100_art = last_json(".scratch/bench_100x_r9.json")
    new100 = new100_art["queries"]
    b1000_art = last_json(".scratch/bench_1000x_r9.json")
    b1000 = b1000_art["queries"]
    # part B: the ivf_topk-family pair ran as a SEPARATE invocation so a
    # failure there could not kill the 23-query artifact (the first
    # attempt died ENOSPC in bitext warm-up and cost the whole run) —
    # merge its queries/builds and keep its canary fields alongside
    try:
        b_art = last_json(".scratch/bench_1000x_r9b.json")
        b1000.update(b_art["queries"])
        b1000_art["value"] = round(b1000_art["value"] + b_art["value"], 3)
        (b1000_art.setdefault("builds", {})).update(b_art.get("builds") or {})
        b1000_art["part_b"] = {
            k: b_art[k]
            for k in (
                "canary_ratio", "canary_warning", "episode_suspect",
                "mini_canary_worst_ms", "mini_canary_ref_ms", "value",
            )
            if k in b_art
        }
    except (FileNotFoundError, IndexError):
        print("NOTE: part B artifact missing — folding part A only")

    base: dict[str, float] = {}
    base_src: dict[str, str] = {}
    for q, t in new100.items():
        if q in CHANGED_R9 or q not in old100 or old100[q] is None:
            base[q], base_src[q] = t, "r9"
        else:
            o = old100[q]
            base[q] = min(o, t)
            base_src[q] = "r7" if o <= t else "r9"
    # the 100x refresh ran BEFORE the in-kernel ivf_topk fix (e7068b2,
    # forced by part A's predecessor dying ENOSPC in bitext warm-up);
    # these two bases are the POST-FIX canary-clean spot run at
    # .scratch/sf10f (episode_suspect False) — using the pre-fix join
    # shape as the base would flatter the 1000x ratio
    base["bitext_mining_ivf"], base_src["bitext_mining_ivf"] = 3.683, "r9-postfix"
    base["ann_topk_ivf"], base_src["ann_topk_ivf"] = 1.700, "r9-postfix"

    ratios = {
        q: round(t / base[q], 1) for q, t in b1000.items() if q in base and base[q]
    }
    rows = sorted(ratios.items(), key=lambda kv: -kv[1])
    print(f"1000x total={b1000_art['value']}s canary={b1000_art['canary_ratio']} "
          f"episode_suspect={b1000_art.get('episode_suspect')}")
    print(f"{'ratio':>7} {'100x_s':>9} {'1000x_s':>9}  query")
    for q, r in rows:
        print(f"{r:7.1f} {base[q]:9.2f} {b1000[q]:9.2f}  {q} [{base_src[q]}]")
    build_r = {}
    for q, b in (b1000_art.get("builds") or {}).items():
        ob = (new100_art.get("builds") or {}).get(q)
        if ob:
            build_r[q] = round(b / ob, 1)
            print(f"build {q}: 100x={ob}s 1000x={b}s ratio={build_r[q]}")

    if "--write" not in sys.argv:
        return
    scaling["sf10f_100x_r9_refresh"] = {
        k: new100_art[k]
        for k in (
            "value", "legacy26_total", "queries", "builds", "n_iters",
            "canary_ratio", "canary_warning", "mini_canary_ref_ms",
            "mini_canary_worst_ms", "episode_suspect",
        )
        if k in new100_art
    }
    scaling["sf10f_100x_r9_refresh"]["methodology"] = (
        "Round-9 POST-FIX refresh of the 100x tier (warmed, n_iters=1, 50 "
        "of 51 headline queries; bitext_mining_pairs stays excluded as the "
        "labeled quadratic ceiling). episode_suspect=True: the new per-query "
        "mini-canary caught a degraded host episode mid-run (NOTES.md "
        "round-9); affected queries are visible in the spread side file's "
        "mini_canary_ms and their composite base below falls back to the "
        "canary-clean r7 tier value. ann_hubness_audit (the EXACT n^2 "
        "kernel, first 100x measurement) runs AT its 200k-vector bound: "
        "716.7 s vs the IVF twin's 7.2 s - the measured justification for "
        "the deployment-twin design; excluded from cross-tier totals."
    )
    scaling["sf100_1000x"] = {
        k: b1000_art[k]
        for k in (
            "value", "queries", "builds", "n_iters", "canary_ratio",
            "canary_warning", "mini_canary_ref_ms", "mini_canary_worst_ms",
            "episode_suspect", "load_avg_1m_start", "load_avg_1m_end",
        )
        if k in b1000_art
    }
    scaling["sf100_1000x"].update(
        {
            "sf": 100.0,
            "methodology": (
                "Round-9 FULL-METHOD 1000x tier (VERDICT r8 #4): 25 "
                "scale-sensitive queries (the r8 23-list + the r9-changed "
                "bitext_mining_ivf and ann_topk_ivf) at .scratch/sf100 "
                "(600M lineitem / 150M orders / 100M events / 5M docs / 2M "
                "embeddings), per-query warm-up pass then ONE timed "
                "iteration - the same standard as the 10x/100x tiers - "
                "SPARK_GRAFT_SHUFFLE_PARTITIONS=512, canary-gated with the "
                "per-query mini-canary episode detector. Exclusions: "
                "bitext_mining_pairs (labeled quadratic ceiling), "
                "jaccard_pairs_prefix_filter (1.1B-row pair relation needs "
                ">55 GB sort spill - more scratch disk than this box; "
                "linear-in-pairs by construction, measured 5.5x/decade at "
                "10x/100x), ann_hubness_audit (the exact kernel's 200k "
                "bound raises at 2M vectors BY DESIGN - the IVF twin is "
                "the deployment path and IS in the list)."
            ),
            "base_100x_composite": base,
            "base_100x_source": base_src,
            "ratio_vs_100x_per_query": dict(rows),
            "build_ratio_vs_100x": build_r,
        }
    )
    with open("BENCH_SCALING.json", "w") as f:
        json.dump(scaling, f, indent=1)
    print("written BENCH_SCALING.json: sf10f_100x_r9_refresh + sf100_1000x")


if __name__ == "__main__":
    main()
