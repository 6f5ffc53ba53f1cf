"""Fold the round-10 scale runs into BENCH_SCALING.json.

Round-10 goals (VERDICT r9 #1/#2/#5):

- ``sf10f_100x_r10``: ONE clean, episode-free, full-method 100x stamp
  on current code, so every 1000x ratio below uses a SINGLE-VINTAGE
  base (the r9 tier mixed r7-fallback bases per query after its
  refresh ran through a degraded episode). If the run's
  ``episode_suspect`` is true, re-run it before folding — this script
  refuses to fold a suspect 100x base unless ``--force`` is given.
- ``sf100_1000x_r10``: the refreshed 1000x tier (parts A+B merged; the
  two-invocation split is the r9 ENOSPC lesson). Ratios are computed
  against the r10 100x stamp ONLY — no cross-vintage fallbacks, which
  is the entire point; each query still carries the run's mini-canary
  fields so an episode-inflated reading is visible.

Usage: python tools/fold_scale_r10.py [--write] [--force]
"""

from __future__ import annotations

import json
import sys


def last_json(path: str) -> dict:
    lines = [l for l in open(path).read().splitlines() if l.startswith("{")]
    return json.loads(lines[-1])


def main() -> None:
    scaling = json.load(open("BENCH_SCALING.json"))
    a100 = last_json(".scratch/bench_100x_r10.json")
    if a100.get("episode_suspect") and "--force" not in sys.argv:
        raise SystemExit(
            "100x stamp has episode_suspect=true — re-run it on a quiet "
            "box (the single-vintage base is the point of this round); "
            "--force to fold anyway"
        )
    b_art = last_json(".scratch/bench_1000x_r10a.json")
    b1000 = dict(b_art["queries"])
    try:
        bb = last_json(".scratch/bench_1000x_r10b.json")
        # star_join_agg runs in BOTH parts (part B pairs it with the
        # bucketed twin in one invocation); keep the per-query MIN —
        # same-commit minima across runs are the episode defense
        for q, t in bb["queries"].items():
            b1000[q] = min(t, b1000[q]) if q in b1000 else t
        b_art["value"] = round(b_art["value"] + bb["value"], 3)
        (b_art.setdefault("builds", {})).update(bb.get("builds") or {})
        b_art["part_b"] = {
            k: bb[k]
            for k in (
                "canary_ratio", "canary_warning", "episode_suspect",
                "mini_canary_worst_ms", "mini_canary_ref_ms", "value",
            )
            if k in bb
        }
    except (FileNotFoundError, IndexError):
        print("NOTE: part B artifact missing — folding part A only")

    base = a100["queries"]
    ratios = {
        q: round(t / base[q], 1)
        for q, t in b1000.items()
        if base.get(q)
    }
    rows = sorted(ratios.items(), key=lambda kv: -kv[1])
    print(
        f"100x total={a100['value']}s canary={a100['canary_ratio']} "
        f"episode_suspect={a100.get('episode_suspect')}"
    )
    print(
        f"1000x total={b_art['value']}s canary={b_art['canary_ratio']} "
        f"episode_suspect={b_art.get('episode_suspect')} "
        f"part_b={b_art.get('part_b')}"
    )
    print(f"{'ratio':>7} {'100x_s':>9} {'1000x_s':>9}  query")
    for q, r in rows:
        print(f"{r:7.1f} {base[q]:9.2f} {b1000[q]:9.2f}  {q}")
    build_r = {}
    for q, b in (b_art.get("builds") or {}).items():
        ob = (a100.get("builds") or {}).get(q)
        if ob:
            build_r[q] = round(b / ob, 1)
            print(f"build {q}: 100x={ob}s 1000x={b}s ratio={build_r[q]}")

    if "--write" not in sys.argv:
        return
    scaling["sf10f_100x_r10"] = {
        k: a100[k]
        for k in (
            "value", "legacy26_total", "queries", "builds", "n_iters",
            "canary_ratio", "canary_warning", "mini_canary_ref_ms",
            "mini_canary_worst_ms", "episode_suspect",
        )
        if k in a100
    }
    scaling["sf10f_100x_r10"]["methodology"] = (
        "Round-10 CLEAN 100x stamp (VERDICT r9 #5): full headline minus "
        "bitext_mining_pairs (labeled quadratic ceiling) and "
        "ann_hubness_audit (exact kernel at its 200k bound — its one "
        "measurement, 716.7 s vs the IVF twin, is in "
        "sf10f_100x_r9_refresh), warmed, n_iters=1, on current r10 code. "
        "Single-vintage per-query bases for the sf100_1000x_r10 ratios — "
        "no cross-round fallbacks."
    )
    scaling["sf100_1000x_r10"] = {
        k: b_art[k]
        for k in (
            "value", "queries", "builds", "n_iters", "canary_ratio",
            "canary_warning", "mini_canary_ref_ms", "mini_canary_worst_ms",
            "episode_suspect", "load_avg_1m_start", "load_avg_1m_end",
            "part_b",
        )
        if k in b_art
    }
    scaling["sf100_1000x_r10"].update(
        {
            "sf": 100.0,
            "methodology": (
                "Round-10 FULL-METHOD 1000x tier: the r9 stable 24-query "
                "list (part A) + the r10-changed/new rows (part B: "
                "two-level+bounded-dial ann_hubness_audit_ivf, "
                "star_join_bucketed, trigram_search_appended, plus "
                "star_join_agg re-run beside the twin; separate "
                "invocations per the r9 ENOSPC lesson). Same standard as "
                "every tier: per-query warm-up pass then ONE timed "
                "iteration, SPARK_GRAFT_SHUFFLE_PARTITIONS=512, canary + "
                "per-query mini-canary episode gating. Ratios vs the "
                "SINGLE-VINTAGE r10 100x stamp only (VERDICT r9 #5). "
                "Exclusions unchanged: bitext_mining_pairs, "
                "jaccard_pairs_prefix_filter (>55 GB pair-relation spill "
                "exceeds this box's scratch disk; linear-in-pairs, "
                "5.5x/decade measured at 10x/100x), ann_hubness_audit "
                "(exact kernel's bound raises at 2M BY DESIGN)."
            ),
            "ratio_vs_100x_per_query": dict(rows),
            "build_ratio_vs_100x": build_r,
        }
    )
    with open("BENCH_SCALING.json", "w") as f:
        json.dump(scaling, f, indent=1)
    print("written BENCH_SCALING.json: sf10f_100x_r10 + sf100_1000x_r10")


if __name__ == "__main__":
    main()
