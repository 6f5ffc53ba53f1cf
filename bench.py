"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization with the noop sink (every
output column computed, nothing collected to the driver), so timings
measure the whole plan, not an agg-pruned shortcut.

Noise protocol (VERDICT r3 #3 — three rounds burned verdict cycles on
phantom sub-second regressions from host-load spikes): each query runs
FIVE timed iterations; ``queries`` records the MIN (noise on a shared
host is one-sided — GC pause, CPU steal — so the minimum estimates true
steady-state cost), the per-query [min, median, max] spread goes to a
SIDE FILE (``.benchmarks/spread_latest.json``) and stderr — NOT the
stdout JSON line (VERDICT r4 #2: embedding the 30-query spread dict
grew the line past the driver's tail-capture window and decapitated
it, leaving ``BENCH_r04.json`` with ``"parsed": null``; the
machine-readable line must stay small and LAST) — and the 1-minute load
average is sampled BEFORE the JVM starts and recorded in the JSON. If
the box is already loaded (load1 > $SPARK_GRAFT_LOAD_MAX, default 4.0)
the run SCREAMS on stderr and sets ``"load_warning": true`` — numbers
from such a run sampled a spike and should not be read as a trend.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: Headline mix: scan-agg, star join, pivot, windows, sessionization,
#: dedup (exact/Jaccard/MinHash/SimHash/PPJoin/spans), sketches, ANN,
#: text scoring, bloom decontamination.
HEADLINE = [
    "tpch_q1",
    "tpch_q3_sql",
    "tpch_q5_sql",
    "star_join_agg",
    "pivot_status",
    "date_dim",
    "window_topk_per_group",
    "events_hourly",
    "sessionize_events",
    "asof_join_events",
    "dedup_exact",
    "jaccard_pairs_exact",
    "minhash_pairs",
    "simhash_fingerprints",
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "embedding_near_dup",
    "text_quality",
    "tpch_q17_scalar",
    "text_profile_fused",
    "tpch_q6_scan",
    "tpch_q9_profit",
    "tpch_q13_histogram",
    "events_trailing_hour",
    "corpus_curation",
    "heavy_hitter_tokens",
    # round-4 additions (VERDICT r3 #7): the wave-3/4 flagships, so
    # their trend is tracked from here on. The headline total is
    # re-baselined by these four rows — compare r4+ totals to r3's
    # 26-query total PLUS these queries' own r4 rows.
    "jaccard_pairs_prefix_filter",
    "cross_doc_dup_spans",
    "kmv_user_overlap",
    "bloom_prefilter_decontaminate",
    # round-5 additions: the r5 flagships (hybrid retrieval got the
    # tokenize-once fix; the two entropy queries share its scan shape;
    # trigram search carries the bitmap-AND fix found at the 100x
    # probe; cluster topics carries the full k-means training loop)
    "hybrid_rrf_retrieval",
    "token_entropy_quality",
    "distinctive_terms_by_source",
    "trigram_search_like",
    "cluster_topic_terms",
]

N_ITERS = 5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # optional subset (comma-separated query names) for targeted
    # scaling probes, e.g. the dedup family at sf10
    subset = os.environ.get("SPARK_GRAFT_QUERIES")
    headline = subset.split(",") if subset else HEADLINE
    n_iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", N_ITERS))
    load_max = float(os.environ.get("SPARK_GRAFT_LOAD_MAX", "4.0"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    # Fixed-work CPU canary: this host shows invisible slowdowns that
    # loadavg does NOT catch (round 5: the same commit measured 30.3 s
    # then 51.8 s headline two hours apart, loadavg 0.05 both times —
    # hypervisor-level steal). min-of-3 of a fixed numpy matmul burst
    # gives readers a per-run machine-speed constant to normalize
    # against (BLAS uses all cores, so co-tenant steal shows up here
    # just as it does in executor threads). Read it as a RATIO between
    # runs, not an absolute: a run whose canary is 2x another run's
    # carries roughly that factor in every query number (0.22 s was
    # measured during the round-5 slow episode; compare future runs
    # against their own neighbors).
    import numpy as _np

    _a = _np.random.default_rng(7).random((1000, 1000))
    canary = min(
        __import__("timeit").timeit(lambda: _a @ _a, number=10) for _ in range(3)
    )

    load_start = os.getloadavg()[0]
    load_warning = load_start > load_max
    if load_warning:
        print(
            f"######## BENCH LOAD WARNING: load1={load_start:.2f} > "
            f"{load_max} before JVM start — this run is sampling a host "
            "spike; treat its numbers as an upper bound, not a trend.",
            file=sys.stderr,
        )

    from udacity_data_engineering_capstone_project_spark.plans.registry import query_fns
    from udacity_data_engineering_capstone_project_spark.session import get_spark

    spark = get_spark("bench")
    fns = query_fns()

    # JMH-style warm-up outside the timed region: one un-timed
    # iteration of every headline query at the target SF. First-run
    # Janino codegen + C2 JIT tiering of the big dedup plans cost
    # 5-15s independent of data size — timing them would measure
    # compiler latency, not engine throughput. Caches are cleared
    # between iterations, so the timed region below is steady-state
    # EXECUTION at the target SF (scans, shuffles, aggregations all
    # re-run; only compiled code is reused).
    for name in headline:
        fns[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in headline:
        samples = []
        for _ in range(n_iters):
            t0 = time.time()
            df = fns[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            samples.append(time.time() - t0)
            # drop this query's persisted intermediates so they don't
            # steal memory from (or get recomputed into) later queries
            spark.catalog.clearCache()
        timings[name] = round(min(samples), 3)
        spread[name] = [
            round(min(samples), 3),
            round(statistics.median(samples), 3),
            round(max(samples), 3),
        ]
        print(
            f"# {name}: min={spread[name][0]}s med={spread[name][1]}s "
            f"max={spread[name][2]}s",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    # full spread to a side file + stderr; stdout line stays compact
    spread_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".benchmarks")
    os.makedirs(spread_dir, exist_ok=True)
    with open(os.path.join(spread_dir, "spread_latest.json"), "w") as f:
        json.dump({"spread": spread, "n_iters": n_iters, "sf": sf}, f, indent=1)
    print(f"# spread written to {spread_dir}/spread_latest.json", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "n_iters": n_iters,
                "load_avg_1m_start": round(load_start, 2),
                "load_avg_1m_end": round(os.getloadavg()[0], 2),
                "load_warning": load_warning,
                "cpu_canary_s": round(canary, 3),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
