"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization with the noop sink (every
output column computed, nothing collected to the driver), so timings
measure the whole plan, not an agg-pruned shortcut.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: Headline mix: scan-agg, star join, pivot, windows, sessionization,
#: dedup (exact/Jaccard/MinHash/SimHash), ANN, text scoring.
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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # optional subset (comma-separated query names) for targeted
    # scaling probes, e.g. the dedup family at sf10
    subset = os.environ.get("SPARK_GRAFT_QUERIES")
    headline = subset.split(",") if subset else HEADLINE
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

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

    # two timed iterations per query, min recorded: timing noise on a
    # shared host is one-sided (GC pause, CPU steal), so the minimum
    # is the standard estimator of true steady-state cost
    timings: dict[str, float] = {}
    for name in headline:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df = fns[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
            # drop this query's persisted intermediates so they don't
            # steal memory from (or get recomputed into) later queries
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
