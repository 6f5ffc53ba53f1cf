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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    from udacity_data_engineering_capstone_project_spark.plans.registry import query_fns
    from udacity_data_engineering_capstone_project_spark.session import get_spark

    spark = get_spark("bench")
    fns = query_fns()

    # Warm up JVM/codegen/Python-worker paths outside the timed region:
    # run every headline query once at the smallest scale factor.
    # First-run Janino/JIT compilation of the big dedup plans costs
    # 5-15s and is independent of data size — timing it would measure
    # compiler latency, not engine throughput. The timed region below
    # is steady-state execution at the target SF.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE:
        fns[name](spark, warm_dir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = fns[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)
        # drop this query's persisted intermediates so they don't
        # steal memory from (or get recomputed into) later queries
        spark.catalog.clearCache()

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
