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

    # warm up the JVM/codegen paths outside the timed region
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = fns[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)
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
