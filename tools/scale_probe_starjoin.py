"""Phase-isolated adjudication of star_join_bucketed's decade ratio
(VERDICT r10 next #2: 13.2x/decade at the r10 fold, above the <=12
heuristic, on an episode-suspect base).

Three suspects, each isolated:

1. **Base inflation** — the r10 100x base (2.73 s) was min-folded
   across three episode-suspect runs; re-measuring on a quiet host
   (min-of-``iters``) either re-states the ratio or confirms it.
2. **Shuffle-partition pin** — ``SPARK_GRAFT_SHUFFLE_PARTITIONS=512``
   is sized for the 1000x SMJ sorts, but at 100x the post-SMJ agg
   exchange and final sort then run 512 near-EMPTY tasks; if the pin
   inflates the base, the true decade ratio is LOWER than folded.
   The probe times the same query under 512 and 32 (the 100x tier's
   actual bench default) at the given SF.
3. **Layout regression** — the one-file-per-bucket precondition
   (SPARK-28595) could silently break again; the probe asserts the
   plan has no Sort on either order key and no Exchange on the fact
   edge before timing anything, and reports files-per-bucket.

Usage: python tools/scale_probe_starjoin.py [sf_dir ...]
Emits one JSON line per sf_dir:
  {"sf_dir", "files_per_bucket_max", "sort_free", "n_exchanges",
   "serve_512_s", "serve_32_s", "plain_512_s"}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def _timed(mk, iters=3):
    mk().write.mode("overwrite").format("noop").save()  # warm
    best = None
    for _ in range(iters):
        t = time.time()
        mk().write.mode("overwrite").format("noop").save()
        dt = time.time() - t
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def probe(sf_dir: str, iters: int = 3) -> dict:
    import glob

    from udacity_data_engineering_capstone_project_spark.plans.queries_llm import (
        LLM_QUERIES,
    )
    from udacity_data_engineering_capstone_project_spark.session import get_spark

    out = {"sf_dir": sf_dir}
    for n_shuffle, tag in ((512, "serve_512_s"), (32, "serve_32_s")):
        os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = str(n_shuffle)
        spark = get_spark(f"starjoin-probe-{n_shuffle}", shuffle_partitions=n_shuffle)
        spark.conf.set("spark.sql.shuffle.partitions", str(n_shuffle))
        fn = LLM_QUERIES["star_join_bucketed"][0]
        if tag == "serve_512_s":
            # one-time layout facts + plan guard before any timing
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
            out["n_exchanges"] = plan.count("Exchange")
            out["sort_free"] = (
                "Sort [l_orderkey" not in plan and "Sort [o_orderkey" not in plan
            )
            try:
                from udacity_data_engineering_capstone_project_spark.plans.queries_llm import (  # noqa: E501
                    _bucketed_tables,
                )

                lt, _ot = _bucketed_tables(spark, sf_dir)
                loc = (
                    spark.sql(f"DESCRIBE FORMATTED {lt}")
                    .filter("col_name = 'Location'")
                    .collect()[0][1]
                ).replace("file:", "")
                per_bucket = {}
                for f in glob.glob(os.path.join(loc, "part-*")):
                    # bucket id is the _0000N suffix spark appends
                    bid = os.path.basename(f).split("_")[-1].split(".")[0]
                    per_bucket[bid] = per_bucket.get(bid, 0) + 1
                out["files_per_bucket_max"] = max(per_bucket.values(), default=None)
            except Exception as e:  # noqa: BLE001
                out["files_per_bucket_max"] = f"n/a ({e})"
        out[tag] = _timed(lambda: fn(spark, sf_dir), iters)
        if tag == "serve_512_s":
            from udacity_data_engineering_capstone_project_spark.plans.queries_parity import (  # noqa: E501
                star_join_agg,
            )

            out["plain_512_s"] = _timed(lambda: star_join_agg(spark, sf_dir), iters)
        spark.stop()
    return out


if __name__ == "__main__":
    for d in sys.argv[1:] or ["/root/testdata/sf0.1"]:
        print(json.dumps(probe(d)), flush=True)
