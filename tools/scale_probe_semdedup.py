"""Trained-SemDeDup scaling probe: does the cluster-count dial hold?

The semantic_dedup_trained contract says the within-cluster quadratic
is bounded because k SCALES with the corpus (SemDeDup runs k = 110k
clusters on LAION so n_c ~ n/k stays executor-sized). This probe
measures that claim two ways at the 10x/100x replica dirs:

- ``scaled_k``: k grows with n (n_c held ~250) — wall should track the
  k-means training cost (~linear in n * k for assignment) plus a
  ~linear pair-verification term; NOT quadratic.
- ``fixed_k`` (10x dir only): k pinned at the sf0.1 value 8 — the
  documented failure mode; its pair count grows ~quadratically (n_c
  10x -> pairs 100x per cluster). Recorded so the SCALE.md row shows
  the dial MATTERS, not just that the good setting is fast.

Replica embeddings are per-replica dimension ROTATIONS (scale_data.py)
— near-orthogonal across replicas, so the clustering sees k-times more
points, not copies, and the planted threshold crossings stay sparse.

Usage: python tools/scale_probe_semdedup.py [sf_dir ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def run(sf_dir: str, k: int, label: str) -> dict:
    from udacity_data_engineering_capstone_project_spark.operators.similarity import (
        semantic_dedup_trained,
    )
    from udacity_data_engineering_capstone_project_spark.session import get_spark

    spark = get_spark("scale-probe-semdedup")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    t0 = time.time()
    out = semantic_dedup_trained(
        emb, "vec_id", "embedding", k=k, iters=5, threshold=0.45
    )
    agg = out.agg(
        F.count("*").alias("n"), F.sum("dropped").alias("n_dropped")
    ).collect()[0]
    wall = time.time() - t0
    row = {
        "sf_dir": sf_dir,
        "mode": label,
        "n": n,
        "k": k,
        "wall_s": round(wall, 2),
        "n_out": agg.n,
        "n_dropped": int(agg.n_dropped),
    }
    print(json.dumps(row))
    return row


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    from udacity_data_engineering_capstone_project_spark.session import get_spark

    spark = get_spark("scale-probe-semdedup")
    for d in dirs:
        # hold expected cluster size ~250 as the corpus grows
        n = spark.read.parquet(f"{d}/embeddings.parquet").count()
        k = max(8, n // 250)
        run(d, k, "scaled_k")
        if n // 250 > 8 and n <= 25_000:  # fixed-k blowup demo: 10x only
            run(d, 8, "fixed_k")


if __name__ == "__main__":
    main()
