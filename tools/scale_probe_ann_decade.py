"""ANN routing-vs-candidate phase split, one decade up (VERDICT r11
next #2): the bounded-population dial's docstring predicts routing
~(1 + coarse_probe) * sqrt(n/512) dots/vector against a candidate term
of nprobe * 512 — routing 187 vs candidates 1024 at 2M vectors, with
the crossover (where the residual sqrt(n) routing term demands a third
level or a graph router) projected around ~20M at pop=512. This probe
MEASURES that projection instead of extrapolating it: at 2M
(.scratch/sf100 embeddings) and ~16M (an embeddings-only 8x replica)
it times, separately,

- ``plan_build_s``   the driver-side centroid collect + broadcast
                     (_centroid_routing_plan) — the piece the 256 MB
                     budget guards; its cost grows with cells = n/512
- ``routing_s``      the member-routing pass alone
                     (_nearest_cells_arrow, two_level, nprobe=2)
- ``serve_s``        ann_topk_ivf-shaped end-to-end serve (5 queries)
- ``audit_s``        the hubness audit end-to-end (ivf_self_topk_arrow
                     + k-occurrence histogram) — the all-vectors
                     workload where the routing term actually bites

Emits one JSON line per tier with n / cells / coarse and the phase
times, so SCALE.md can state "crossover confirmed beyond this box" or
pin where a third routing level becomes mandatory.

Usage: python tools/scale_probe_ann_decade.py <emb_dir> [<emb_dir> ...]
(each dir must hold embeddings.parquet; shuffle partitions pinned 512,
matching the 1000x tier so phase ratios are same-config).
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")


def probe(sf_dir: str, iters: int = 2) -> dict:
    from pyspark.sql import functions as F

    from udacity_data_engineering_capstone_project_spark.operators.similarity import (
        _centroid_routing_plan,
        _nearest_cells_arrow,
        ivf_cells_bounded,
        ivf_self_topk_arrow,
        ivf_topk,
    )
    from udacity_data_engineering_capstone_project_spark.session import get_spark

    spark = get_spark("ann-decade-probe", shuffle_partitions=512)
    spark.conf.set("spark.sql.shuffle.partitions", "512")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    n_cells = ivf_cells_bounded(n)
    out = {
        "sf_dir": sf_dir,
        "n_vectors": n,
        "n_cells": n_cells,
        "n_coarse": max(1, math.ceil(math.sqrt(n_cells))),
        "centroid_mb": round(n_cells * 64 * 8 / (1 << 20), 1),
    }
    cents = emb.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )

    # phase 0: the driver-side plan build (collect + broadcast)
    best = None
    for i in range(iters):
        t0 = time.time()
        plan = _centroid_routing_plan(
            cents, "centroid_id", "embedding", two_level=True
        )
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        if i != iters - 1:
            plan[0].destroy()
    out["plan_build_s"] = round(best, 3)

    def timed(mk):
        mk().write.mode("overwrite").format("noop").save()  # warm
        best = None
        for _ in range(iters):
            t0 = time.time()
            mk().write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    # phase 1: routing alone, against the prebuilt plan (every vector
    # ranks coarse branches then the top-2 branches' fine cells)
    src = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    out["routing_s"] = timed(
        lambda: _nearest_cells_arrow(
            src, "id", "v", cents, "centroid_id", "embedding",
            nprobe=2, two_level=True, plan=plan,
        )
    )

    # phase 2: the serving query end-to-end (5 probers)
    queries = emb.filter(F.col("vec_id") < 5)
    out["serve_s"] = timed(
        lambda: ivf_topk(
            queries, emb, cents,
            id_col="vec_id", vec_col="embedding",
            centroid_id_col="centroid_id",
            k=5, nprobe=2, two_level=True, routing_plan=plan,
        )
    )

    # phase 3: the audit end-to-end — every vector is a query, so the
    # routing term is paid n times (where sqrt(n) growth actually bites)
    def audit():
        top5 = ivf_self_topk_arrow(
            emb, cents, "vec_id", "embedding", "centroid_id",
            k=5, nprobe=2, two_level=True,
        )
        occ = top5.groupBy(F.col("neighbor_id").alias("vec_id")).agg(
            F.count("*").cast("long").alias("k_occ")
        )
        per_vec = (
            emb.select("vec_id")
            .join(occ, "vec_id", "left")
            .select(
                F.coalesce("k_occ", F.lit(0)).cast("long").alias("k_occurrence")
            )
        )
        return per_vec.groupBy("k_occurrence").agg(
            F.count("*").cast("long").alias("n_vectors")
        )

    out["audit_s"] = timed(audit)
    plan[0].destroy()
    spark.stop()
    return out


if __name__ == "__main__":
    for d in sys.argv[1:] or ["/root/repo/.scratch/sf100"]:
        print(json.dumps(probe(d)), flush=True)
