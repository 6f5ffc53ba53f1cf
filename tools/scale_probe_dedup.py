"""Dedup-family scaling probe at replica SFs (VERDICT r2 #7).

Runs the dedup/near-dup family — the operators whose naive forms are
QUADRATIC (inverted-index sum(freq^2), LSH band collisions) — at a
replica fixture dir produced by tools/scale_data.py, with bench.py's
steady-state methodology (un-timed warm-up, min of 2 timed noop-sink
materializations, cache cleared between iterations). Prints one JSON
line per run; compare sf1 (10x of sf0.1) vs sf10 (100x) ratios: the
pass criterion is no query growing super-linearly (ratio > 10x per
10x data).

The embedding near-dup entry uses srp_auto_config — band width grows
with log2(n) (24 bits at 1e6 vectors vs the fixture-tuned 14) so
random band collisions stay ~linear in corpus size; the fixed-config
registered query would produce ~5e8 candidate pairs at 1M vectors,
which is exactly the quadratic this probe exists to show the scale
path dodging.

Usage: python tools/scale_probe_dedup.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def jaccard_default(spark, sf_dir):
    """The DEFAULT-capped Jaccard path (max_shingle_freq=10_000)."""
    from udacity_data_engineering_capstone_project_spark.operators.dedup import (
        jaccard_pairs,
        shingle_sets,
    )

    sh = shingle_sets(_docs(spark, sf_dir), "doc_id", "text", n=3)
    return jaccard_pairs(sh, threshold_num=3, threshold_den=5)


def containment_default(spark, sf_dir):
    from udacity_data_engineering_capstone_project_spark.operators.dedup import (
        containment_pairs,
        shingle_sets,
    )

    sh = shingle_sets(_docs(spark, sf_dir), "doc_id", "text", n=3)
    return containment_pairs(sh, threshold_num=3, threshold_den=5)


def embedding_near_dup_auto(spark, sf_dir):
    """Planted-dup near-dup mining with the scale-adaptive SRP config."""
    from udacity_data_engineering_capstone_project_spark.operators.similarity import (
        embedding_near_dup,
        srp_auto_config,
    )

    base = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    perturbed = base.select(
        (F.col("vec_id") + 100_000_000).alias("vec_id"),
        F.expr("transform(embedding, x -> x + 0.01D)").alias("embedding"),
    )
    corpus = base.unionByName(perturbed)
    n = corpus.count()
    bands, rows = srp_auto_config(n, target_cos=0.99)
    print(f"# embedding_near_dup_auto: n={n} -> bands={bands} rows={rows}",
          file=sys.stderr)
    return embedding_near_dup(
        corpus, "vec_id", "embedding", dim=64,
        threshold=0.95, bands=bands, rows=rows,
    )


LOCAL = {
    "jaccard_default": jaccard_default,
    "containment_default": containment_default,
    "embedding_near_dup_auto": embedding_near_dup_auto,
}

#: Registered queries included as-is (they read only documents/
#: embeddings, which the replica dirs carry).
REGISTERED = [
    "dedup_exact",
    "minhash_pairs",
    "simhash_fingerprints",
    "dedup_components",
    "incremental_dedup_probe",
    # round-3 fourth wave
    "kmv_user_overlap",
    "cross_doc_dup_spans",
    "span_dedup_clean_text",
    "jaccard_pairs_prefix_filter",
]


def _run_one(name: str, sf_dir: str) -> float:
    """Child-process entry: warm-up + min-of-2 timed runs of ONE query
    in its own fresh JVM."""
    from udacity_data_engineering_capstone_project_spark.plans.registry import (
        query_fns,
    )
    from udacity_data_engineering_capstone_project_spark.session import get_spark

    fn = LOCAL.get(name) or query_fns()[name]
    spark = get_spark("scale-probe-dedup")
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
    return best


def main() -> int:
    import subprocess

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    only = [a for a in sys.argv[2:]]

    if os.environ.get("SPARK_PROBE_CHILD"):
        best = _run_one(os.environ["SPARK_PROBE_CHILD"], sf_dir)
        print(f"PROBE_RESULT {best:.3f}")
        return 0

    # FRESH JVM (subprocess) per query: at 100x-replica scale, a
    # session that has already run several heavy queries carries a
    # bloated heap whose GC later queries pay — measured 10x inflation
    # on simhash at sf10 when run 3rd in a shared session vs fresh.
    # Per-query processes measure each operator's OWN scaling, which
    # is what the probe is for. (spark.stop() is not enough: the py4j
    # JVM survives it.)
    names = only or (REGISTERED + list(LOCAL))
    timings: dict[str, float] = {}
    for name in names:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf_dir],
            env={**os.environ, "SPARK_PROBE_CHILD": name},
            capture_output=True, text=True, check=True,
        )
        for line in out.stdout.splitlines():
            if line.startswith("PROBE_RESULT "):
                timings[name] = round(float(line.split()[1]), 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)
    print(json.dumps({
        "metric": "dedup_family_wall",
        "sf_dir": os.path.basename(sf_dir.rstrip("/")),
        "unit": "sec",
        "queries": timings,
        "total": round(sum(timings.values()), 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
