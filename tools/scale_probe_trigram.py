"""Trigram-index build/serve scaling probe (VERDICT r5 next-steps #3).

Measures, at a fixture dir and its scale_data.py replicas, the three
numbers the persisted-trigram-index story rests on:

- ``build_s``: one-time index build (the corpus explode + distinct the
  query-time path pays per query — amortized here);
- ``serve_s``: min-of-3 steady-state serve of the registered probe
  patterns from the on-disk index (partition-pruned directories +
  pushed tri IN scan);
- ``querytime_s``: min-of-2 of the query-time trigram_match on the
  same corpus — the number serve_s should beat and, unlike serve_s,
  grow linearly with corpus size.

Pass criterion: serve_s grows far sublinearly in corpus size (the
replica construction keeps the probe patterns' match set ~constant, so
serving reads ~constant bytes; only directory/file-listing overhead
grows), while querytime_s tracks the corpus's linear explode.

Usage: python tools/scale_probe_trigram.py [sf_dir ...]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def probe(sf_dir: str) -> dict:
    from udacity_data_engineering_capstone_project_spark.operators.retrieval import (
        trigram_match,
        trigram_match_indexed,
        write_trigram_index,
    )
    from udacity_data_engineering_capstone_project_spark.plans.queries_llm import (
        TRIGRAM_INDEXED_PATTERNS,
    )
    from udacity_data_engineering_capstone_project_spark.session import get_spark

    spark = get_spark("scale-probe-trigram")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # Derive the probe patterns FROM the corpus at this scale (first
    # two normalized words of the 3 lowest doc_ids): the scale_data.py
    # replicas rewrite every word with a per-replica suffix, so the
    # registered fixed-literal patterns match NOTHING at 10x — a
    # zero-match serve reads no postings and proves nothing. A
    # corpus-derived pattern matches its own replica's postings only:
    # the honest fixed-selectivity probe in a growing corpus (match
    # set ~constant, corpus k-fold).
    import re

    seed_rows = (
        docs.orderBy("doc_id").select("doc_id", "text").limit(3).collect()
    )
    pats_py = [
        (i + 1, " ".join(re.sub("[^a-z0-9]+", " ", r.text.lower()).split()[:2]))
        for i, r in enumerate(seed_rows)
    ]
    print(f"# {sf_dir}: derived patterns {pats_py}", file=sys.stderr)
    pats = spark.createDataFrame(pats_py, "pattern_id int, pattern string")
    _ = TRIGRAM_INDEXED_PATTERNS  # registered-literal twin; see note above
    tmp = tempfile.mkdtemp(prefix="trigram_probe_")
    path = tmp + "/postings"
    try:
        t0 = time.time()
        write_trigram_index(docs, path)
        build_s = time.time() - t0

        def timed(mk, iters):
            mk().write.mode("overwrite").format("noop").save()  # warm-up
            samples = []
            for _ in range(iters):
                t = time.time()
                mk().write.mode("overwrite").format("noop").save()
                samples.append(time.time() - t)
            return round(min(samples), 3)

        serve_s = timed(
            lambda: trigram_match_indexed(spark, path, docs, pats), 3
        )
        querytime_s = timed(lambda: trigram_match(docs, pats), 2)
        n_docs = docs.count()
        n_matches = trigram_match_indexed(spark, path, docs, pats).count()
        return {
            "sf_dir": sf_dir,
            "n_docs": n_docs,
            "n_matches": n_matches,
            "build_s": round(build_s, 3),
            "serve_s": serve_s,
            "querytime_s": querytime_s,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    out = [probe(d) for d in dirs]
    print(json.dumps({"metric": "trigram_index_scaling", "runs": out}))


if __name__ == "__main__":
    main()
