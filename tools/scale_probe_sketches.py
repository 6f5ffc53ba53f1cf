"""Sketch/bitmap/moments scaling probe at replica SFs (round 3).

Runs the fixed-size-summary family — bitmap distinct/retention,
histogram quantiles, one-pass covariance, auto-sized Bloom
decontamination — at replica dirs from tools/scale_data.py, one FRESH
subprocess JVM per (query, sf) pair (a shared session's heap bloat
inflates later sf10 queries; see NOTES.md round-3 log). Methodology:
un-timed warm-up, then min of 2 timed noop-sink materializations.

Usage: python tools/scale_probe_sketches.py [sf_dir ...]
Default dirs: /root/testdata/sf0.1 .scratch/sf1 .scratch/sf10
(the sf10 replica carries documents/events/embeddings only — exactly
this family's inputs).
"""

from __future__ import annotations

import json
import subprocess
import sys

QUERIES = [
    "bitmap_distinct_users",
    "bitmap_weekly_retention",
    "histogram_quantile_rollup",
    "embedding_covariance",
    "bloom_auto",  # operator path with m_bits=None (production setting)
    "doc_chunk_windows",
    "epoch_shuffle_audit",
]

_CHILD = r"""
import sys, time
sys.path.insert(0, "/root/repo")
from udacity_data_engineering_capstone_project_spark.session import get_spark
from pyspark.sql import functions as F

name, sf_dir = sys.argv[1], sys.argv[2]
spark = get_spark("sketchprobe", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

if name == "bloom_auto":
    from udacity_data_engineering_capstone_project_spark.operators.curation import (
        bloom_decontaminate,
    )
    from udacity_data_engineering_capstone_project_spark.functions.hashing import (
        spark_hex_to_long,
    )

    def fn(spark, sf_dir):
        import tempfile

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        b = F.expr(spark_hex_to_long("md5(CAST(doc_id AS STRING))", 7)) % 100
        return bloom_decontaminate(
            docs.filter(b < 80),
            docs.filter(b >= 90),
            m_bits=None,
            materialize_dir=tempfile.mkdtemp(prefix="bloom_probe_"),
        )
else:
    import __spark_entry__ as m

    fn = m.queries()[name]

fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm-up
best = 1e9
for _ in range(2):
    spark.catalog.clearCache()
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = min(best, time.time() - t0)
print(f"RESULT {best:.3f}")
spark.stop()
"""


def main() -> int:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        ".scratch/sf1",
        ".scratch/sf10",
    ]
    out: dict = {}
    for name in QUERIES:
        out[name] = {}
        for d in dirs:
            p = subprocess.run(
                [sys.executable, "-c", _CHILD, name, d],
                capture_output=True,
                text=True,
                cwd="/root/repo",
            )
            secs = None
            for line in p.stdout.splitlines():
                if line.startswith("RESULT "):
                    secs = float(line.split()[1])
            if secs is None:
                print(f"[FAIL] {name} @ {d}: {p.stderr[-500:]}", file=sys.stderr)
                return 1
            out[name][d] = secs
            print(f"# {name:28s} {d:24s} {secs:.3f}s", flush=True)
    print(json.dumps({"probe": "sketch_family", "secs": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
