#!/bin/bash
# Round-9 full-method scale pipeline (VERDICT r8 #4):
#   1. regenerate the chained replicas (the box was reimaged between
#      rounds; .scratch is measurement infrastructure, never committed)
#   2. refresh the FULL 100x tier post-fix (the r9 sqrt-dial / Arrow
#      router / trigram fixes changed several 100x bases)
#   3. run the 1000x tier at the SAME standard as the 10x/100x tiers:
#      per-query warm-up pass, then one timed iteration, canary-gated
#      (bench.py's tier methodology; 5-iter min-of-N is the sf0.1
#      trend protocol, not the scale-tier protocol)
# Exclusions at 1000x (documented in SCALE.md round-8):
#   - bitext_mining_pairs: labeled quadratic audit ceiling
#   - jaccard_pairs_prefix_filter: 1.1B-row pair relation needs >55 GB
#     sort spill, more scratch disk than this box (linear-in-pairs by
#     construction; cluster per-executor disk absorbs it)
set -euo pipefail
cd /root/repo

Q100X=$(python - <<'EOF'
import bench
qs = [q for q in bench.HEADLINE if q != "bitext_mining_pairs"]
print(",".join(qs))
EOF
)
Q1000X=$(python - <<'EOF'
import bench
drop = {"bitext_mining_pairs", "jaccard_pairs_prefix_filter"}
# the r8 23-query scale-sensitive list + the r9-changed IVF family
keep = [
    "tpch_q1", "tpch_q6_scan", "tpch_q9_profit", "star_join_agg",
    "events_hourly", "sessionize_events", "dedup_exact",
    "jaccard_pairs_exact", "minhash_pairs", "simhash_fingerprints",
    "embedding_near_dup", "corpus_curation", "text_profile_fused",
    "heavy_hitter_tokens", "trigram_search_like",
    "trigram_search_indexed", "cluster_topic_terms",
    "semantic_dedup_flags", "minhash_pairs_indexed",
    "incremental_dedup_probe", "lm_stupid_backoff_scores",
    "shard_plan_balance", "ann_hubness_audit_ivf",
    "bitext_mining_ivf", "ann_topk_ivf",
]
assert not (set(keep) & drop)
assert set(keep) <= set(bench.HEADLINE)
print(",".join(keep))
EOF
)

if [ ! -d .scratch/sf100/lineitem.parquet ]; then
  echo "== generating replicas ==" >&2
  python tools/scale_data.py /root/testdata/sf0.1 .scratch/sf1 10
  python tools/scale_data.py .scratch/sf1 .scratch/sf10f 10
  python tools/scale_data.py .scratch/sf10f .scratch/sf100 10
fi
du -sh .scratch/sf100 >&2

echo "== 100x refresh ==" >&2
SPARK_GRAFT_SF_DIR=.scratch/sf10f SPARK_GRAFT_BENCH_ITERS=1 \
  SPARK_GRAFT_QUERIES="$Q100X" \
  python bench.py > .scratch/bench_100x_r9.json 2> .scratch/bench_100x_r9.err

echo "== 1000x tier ==" >&2
SPARK_GRAFT_SF_DIR=.scratch/sf100 SPARK_GRAFT_BENCH_ITERS=1 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=512 SPARK_GRAFT_QUERIES="$Q1000X" \
  python bench.py > .scratch/bench_1000x_r9.json 2> .scratch/bench_1000x_r9.err

echo "== done ==" >&2
tail -1 .scratch/bench_100x_r9.json
tail -1 .scratch/bench_1000x_r9.json
