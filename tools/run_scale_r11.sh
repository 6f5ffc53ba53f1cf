#!/bin/bash
# Round-11 scale pipeline (VERDICT r10 next #1/#2/#3/#4):
#   1. QUIET sf0.1 composite stamp on r11 code — the round's headline
#      number, gated on canary_ratio<=1.2 AND episode_suspect=false
#      (tools/quiet_gate.py), retried until the box goes quiet.
#   2. QUIET 100x base — same gate, full headline minus the documented
#      exclusions. THE deliverable: every decade ratio divides by this.
#   3. 1000x refresh of the r11-changed rows (two-level serving
#      adoption: bitext/ann_topk/sweep/trained; trigram auto-compact;
#      the two adjudication watch items star_join_bucketed +
#      heavy_hitter_tokens ride along for same-code ratios).
#   4. Phase-isolation probes at 100x and 1000x:
#      scale_probe_starjoin (base inflation / shuffle-partition pin /
#      layout regression) and scale_probe_hh (tokenize/sketch/recount).
# Exclusions (documented in SCALE.md): bitext_mining_pairs (labeled
# quadratic audit ceiling), jaccard_pairs_prefix_filter at 1000x
# (>55 GB pair-relation spill vs this box's scratch),
# ann_hubness_audit at 100x+ (exact kernel's designed 200k bound).
set -uo pipefail
cd /root/repo

quiet_run () {
  # quiet_run <out_json> <max_tries> <env...>
  local out="$1"; shift
  local tries="$1"; shift
  for i in $(seq 1 "$tries"); do
    echo "== attempt $i -> $out ==" >&2
    env "$@" python bench.py > "$out" 2> "${out%.json}.err"
    if python tools/quiet_gate.py "$out"; then
      echo "== quiet after attempt $i ==" >&2
      return 0
    fi
    sleep 120
  done
  echo "== WARNING: $out never went quiet after $tries tries ==" >&2
  return 0  # keep the pipeline going; the artifact records the state
}

Q100X=$(python - <<'EOF'
import bench
drop = {"bitext_mining_pairs", "ann_hubness_audit"}
print(",".join(q for q in bench.HEADLINE if q not in drop))
EOF
)
Q1000X_R11="star_join_agg,star_join_bucketed,heavy_hitter_tokens,bitext_mining_ivf,ann_topk_ivf,trigram_search_appended,trigram_search_indexed,ann_hubness_audit_ivf,semantic_dedup_flags"

if [ ! -d .scratch/sf100/lineitem.parquet ]; then
  echo "== generating replicas ==" >&2
  python tools/scale_data.py /root/testdata/sf0.1 .scratch/sf1 10
  python tools/scale_data.py .scratch/sf1 .scratch/sf10f 10
  python tools/scale_data.py .scratch/sf10f .scratch/sf100 10
fi

echo "== stage 1: quiet sf0.1 composite stamp (r11 code) ==" >&2
quiet_run .benchmarks/bench_r11_quiet_stamp.json 5 \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1

echo "== stage 2: quiet 100x base ==" >&2
quiet_run .scratch/bench_100x_r11.json 4 \
  SPARK_GRAFT_SF_DIR=.scratch/sf10f SPARK_GRAFT_BENCH_ITERS=1 \
  SPARK_GRAFT_QUERIES="$Q100X"

echo "== stage 3: 1000x r11-changed rows ==" >&2
SPARK_GRAFT_SF_DIR=.scratch/sf100 SPARK_GRAFT_BENCH_ITERS=1 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=512 SPARK_GRAFT_QUERIES="$Q1000X_R11" \
  python bench.py > .scratch/bench_1000x_r11.json 2> .scratch/bench_1000x_r11.err

echo "== stage 4: phase probes ==" >&2
python tools/scale_probe_starjoin.py .scratch/sf10f .scratch/sf100 \
  > .scratch/probe_starjoin_r11.json 2> .scratch/probe_starjoin_r11.err
python tools/scale_probe_hh.py .scratch/sf10f .scratch/sf100 \
  > .scratch/probe_hh_r11.json 2> .scratch/probe_hh_r11.err

echo "== done ==" >&2
tail -1 .benchmarks/bench_r11_quiet_stamp.json
tail -1 .scratch/bench_100x_r11.json
tail -1 .scratch/bench_1000x_r11.json
cat .scratch/probe_starjoin_r11.json .scratch/probe_hh_r11.json
