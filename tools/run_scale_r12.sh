#!/bin/bash
# Round-12 scale pipeline (VERDICT r11 next #1/#2/#7):
#   1. QUIET sf0.1 composite stamp on r12 code (gated by
#      tools/quiet_gate.py, retried) — the round's trend number.
#   2. SECOND quiet 100x base (VERDICT #7): the r11 base was a single
#      accepted run; a second quiet run bounds run-to-run variance on
#      the denominator every decade gate divides by. Folded per-query
#      min with the r11 base by tools/fold_scale_r12.py (r12-CHANGED
#      rows use the r12 run alone — their executed path changed).
#   3. 1000x refresh of the r12-changed rows (routing-plan budget
#      pre-check + broadcast carry on the IVF serves; heal tolerance +
#      crossing-dir auto-compaction on the index maintenance paths).
#   4. tpch_q9_profit phase probes at 100x and 1000x (VERDICT #1 —
#      the board's worst decade ratio, adjudicated like star-join/HH).
#   5. ANN routing probe one decade up (VERDICT #2): embeddings-only
#      8x replica of the 1000x tier (~16M vectors) -> phase split
#      plan-build / routing / serve / audit at 2M and 16M.
# Exclusions unchanged from r11 (documented in SCALE.md):
# bitext_mining_pairs (labeled quadratic audit ceiling),
# jaccard_pairs_prefix_filter at 1000x (>55 GB pair relation),
# ann_hubness_audit at 100x+ (exact kernel's designed 200k bound).
set -uo pipefail
cd /root/repo

quiet_run () {
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
  return 0
}

Q100X=$(python - <<'EOF'
import bench
drop = {"bitext_mining_pairs", "ann_hubness_audit"}
print(",".join(q for q in bench.HEADLINE if q not in drop))
EOF
)
Q1000X_R12="ann_topk_ivf,ann_recall_sweep,ivf_trained_recall,bitext_mining_ivf,ann_hubness_audit_ivf,trigram_search_appended,trigram_search_indexed,minhash_pairs_indexed"

echo "== stage 1: quiet sf0.1 composite stamp (r12 code) ==" >&2
quiet_run .benchmarks/bench_r12_quiet_stamp.json 5 \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1

echo "== stage 2: second quiet 100x base ==" >&2
quiet_run .scratch/bench_100x_r12.json 4 \
  SPARK_GRAFT_SF_DIR=.scratch/sf10f SPARK_GRAFT_BENCH_ITERS=1 \
  SPARK_GRAFT_QUERIES="$Q100X"

echo "== stage 3: 1000x r12-changed rows ==" >&2
SPARK_GRAFT_SF_DIR=.scratch/sf100 SPARK_GRAFT_BENCH_ITERS=1 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=512 SPARK_GRAFT_QUERIES="$Q1000X_R12" \
  python bench.py > .scratch/bench_1000x_r12.json 2> .scratch/bench_1000x_r12.err

echo "== stage 4: q9 phase probes ==" >&2
python tools/scale_probe_q9.py .scratch/sf10f .scratch/sf100 \
  > .scratch/probe_q9_r12.json 2> .scratch/probe_q9_r12.err

echo "== stage 5: ANN decade-up probe ==" >&2
if [ ! -d .scratch/emb8/embeddings.parquet ]; then
  echo "== generating 8x embeddings-only replica (~16M vectors) ==" >&2
  python tools/scale_data.py .scratch/sf100 .scratch/emb8 8 embeddings \
    >> .scratch/gen.log 2>&1
fi
python tools/scale_probe_ann_decade.py .scratch/sf100 .scratch/emb8 \
  > .scratch/probe_ann_decade_r12.json 2> .scratch/probe_ann_decade_r12.err

echo "== done ==" >&2
tail -1 .benchmarks/bench_r12_quiet_stamp.json
tail -1 .scratch/bench_100x_r12.json
tail -1 .scratch/bench_1000x_r12.json
cat .scratch/probe_q9_r12.json .scratch/probe_ann_decade_r12.json
