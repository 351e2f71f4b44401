#!/bin/bash
# Round-4 sweep G (runs after r4f releases the TPU): post-fix measurement
# pass on the reverted/fixed kernels (b143de4).
#  1. exp_r4a_profile AB at 96K: the realistic sparse-prefill decomposition
#     (VERDICT r3 task 4 — never captured) + a POST-FIX decode trace to
#     replace r4g_decode_trace.log (which measured the since-fixed
#     regressions and drove 410d3ce).
#  2. Post-fix full-stack A/B rows: sparse-pair and quant-draft-head at
#     96K, plus the 32K row (r4e's ran with the bad broadcast gather).
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmark/results/r4g_sweep.jsonl}"
mkdir -p "$(dirname "$OUT")"

run() {
  local name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" >&2
  local line
  line=$(timeout 2400 "$@" 2>/dev/null | tail -1)
  if [ -n "$line" ]; then
    echo "{\"mode\": \"$name\", \"result\": $line}" >> "$OUT"
    echo "$name -> $line" >&2
  else
    echo "{\"mode\": \"$name\", \"result\": null}" >> "$OUT"
    echo "$name -> FAILED/TIMEOUT" >&2
  fi
}

# 0. mandatory post-kernel-edit gate (now also compiles the coarse
# tree_pair=2 shape)
echo "=== sparse smoke ($(date +%H:%M:%S))" >&2
timeout 2400 python benchmark/smoke_sparse_tpu.py \
    > benchmark/results/r4g_smoke3.log 2>&1
echo "{\"mode\": \"smoke\", \"result\": \"rc=$?\"}" >> "$OUT"

echo "=== postfix profile AB ($(date +%H:%M:%S))" >&2
timeout 4200 python benchmark/exp_r4a_profile.py 98304 AB \
    > benchmark/results/r4g_profile_postfix.log 2>&1
echo "{\"mode\": \"profile_postfix\", \"result\": \"rc=$?\"}" >> "$OUT"

# coarse tree pairing: 2 x 512-row sub-tiles per tree-verify grid step
# (same bytes, half the steps) vs the unpaired default
run sparse96k_spec_real_treepair2 python bench.py --tree-pair 2
run sparse32k_spec_real_v3 python bench.py --prompt-len 32768

# post-fix batched spec (hierarchical FR-head top-k + big-M stacked /
# dyn-layer quant BlockSpecs landed after the r4e rows: 96 ms/round had
# 13.7 ms of sorts + ~11 ms of pack-slice copies) — recovered crossover
run batch8_spec_oracle_v2 python bench.py --batch 8 --spec \
    --oracle-accept --prompt-len 512

# realistic 96K prefill lever A/B: gs / bt / stage1-pallas variants in
# one process against one prefilled context (supersedes the stage1-only
# A/B; each variant re-traces via TUNE + clear_caches)
echo "=== prefill lever A/B ($(date +%H:%M:%S))" >&2
CPMCU_REALISTIC=1 timeout 2400 python benchmark/exp_r4g_prefill_ab.py \
    > benchmark/results/r4g_prefill_ab.log 2>&1
echo "{\"mode\": \"prefill_ab\", \"result\": \"rc=$?\"}" >> "$OUT"

run batch2_spec_oracle_v2 python bench.py --batch 2 --spec \
    --oracle-accept --prompt-len 512
run sparse96k_spec_real_pair1_v3 python bench.py --sparse-pair 1
run sparse96k_spec_real_noquanthead_v3 python bench.py --no-quant-draft-head
echo "r4g sweep done ($(date +%H:%M:%S))" >&2
