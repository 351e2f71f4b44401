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
run sparse96k_spec_real_pair1_v3 python bench.py --sparse-pair 1
run sparse96k_spec_real_noquanthead_v3 python bench.py --no-quant-draft-head
run sparse32k_spec_real_v3 python bench.py --prompt-len 32768

# post-fix batched spec (hierarchical FR-head top-k + stacked big-M
# quant BlockSpec landed after the r4e rows: 96 ms/round had 13.7 ms of
# sorts + ~11 ms of pack-slice copies) — measure the recovered crossover
run batch8_spec_oracle_v2 python bench.py --batch 8 --spec \
    --oracle-accept --prompt-len 512
run batch2_spec_oracle_v2 python bench.py --batch 2 --spec \
    --oracle-accept --prompt-len 512

# stage-1 scorer A/B under the REALISTIC checkpoint (parked "within
# noise" only under synthetic union saturation; realistic stage-2 is
# smaller so stage-1's relative share is larger)
echo "=== stage1 A/B realistic ($(date +%H:%M:%S))" >&2
CPMCU_REALISTIC=1 timeout 2400 python benchmark/exp_stage1_ab.py \
    > benchmark/results/r4g_stage1_ab.log 2>&1
echo "{\"mode\": \"stage1_ab_realistic\", \"result\": \"rc=$?\"}" >> "$OUT"
echo "r4g sweep done ($(date +%H:%M:%S))" >&2
