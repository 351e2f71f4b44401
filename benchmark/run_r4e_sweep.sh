#!/bin/bash
# Round-4 sweep E (runs after r4d releases the TPU): regression trace,
# pair-A/B re-run on the fixed vis-word kernel, hier-spec reconciliation
# (VERDICT r3 task 5), batched-spec decomposition + crossover (task 6).
# Rows are ordered decision-critical-first; ~15-25 min each with fresh
# compiles (the axon backend does not serialize the compile cache).
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmark/results/r4e_sweep.jsonl}"
mkdir -p "$(dirname "$OUT")"

run() {
  local name="$1"; shift
  if [ -n "${SWEEP_DEADLINE:-}" ] && \
     [ $(date +%s) -gt $((SWEEP_DEADLINE - 1500)) ]; then
    echo "{\"mode\": \"$name\", \"result\": \"skipped_deadline\"}" >> "$OUT"
    return
  fi
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

# wait (up to 4 h) for the r4d sweep to release the TPU
for i in $(seq 1440); do
  grep -q "r4d sweep done" benchmark/results/r4d_sweep.log 2>/dev/null && break
  sleep 10
done
sleep 15

# 1. REGRESSION TRACE: the 96K full-stack round went 24 ms (r3b) -> ~32 ms
# (r4b/r4d); re-trace section B of the r4a profile on the FIXED kernel and
# diff TOP OPS against r4a_profile.log (same prompt, same noise drafter)
echo "=== r4a-B regression trace ($(date +%H:%M:%S))" >&2
timeout 2400 python benchmark/exp_r4a_profile.py 98304 B \
    > benchmark/results/r4g_decode_trace.log 2>&1
echo "{\"mode\": \"regression_trace\", \"result\": \"rc=$?\"}" >> "$OUT"

# 2. pair A/B re-run (the r4d pair rows measured the per-step vis-word DMA
# bug, fixed in 00d9bf8) + the 32K full stack that timed out in r4d
run sparse96k_spec_real_pair4_v2 python bench.py --sparse --spec \
    --realistic --prompt-len 98304
run sparse96k_spec_real_pair1_v2 python bench.py --sparse --spec \
    --realistic --prompt-len 98304 --sparse-pair 1
run sparse32k_spec_real_v2 python bench.py --sparse --spec --realistic \
    --prompt-len 32768

# 3. hier reconciliation: one process, three measurement styles + trace —
# scan (the r4 dyn-layer fix) vs unroll (the r3 baseline the 9.5/17.6/207
# spread was measured on); plus the all-accept oracle ceiling (scan)
echo "=== hier reconcile scan ($(date +%H:%M:%S))" >&2
timeout 2400 python benchmark/exp_r4c_hier.py quant scan \
    > benchmark/results/r4e_hier_profile_scan.log 2>&1
echo "{\"mode\": \"hier_profile_scan\", \"result\": \"rc=$?\"}" >> "$OUT"
echo "=== hier reconcile unroll ($(date +%H:%M:%S))" >&2
timeout 2400 python benchmark/exp_r4c_hier.py quant unroll \
    > benchmark/results/r4e_hier_profile_unroll.log 2>&1
echo "{\"mode\": \"hier_profile_unroll\", \"result\": \"rc=$?\"}" >> "$OUT"
run hier_oracle_scan python bench.py --spec --spec-type hier \
    --oracle-accept --prompt-len 2048

# 4. batched-spec decomposition (plain anchor + spec + per-round + trace)
echo "=== batchspec profile ($(date +%H:%M:%S))" >&2
timeout 2400 python benchmark/exp_r4e_batchspec.py 8 \
    > benchmark/results/r4e_batchspec_profile.log 2>&1
echo "{\"mode\": \"batchspec_profile\", \"result\": \"rc=$?\"}" >> "$OUT"

# 5. crossover: does batched spec beat plain batching at small B?
# (plain batch8=768 and spec batch8 oracle=254 are r3b data points)
run batch2_plain  python bench.py --batch 2 --prompt-len 512
run batch2_spec_oracle python bench.py --batch 2 --spec --oracle-accept \
    --prompt-len 512
run batch8_spec_oracle python bench.py --batch 8 --spec --oracle-accept \
    --prompt-len 512
echo "r4e sweep done ($(date +%H:%M:%S))" >&2
