#!/bin/bash
# Round-3 sweep B: hier draft-dtype A/B, batched-spec oracle rows, dataset
# eval hygiene re-run. Run AFTER run_r3a_sweep.sh (one TPU client at a time).
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmark/results/r3b_sweep.jsonl}"
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
  line=$(timeout 1400 "$@" 2>/dev/null | tail -1)
  if [ -n "$line" ]; then
    echo "{\"mode\": \"$name\", \"result\": $line}" >> "$OUT"
    echo "$name -> $line" >&2
  else
    echo "{\"mode\": \"$name\", \"result\": null}" >> "$OUT"
    echo "$name -> FAILED/TIMEOUT" >&2
  fi
}

dataset() {
  local name="$1"; shift
  if [ -n "${SWEEP_DEADLINE:-}" ] && \
     [ $(date +%s) -gt $((SWEEP_DEADLINE - 1500)) ]; then
    echo "{\"mode\": \"$name\", \"result\": \"skipped_deadline\"}" >> "$OUT"
    return
  fi
  echo "=== $name: $* ($(date +%H:%M:%S))" >&2
  if timeout 1400 "$@" >&2 2>&1; then
    echo "{\"mode\": \"$name\", \"result\": \"ok\"}" >> "$OUT"
  else
    echo "{\"mode\": \"$name\", \"result\": null}" >> "$OUT"
  fi
}

# VERDICT task 4: hier draft dtype A/B
run hier_quant_draft python bench.py --spec --spec-type hier --steps 32
run hier_bf16_draft python bench.py --spec --spec-type hier --hier-draft bf16 --steps 32
# VERDICT task 7: batched speculation where it should win
run batch8_eagle_oracle python bench.py --batch 8 --spec --oracle-accept --steps 64
run batch8_plain python bench.py --batch 8 --steps 64
# realistic full stack at 32K + W4 draft-head A/B
run sparse32k_spec_realistic python bench.py --realistic --sparse --spec --prompt-len 32768 --steps 128
run spec_realistic_qdh python bench.py --realistic --spec --quant-draft-head --steps 128
# re-profiles after the tree/chain M-pad fix
exp() {
  local name="$1"; shift
  if [ -n "${SWEEP_DEADLINE:-}" ] && \
     [ $(date +%s) -gt $((SWEEP_DEADLINE - 1500)) ]; then
    echo "{\"mode\": \"$name\", \"result\": \"skipped_deadline\"}" >> "$OUT"
    return
  fi
  echo "=== $name: $* ($(date +%H:%M:%S))" >&2
  local log="benchmark/results/r3b_${name}.log"
  if timeout 1800 "$@" > "$log" 2>&1; then
    echo "{\"mode\": \"$name\", \"result\": \"ok\", \"log\": \"$log\"}" >> "$OUT"
  else
    echo "{\"mode\": \"$name\", \"result\": null, \"log\": \"$log\"}" >> "$OUT"
  fi
}
exp hier_profile2 python benchmark/exp_hier_profile.py
run sparse32k_spec python bench.py --sparse --spec --prompt-len 32768 --steps 128
run spec_eagle2 python bench.py --spec --steps 128
# VERDICT task 6: steady-state dataset artifacts (warmup + oracle accept)
dataset eval_specbench_oracle python -m cpmcu_tpu.tools.run_dataset_eval \
  --dataset specbench --num-samples 8 --generation-length 64 --spec --oracle-accept
dataset eval_gsm8k python -m cpmcu_tpu.tools.run_dataset_eval \
  --dataset gsm8k --num-samples 8 --generation-length 64
echo "sweep B done: $OUT" >&2
# drive + warm the driver's exact default invocation (plain bench.py)
run headline_default python bench.py
run dense_flag python bench.py --dense
echo "sweep B+ done" >&2
run dense_realistic2 python bench.py --dense --realistic --steps 64
exp gsplit_ab_realistic env CPMCU_REALISTIC=1 python benchmark/exp_gsplit_ab.py
