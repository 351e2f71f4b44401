#!/bin/bash
# Round-3 sweep B. Ordered by evidence value: the realistic-checkpoint
# rows are the round's headline (VERDICT tasks 1-3), then hier/batch
# A/Bs, re-profiles, dataset hygiene. One TPU client at a time.
# PRECONDITION: .realistic_cache populated (the script waits for it).
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmark/results/r3b_sweep.jsonl}"
mkdir -p "$(dirname "$OUT")"

# wait (up to 1h) for the realistic param cache so bench rows don't burn
# their timeout on numpy generation
for i in $(seq 360); do
  ls .realistic_cache/real_*.npz >/dev/null 2>&1 && break
  sleep 10
done

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

# --- realistic-checkpoint evidence (VERDICT tasks 1+3) -------------------
# the driver's exact default invocation (warms its compile-cache entries)
run headline_default python bench.py
run sparse32k_spec_realistic python bench.py --realistic --sparse --spec --prompt-len 32768 --steps 128
run sparse96k_spec_realistic python bench.py --realistic --sparse --spec --prompt-len 98304 --steps 128
run sparse32k_realistic python bench.py --dense --realistic --sparse --prompt-len 32768 --steps 64
run sparse96k_realistic python bench.py --dense --realistic --sparse --prompt-len 98304 --steps 64
run dense_realistic python bench.py --dense --realistic --steps 64
run spec_realistic_qdh python bench.py --realistic --spec --quant-draft-head --steps 128
exp gsplit_ab_realistic env CPMCU_REALISTIC=1 python benchmark/exp_gsplit_ab.py
# --- post-glue-cut re-measurements (random weights, compare to r2b) ------
run dense_flag python bench.py --dense --steps 64
run spec_eagle2 python bench.py --spec --steps 128
run sparse32k_spec python bench.py --sparse --spec --prompt-len 32768 --steps 128
# --- hier draft dtype A/B (VERDICT task 4) -------------------------------
run hier_quant_draft python bench.py --spec --spec-type hier --steps 32
run hier_bf16_draft python bench.py --spec --spec-type hier --hier-draft bf16 --steps 32
exp hier_profile2 python benchmark/exp_hier_profile.py
# --- batched speculation winning row (VERDICT task 7) --------------------
run batch8_eagle_oracle python bench.py --batch 8 --spec --oracle-accept --steps 64
run batch8_plain python bench.py --batch 8 --steps 64
# --- dataset hygiene (VERDICT task 6) ------------------------------------
dataset eval_specbench_oracle python -m cpmcu_tpu.tools.run_dataset_eval \
  --dataset specbench --num-samples 8 --generation-length 64 --spec --oracle-accept
dataset eval_gsm8k python -m cpmcu_tpu.tools.run_dataset_eval \
  --dataset gsm8k --num-samples 8 --generation-length 64
echo "sweep B done: $OUT" >&2
