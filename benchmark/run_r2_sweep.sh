#!/bin/bash
# Round-2 TPU measurement sweep: one mode at a time (concurrent clients
# contend on the single tunneled chip and distort timings). Appends one
# JSON line per mode to benchmark/results/r2_sweep.jsonl.
# Usage: bash benchmark/run_r2_sweep.sh [outfile]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmark/results/r2_sweep.jsonl}"
mkdir -p "$(dirname "$OUT")"

run() {
  local name="$1"; shift
  # SWEEP_DEADLINE (epoch s): skip rows that could still be running at the
  # deadline (row timeout 1400s + slack) so the driver's round-end
  # bench.py gets the chip to itself
  if [ -n "${SWEEP_DEADLINE:-}" ] && \
     [ $(date +%s) -gt $((SWEEP_DEADLINE - 1500)) ]; then
    echo "=== $name: SKIPPED (sweep deadline)" >&2
    echo "{\"mode\": \"$name\", \"result\": \"skipped_deadline\"}" >> "$OUT"
    return
  fi
  echo "=== $name: $* (
$(date +%H:%M:%S))" >&2
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

run dense        python bench.py --steps 64
run dense_v2_extract python bench.py --no-v3-extract --steps 64
run dense_05b_bf16 python bench.py --config minicpm4-0.5b --no-quant --steps 64
run dense_05b_nofuse python bench.py --config minicpm4-0.5b --no-quant --no-dense-fusion --steps 64
run spec_eagle2  python bench.py --spec --steps 64
run spec_oracle  python bench.py --spec --oracle-accept --steps 64
run sparse_spec_oracle python bench.py --sparse --spec --oracle-accept --prompt-len 32768 --steps 64
run sparse_spec  python bench.py --sparse --spec --prompt-len 32768 --steps 64
run spec_chain   python bench.py --spec --spec-type chain --steps 64
run spec_eagle3  python bench.py --spec --spec-type eagle3 --steps 64
run spec_hier    python bench.py --spec --spec-type hier --steps 32
run sparse_32k   python bench.py --sparse --prompt-len 32768 --steps 64
run sparse_16k   python bench.py --sparse --prompt-len 16384 --steps 64
run sparse_96k   python bench.py --sparse --prompt-len 98304 --steps 64
run sparse_32k_ou python bench.py --sparse --oracle-union --prompt-len 32768 --steps 64
run sparse_96k_ou python bench.py --sparse --oracle-union --prompt-len 98304 --steps 64
run sparse_spec_ou python bench.py --sparse --spec --oracle-union --oracle-accept --prompt-len 32768 --steps 64
run batch_8      python bench.py --batch 8 --steps 64
run batch_4_sparse python bench.py --batch 4 --sparse --prompt-len 8192 --steps 64
run batch_8_chain_spec python bench.py --batch 8 --spec --spec-type chain --steps 64
run batch_8_eagle_spec python bench.py --batch 8 --spec --steps 64
run batch_4_sparse_chain_spec python bench.py --batch 4 --sparse --spec --spec-type chain --prompt-len 8192 --steps 64
run prefix_8k    python bench.py --prefix-bench --prompt-len 8192

# dataset-eval machinery end-to-end on TPU (VERDICT r1 item 4); the runner
# prints its own summary lines — record its exit status only
dataset() {
  local name="$1"; shift
  if [ -n "${SWEEP_DEADLINE:-}" ] && \
     [ $(date +%s) -gt $((SWEEP_DEADLINE - 1500)) ]; then
    echo "=== $name: SKIPPED (sweep deadline)" >&2
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
dataset eval_specbench python -m cpmcu_tpu.tools.run_dataset_eval \
  --dataset specbench --num-samples 8 --generation-length 64 --spec
dataset eval_gsm8k python -m cpmcu_tpu.tools.run_dataset_eval \
  --dataset gsm8k --num-samples 8 --generation-length 64
echo "sweep done: $OUT" >&2
