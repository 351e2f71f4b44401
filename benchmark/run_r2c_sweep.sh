#!/bin/bash
# Follow-up rows if the r2b sweep finishes before the deadline.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmark/results/r2b_sweep.jsonl}"
run() {
  local name="$1"; shift
  if [ -n "${SWEEP_DEADLINE:-}" ] && \
     [ $(date +%s) -gt $((SWEEP_DEADLINE - 720)) ]; then
    echo "{\"mode\": \"$name\", \"result\": \"skipped_deadline\"}" >> "$OUT"
    return
  fi
  echo "=== $name ($(date +%H:%M:%S))" >&2
  local line
  line=$(timeout 700 "$@" 2>/dev/null | tail -1)
  if [ -n "$line" ]; then
    echo "{\"mode\": \"$name\", \"result\": $line}" >> "$OUT"
  else
    echo "{\"mode\": \"$name\", \"result\": null}" >> "$OUT"
  fi
}
run dense_05b_nofuse python bench.py --config minicpm4-0.5b --no-quant --no-dense-fusion --steps 64
run prefix_8k        python bench.py --prefix-bench --prompt-len 8192
run batch_8_chain_spec python bench.py --batch 8 --spec --spec-type chain --steps 64
run sparse_spec_oracle python bench.py --sparse --spec --oracle-accept --prompt-len 32768 --steps 64
run batch_4_sparse   python bench.py --batch 4 --sparse --prompt-len 8192 --steps 64
run sparse_16k       python bench.py --sparse --prompt-len 16384 --steps 64
run sparse_96k       python bench.py --sparse --prompt-len 98304 --steps 64
echo "r2c done" >&2
