#!/bin/bash
# Trimmed round-2b sweep for the short continuation session: highest-value
# unmeasured rows first, 700s/row, skip when the deadline can't fit a row.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmark/results/r2b_sweep.jsonl}"
mkdir -p "$(dirname "$OUT")"
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
run dense            python bench.py --steps 64
run sparse_spec_32k  python bench.py --sparse --spec --prompt-len 32768 --steps 64
run spec_eagle2      python bench.py --spec --steps 64
run batch_8          python bench.py --batch 8 --steps 64
run spec_eagle3      python bench.py --spec --spec-type eagle3 --steps 64
run spec_hier        python bench.py --spec --spec-type hier --steps 32
run dense_05b_bf16   python bench.py --config minicpm4-0.5b --no-quant --steps 64
run dense_v2_extract python bench.py --no-v3-extract --steps 64
run spec_chain       python bench.py --spec --spec-type chain --steps 64
run sparse_32k       python bench.py --sparse --prompt-len 32768 --steps 64
echo "sweep done" >&2
