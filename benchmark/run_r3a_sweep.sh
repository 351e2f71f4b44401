#!/bin/bash
# Round-3 sweep A: profile-first measurements for the VERDICT r2 tasks.
# One TPU client at a time (CLAUDE.md: concurrent clients wedge the tunnel).
# Usage: bash benchmark/run_r3a_sweep.sh [outfile]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmark/results/r3a_sweep.jsonl}"
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

# raw-output experiments (their own prints go to a log file)
exp() {
  local name="$1"; shift
  if [ -n "${SWEEP_DEADLINE:-}" ] && \
     [ $(date +%s) -gt $((SWEEP_DEADLINE - 1500)) ]; then
    echo "{\"mode\": \"$name\", \"result\": \"skipped_deadline\"}" >> "$OUT"
    return
  fi
  echo "=== $name: $* ($(date +%H:%M:%S))" >&2
  local log="benchmark/results/r3a_${name}.log"
  if timeout 1800 "$@" > "$log" 2>&1; then
    echo "{\"mode\": \"$name\", \"result\": \"ok\", \"log\": \"$log\"}" >> "$OUT"
  else
    echo "{\"mode\": \"$name\", \"result\": null, \"log\": \"$log\"}" >> "$OUT"
  fi
}

# VERDICT task 2a: fresh per-op attribution of the dense decode 6.5ms
exp dense_profile python benchmark/exp_dense_decode.py
# VERDICT task 1: the reference's headline operating point (~100K full stack)
run sparse_96k_eagle2 python bench.py --sparse --spec --prompt-len 98304 --steps 64
run sparse_96k_eagle2_oracle python bench.py --sparse --spec --oracle-accept --prompt-len 98304 --steps 64
# task 1: where does the 32K round's glue go (fresh trace)
exp sparse_spec_profile python benchmark/exp_sparse_spec_profile.py
# task 4: fresh hier round trace (46ms wall vs 24ms device)
exp hier_profile python benchmark/exp_hier_profile.py
# task 5: g-split / bt ladder
exp gsplit_ab python benchmark/exp_gsplit_ab.py
echo "sweep A done: $OUT" >&2
exp decode_floor python benchmark/exp_decode_floor.py
run dense_realistic python bench.py --realistic --steps 64
run spec_realistic python bench.py --realistic --spec --steps 128
run sparse32k_realistic python bench.py --realistic --sparse --prompt-len 32768 --steps 64
run sparse96k_spec_realistic python bench.py --realistic --sparse --spec --prompt-len 98304 --steps 128
echo "sweep A+ done" >&2
