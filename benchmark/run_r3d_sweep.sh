#!/bin/bash
# Round-3 sweep D: post-glue-cut sparse+spec round profiles (random AND
# realistic weights) — why didn't the realistic round shrink? — plus the
# calibrated headline re-runs (default drafter noise updated from r3c).
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmark/results/r3d_sweep.jsonl}"
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
  local log="benchmark/results/r3d_${name}.log"
  if timeout 1800 "$@" > "$log" 2>&1; then
    echo "{\"mode\": \"$name\", \"result\": \"ok\", \"log\": \"$log\"}" >> "$OUT"
  else
    echo "{\"mode\": \"$name\", \"result\": null, \"log\": \"$log\"}" >> "$OUT"
  fi
}

exp sparse_spec_profile_real env CPMCU_REALISTIC=1 python benchmark/exp_sparse_spec_profile.py
exp sparse_spec_profile python benchmark/exp_sparse_spec_profile.py
echo "sweep D done: $OUT" >&2
