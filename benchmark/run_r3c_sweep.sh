#!/bin/bash
# Round-3 sweep C: drafter-noise accept calibration on the 8B (target the
# reference's measured 2.50 mean accept), then the calibrated headline.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmark/results/r3c_sweep.jsonl}"
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

run spec_real_n25 python bench.py --spec --realistic --drafter-noise 0.25 --steps 192
run spec_real_n15 python bench.py --spec --realistic --drafter-noise 0.15 --steps 192
run spec_real_n08 python bench.py --spec --realistic --drafter-noise 0.08 --steps 192
echo "sweep C done: $OUT" >&2
