#!/bin/bash
# Round-4 sweep F (after r4e): close the accept-anchor gap. The fitted
# candidates straddle 2.50 badly (s0.2 proxy 2.19, s0.5 1.81, s0.05
# degenerate); an s0.1 corpus + fit may land measured accept in
# (2.19, 2.50] — if so the re-pick upgrades the headline anchor.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmark/results/r4f_sweep.jsonl}"
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

echo "=== corpus s0.1 ($(date +%H:%M:%S))" >&2
timeout 3600 python tools/gen_distill_corpus.py --scales 0.1 \
    >> benchmark/results/r4f_corpus.log 2>&1
echo "{\"mode\": \"corpus_s0.1\", \"result\": \"rc=$?\"}" >> "$OUT"
echo "=== fit s0.1 ($(date +%H:%M:%S))" >&2
timeout 3000 python tools/distill_drafter.py \
    >> benchmark/results/r4f_fit.log 2>&1
echo "{\"mode\": \"fit\", \"result\": \"rc=$?\"}" >> "$OUT"
echo "=== recalibrate ($(date +%H:%M:%S))" >&2
timeout 5400 python tools/calibrate_accept.py \
    >> benchmark/results/r4f_calibration.log 2>&1
echo "{\"mode\": \"calibrate\", \"result\": \"rc=$?\"}" >> "$OUT"
run headline_v3 python bench.py
echo "r4f sweep done ($(date +%H:%M:%S))" >&2
