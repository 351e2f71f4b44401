#!/bin/bash
# Chained after run_r5_sweep.sh (waits on its completion sentinel):
# the hier --oracle-accept ceiling row with the fixed warmup harness
# (bench_spec now warms through one full fused segment; the r4e 2.42
# tok/s row timed the hier_segment compile). STRICTLY SEQUENTIAL —
# never a second axon client.
set -u
cd "$(dirname "$0")/.."
OUT="benchmark/results/r5_sweep.jsonl"
LOG="benchmark/results/r5_sweep.log"
DEADLINE="${SWEEP_DEADLINE:-07:15}"

while ! grep -q "r5 sweep done" "$LOG" 2>/dev/null; do sleep 20; done

mins_left() {
  local now dl
  now=$(date +%s)
  dl=$(date -d "today $DEADLINE" +%s 2>/dev/null || echo 0)
  echo $(( (dl - now) / 60 ))
}

if [ "$(mins_left)" -lt 10 ]; then
  echo "{\"mode\": \"hier_oracle_fixed\", \"result\": \"skipped_deadline\"}" >> "$OUT"
  exit 0
fi
echo "=== hier_oracle_fixed ($(date +%H:%M:%S))" >&2
line=$(timeout 1200 python bench.py --spec --spec-type hier --oracle-accept \
       --prompt-len 2048 2>/dev/null | tail -1)
if [ -n "$line" ]; then
  echo "{\"mode\": \"hier_oracle_fixed\", \"result\": $line}" >> "$OUT"
else
  echo "{\"mode\": \"hier_oracle_fixed\", \"result\": null}" >> "$OUT"
fi
echo "after_r5 done ($(date +%H:%M:%S))" >&2
