#!/bin/bash
# Round-6 queue (FIRST chip actions of the next session; r5's rows all
# died to cold-container compiles — see PERF.md r5 postmortem).
# Priority order:
#  1. prefill lever A/B (VERDICT r4 task 1 — prefill_pair fine sub-tiles,
#     bf16 stage-1, milder gs/bt; the one reference headline still
#     unmatched at 2712 vs 6530 tok/s),
#  2. headline at the flipped TUNE defaults (decode_pair=1 + tree_pair=2
#     composition, expected >= 110),
#  3. oracle-union decode bracket (task 4),
#  4. hier --oracle-accept ceiling with the fixed warmup harness (task 5).
# STRICTLY SEQUENTIAL — never a second axon client; probe with a tiny
# matmul first if the tunnel state is unknown.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmark/results/r6_sweep.jsonl}"
DEADLINE="${SWEEP_DEADLINE:-}"
mkdir -p "$(dirname "$OUT")"

mins_left() {
  [ -z "$DEADLINE" ] && { echo 999; return; }
  local now dl
  now=$(date +%s)
  dl=$(date -d "today $DEADLINE" +%s 2>/dev/null || echo 0)
  echo $(( (dl - now) / 60 ))
}

run() {
  local name="$1" margin="$2"; shift 2
  if [ "$(mins_left)" -lt "$margin" ]; then
    echo "{\"mode\": \"$name\", \"result\": \"skipped_deadline\"}" >> "$OUT"
    echo "$name -> SKIPPED (deadline)" >&2
    return
  fi
  echo "=== $name: $* ($(date +%H:%M:%S))" >&2
  local line
  # >= 3000 s: cold remote compiles alone exceeded 1500 s in r5
  line=$(timeout 3000 "$@" 2>/dev/null | tail -1)
  if [ -n "$line" ]; then
    echo "{\"mode\": \"$name\", \"result\": $line}" >> "$OUT"
    echo "$name -> $line" >&2
  else
    echo "{\"mode\": \"$name\", \"result\": null}" >> "$OUT"
    echo "$name -> FAILED/TIMEOUT" >&2
  fi
}

echo "=== prefill lever A/B ($(date +%H:%M:%S))" >&2
if [ "$(mins_left)" -ge 50 ]; then
  CPMCU_REALISTIC=1 timeout 3000 python benchmark/exp_r4g_prefill_ab.py \
      > benchmark/results/r6_prefill_ab.log 2>&1
  echo "{\"mode\": \"prefill_ab\", \"result\": \"rc=$?\"}" >> "$OUT"
else
  echo "{\"mode\": \"prefill_ab\", \"result\": \"skipped_deadline\"}" >> "$OUT"
fi

run headline_defaults 45 python bench.py
run oracle_union_96k 30 python bench.py --oracle-union
run hier_oracle_fixed 20 python bench.py --spec --spec-type hier \
    --oracle-accept --prompt-len 2048
echo "r6 sweep done ($(date +%H:%M:%S))" >&2
