#!/bin/bash
# Round-5 sweep: (1) validate the flipped TUNE defaults compose at the
# no-flag headline operating point (decode_pair=1 112.43 and tree_pair=2
# 109.52 were measured separately vs the 106.36 default in r4g), then
# (2) the repaired realistic-96K prefill lever A/B (prefill_pair fine
# sub-tiles + milder gs/bt; the r4g gs4/bt512+ rows crashed the remote
# compile helper), then (3) the oracle-union decode bracket (VERDICT r4
# task 4) if time remains.
#
# STRICTLY SEQUENTIAL — never a second axon client. Rows skip near the
# deadline so the driver's round-end bench gets the chip.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmark/results/r5_sweep.jsonl}"
DEADLINE="${SWEEP_DEADLINE:-}"   # e.g. "07:20" — skip rows within margin
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
  # >= 3000 s: on a FRESH container every sparse program is a cold remote
  # compile — the r5 headline run was still compiling at 25 min and the
  # 94K A/B context prefill alone exceeded 25 min (r4g's took 238 s on
  # the same-day warm compile helper). 1500 s killed both r5 rows.
  line=$(timeout 3000 "$@" 2>/dev/null | tail -1)
  if [ -n "$line" ]; then
    echo "{\"mode\": \"$name\", \"result\": $line}" >> "$OUT"
    echo "$name -> $line" >&2
  else
    echo "{\"mode\": \"$name\", \"result\": null}" >> "$OUT"
    echo "$name -> FAILED/TIMEOUT" >&2
  fi
}

# 1. headline at the new defaults (no flags — this is what the driver runs)
run headline_r5_defaults 14 python bench.py

# 2. repaired prefill lever A/B (one 94K realistic prefill, ~7 variants
# re-traced in-process; each failed variant dies in ~15 s)
if [ "$(mins_left)" -ge 12 ]; then
  echo "=== prefill lever A/B r5 ($(date +%H:%M:%S))" >&2
  CPMCU_REALISTIC=1 timeout 1500 python benchmark/exp_r4g_prefill_ab.py \
      > benchmark/results/r5_prefill_ab.log 2>&1
  echo "{\"mode\": \"prefill_ab_r5\", \"result\": \"rc=$?\"}" >> "$OUT"
else
  echo "{\"mode\": \"prefill_ab_r5\", \"result\": \"skipped_deadline\"}" >> "$OUT"
fi

# 3. oracle-union decode bracket (bounds selection-union vs kernel
# overhead in the 5.3 ms/round sparse_flash share)
run oracle_union_96k 14 python bench.py --oracle-union

echo "r5 sweep done ($(date +%H:%M:%S))" >&2
