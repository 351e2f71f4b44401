#!/bin/bash
# Round-4 sweep D: (1) A/B the paired sub-tile sparse kernel at the
# reference operating point (96K realistic, decode + prefill), (2) fit +
# calibrate the distilled drafter (accept becomes an output; VERDICT r4
# tasks 1-3), (3) warm the no-flag headline config for the driver bench.
# One TPU client at a time (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmark/results/r4d_sweep.jsonl}"
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
  line=$(timeout 1600 "$@" 2>/dev/null | tail -1)
  if [ -n "$line" ]; then
    echo "{\"mode\": \"$name\", \"result\": $line}" >> "$OUT"
    echo "$name -> $line" >&2
  else
    echo "{\"mode\": \"$name\", \"result\": null}" >> "$OUT"
    echo "$name -> FAILED/TIMEOUT" >&2
  fi
}

# wait (up to 60 min) for the distillation corpus run to release the TPU
for i in $(seq 360); do
  [ -f benchmark/.distill/corpus_s0.5.npz ] && break
  sleep 10
done
sleep 30

# paired-kernel A/B at the reference operating point (noise drafter both
# sides — calibration lands later so the accept source stays consistent)
run sparse96k_spec_real_pair4 python bench.py --sparse --spec --realistic \
    --prompt-len 98304
run sparse96k_spec_real_pair1 python bench.py --sparse --spec --realistic \
    --prompt-len 98304 --sparse-pair 1
run sparse96k_real_pair4 python bench.py --sparse --realistic \
    --prompt-len 98304
run sparse96k_real_prefpair4 python bench.py --sparse --realistic \
    --prompt-len 98304 --prefill-pair 4
run sparse32k_spec_real_pair4 python bench.py --sparse --spec --realistic \
    --prompt-len 32768

# distill fit on the full corpus (CPU), then accept calibration (TPU rows)
echo "=== distill fit ($(date +%H:%M:%S))" >&2
timeout 3000 python tools/distill_drafter.py \
    >> benchmark/results/r4d_distill_fit.log 2>&1
echo "{\"mode\": \"distill_fit\", \"result\": \"rc=$?\"}" >> "$OUT"
echo "=== calibrate accept ($(date +%H:%M:%S))" >&2
timeout 5400 python tools/calibrate_accept.py \
    >> benchmark/results/r4d_calibration.log 2>&1
echo "{\"mode\": \"calibrate\", \"result\": \"rc=$?\"}" >> "$OUT"

# the driver's exact no-flag headline (also warms the 96K compile cache for
# the round-end bench) — now with the calibrated distilled drafter
run headline python bench.py
echo "r4d sweep done ($(date +%H:%M:%S))" >&2
