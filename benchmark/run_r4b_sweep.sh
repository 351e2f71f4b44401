#!/bin/bash
# Round-4 sweep B: measure the stage-1 bf16 + chunked-topk prefill cuts and
# the tree-decode bk fix at the reference's operating point (96K realistic),
# then generate the distillation corpus (VERDICT r4 tasks 1, 3, 4).
# One TPU client at a time (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmark/results/r4b_sweep.jsonl}"
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

# headline-regime rows first (decode value + labeled prefill in one run)
run sparse96k_spec_real python bench.py --sparse --spec --realistic \
    --prompt-len 98304
run sparse96k_spec_real_qdh_seg16 python bench.py --sparse --spec \
    --realistic --prompt-len 98304 --quant-draft-head --spec-segment 16
run sparse32k_spec_real python bench.py --sparse --spec --realistic \
    --prompt-len 32768
run sparse96k_real python bench.py --sparse --realistic --prompt-len 98304
run sparse32k_real python bench.py --sparse --realistic --prompt-len 32768

# wait (up to 40 min) for the layer_out_scale sweep caches, then generate
# the distillation corpus (greedy streams + teacher-forced hiddens)
for i in $(seq 240); do
  n=$(ls .realistic_cache/real_*.npz 2>/dev/null | wc -l)
  [ "$n" -ge 3 ] && break
  sleep 10
done
echo "=== distill corpus ($(date +%H:%M:%S))" >&2
timeout 3000 python tools/gen_distill_corpus.py --scales 0.05,0.2,0.5 \
    >> benchmark/results/r4b_corpus.log 2>&1
echo "{\"mode\": \"distill_corpus\", \"result\": \"rc=$?\"}" >> "$OUT"
echo "r4b sweep done ($(date +%H:%M:%S))" >&2
