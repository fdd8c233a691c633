#!/usr/bin/env bash
# Round-4 TPU queue, part 8 — chained after part 7 (pass its pid as $1).
# Clean re-measure of the scan-unroll A/B (the mid-round-3 logs from the
# dual-supervisor window are contaminated — see CLAUDE.md): unroll 1/2/4
# at the parity batch and the perf-mode batch, f32+bf16, plus unroll x
# fused_heads interaction. ONE TPU process, idle chip.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p .runs

DEADLINE_EPOCH="${DEADLINE_EPOCH:?set DEADLINE_EPOCH (epoch seconds)}"
WAIT_PID="${1:-}"
if [[ -n "$WAIT_PID" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

run() {
  local name="$1"; shift
  local now tmo
  now=$(date +%s)
  tmo=$(( DEADLINE_EPOCH - now - 300 ))
  if (( tmo < 600 )); then
    echo "=== $name SKIPPED (<10 min left before deadline) ==="; return
  fi
  echo "=== $name start $(date -u +%H:%M:%S) (timeout ${tmo}s): $* ==="
  local t0=$SECONDS
  if timeout "$tmo" "$@" >".runs/$name.log" 2>&1; then
    echo "=== $name OK ($((SECONDS - t0))s) ==="
  else
    echo "=== $name rc=$? ($((SECONDS - t0))s) — see .runs/$name.log ==="
  fi
}

for u in 1 2 4; do
  run clean_unroll_u$u python scripts/bench_scaling.py \
    --batches 128 512 --unroll $u
done
run clean_unroll_u2_fused python scripts/bench_scaling.py \
  --batches 128 512 --unroll 2 --fused_heads
run clean_unroll_u1_fused python scripts/bench_scaling.py \
  --batches 128 512 --unroll 1 --fused_heads

echo "=== round-4 queue part 8 done $(date -u +%H:%M:%S) ==="
