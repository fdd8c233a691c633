#!/usr/bin/env bash
# Round-4 TPU queue, part 9 — chained after part 8 (pass its pid as $1).
# Re-measure the trace/gather perf evidence with the device-get-synced
# scripts (the pre-fix runs ended windows/trace regions with
# block_until_ready, which can return early on axon): profiler traces at
# the two headline configs, the in-situ gather layout A/B, and the
# standalone gather microbench (kept only as a falsifiability check —
# CLAUDE.md documents standalone memory microbenches as unreliable here).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p .runs expr_output/perf

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

# configs match the committed evidence exactly (round3_perf.sh)
run trace_f32_b128_v2 python scripts/analyze_trace.py \
  --batch 128 --steps 512 --trace-dir /tmp/tr_f32_b128
run trace_bf16_b2048_v2 python scripts/analyze_trace.py \
  --batch 2048 --steps 64 --dtype bf16 --trace-dir /tmp/tr_bf16_b2048
run flat_gather_v2 python scripts/bench_flat_gather.py
run gather_micro_v2 python scripts/bench_gather.py --batch 2048

echo "=== round-4 queue part 9 done $(date -u +%H:%M:%S) ==="
