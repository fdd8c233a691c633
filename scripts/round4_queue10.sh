#!/usr/bin/env bash
# Round-4 TPU queue, part 10 — chained after part 9 (pass its pid as $1).
# Refresh the CelebA demo artifacts: the committed swap/interp grids were
# rendered with the round-2 stripe generator; get_celeba now routes to the
# round-3 synth64 face generator, so re-running demo.py replaces them with
# grids on the de-saturated protocol the quantitative evidence uses.
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

run demo_celeba_v2 python -m clearvae_tpu.experiments.demo \
  --dataset celeba --model clearvae --epochs 41 --n_total 8192 \
  --out expr_output/celeba

echo "=== round-4 queue part 10 done $(date -u +%H:%M:%S) ==="
