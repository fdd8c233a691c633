#!/usr/bin/env bash
# Round-3 phase F: CheXpert seeds 7/19 at the SAME scale as the committed
# seed-42 run (--n_synthetic 4096, k=1..3, 41 epochs — round2_runs_phase2.sh).
# Phase E's queued chexpert entries used the 2048 default, which would have
# pooled mismatched dataset sizes into one mean±std table; phase E is
# stopped after its styled-MNIST seeds instead and this takes over the queue.
#
# Usage: round3_phaseF.sh [pid-to-wait-for]
#   The pid is the in-flight TPU job (styled-MNIST s13); strictly ONE TPU
#   process at a time. Each job's timeout is clamped so it ends >=5 min
#   before DEADLINE_EPOCH (the driver's end-of-round bench.py needs the
#   chip); the runner's per-model resume makes a clamped partial run
#   resumable next round.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p .runs

DEADLINE_EPOCH="${DEADLINE_EPOCH:-1787035200}"   # ~06:40 UTC

WAIT_PID="${1:-}"
if [[ -n "$WAIT_PID" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

run() {
  local name="$1"; shift
  local now tmo
  now=$(date +%s)
  tmo=$(( DEADLINE_EPOCH - now - 300 ))
  if (( tmo < 900 )); then
    echo "=== $name SKIPPED (<20 min left before deadline) ==="; return
  fi
  echo "=== $name start $(date -u +%H:%M:%S) (timeout ${tmo}s): $* ==="
  local t0=$SECONDS
  if timeout "$tmo" "$@" >".runs/$name.log" 2>&1; then
    echo "=== $name OK ($((SECONDS - t0))s) ==="
  else
    echo "=== $name rc=$? ($((SECONDS - t0))s) — see .runs/$name.log ==="
  fi
}

for seed in 7 19; do
  run chexpert_s$seed python -m clearvae_tpu.experiments.chexpert_downstream \
    --seed $seed --n_synthetic 4096
done

echo "=== phase F done $(date -u +%H:%M:%S) ==="
