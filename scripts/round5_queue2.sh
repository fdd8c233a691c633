#!/usr/bin/env bash
# Round-5 TPU queue, part 2 — replaces round5_queue.sh (supervisor killed
# between jobs per the CLAUDE.md protocol; the running seed-5 child
# survives and is waited on here). Change vs part 1: the per-process tunnel
# stall grew to ~12-15 min, so the remaining campaign seeds run in ONE
# process via scripts/chex_campaign.py instead of one process per seed.
# Order: wait seed 5 → seeds 3 7 11 13 17 (one process) → perf-mode A/B
# twins → bench_r5 → seeds 19 23 29 31 42 (one process) → CelebA MIG s303.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p .runs expr_output/chexpert/ab_perfmode

DEADLINE_EPOCH="${DEADLINE_EPOCH:?set DEADLINE_EPOCH (epoch seconds)}"
WAIT_PID="${WAIT_PID:-}"

if [[ -n "$WAIT_PID" ]]; then
  echo "=== waiting on surviving chex5_s5 (pid $WAIT_PID) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  echo "=== chex5_s5 finished $(date -u +%H:%M:%S) ==="
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

run chex5_batchA python scripts/chex_campaign.py 3 7 11 13 17

AB=expr_output/chexpert/ab_perfmode
run chex5_ab_default python -m clearvae_tpu.experiments.chexpert_downstream \
  --epochs 41 --n_synthetic 4096 --k_max 3 --seed 900 \
  --vae_lr 1e-4 --epochs_per_scan 4 --out "$AB"
run chex5_ab_perf python -m clearvae_tpu.experiments.chexpert_downstream \
  --epochs 41 --n_synthetic 4096 --k_max 3 --seed 900 \
  --vae_lr 1e-4 --epochs_per_scan 4 --perf_mode --out "$AB"

run bench_r5 python bench.py

run chex5_batchB python scripts/chex_campaign.py 19 23 29 31 42

run mig_celeba_s303 python -m clearvae_tpu.experiments.mig_expr_celeba \
  --seed 303 --epochs 16 --n_synthetic 4096 \
  --betas 0.03125 0.0625 0.125 0.25 0.5 1 2 4 8

echo "=== round-5 queue part 2 done $(date -u +%H:%M:%S) ==="
