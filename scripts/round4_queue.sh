#!/usr/bin/env bash
# Round-4 TPU campaign queue (prepared at the end of round 3).
# State at end of round 3 (see CLAUDE.md "Evidence campaigns"):
#   - styled-MNIST full protocol: 9 seeds (3/5/7/11/13/19/23/31/42);
#     reference protocol is 11 reps -> seeds 17/29 close it out.
#   - MIG tau sweep complete {0.1, 0.3, 1.0}; CelebA 9-beta grid complete.
#   - CheXpert 3 seeds at n_synthetic 4096 (keep 4096 for any new seed).
#   - 64px OOD: CelebA/PACS 3 seeds, Camelyon17 6 seeds.
# Strictly ONE TPU process at a time. Set DEADLINE_EPOCH to ~40 min before
# the round end so the driver's bench.py gets a free chip; each job's
# timeout is clamped to the remaining budget.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p .runs

DEADLINE_EPOCH="${DEADLINE_EPOCH:?set DEADLINE_EPOCH (epoch seconds)}"

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

# 1. complete the reference's 11-rep styled-MNIST protocol
for seed in 17 29; do
  run styledmnist_full_s$seed \
    python -m clearvae_tpu.experiments.styledmnist_downstream \
    --epochs 41 --epochs_per_scan 4 --seed $seed
done

# 2. widen 64px multi-seed coverage (CelebA/PACS 3 -> 5 seeds).
# NOTE: superseded by round4_queue3.sh, which also fixes a scale mismatch
# this file had: new seeds MUST run at --n_synthetic 8192 --epochs 41
# (the committed seeds' scale, round3_runs.sh), not the runner's 2048
# default, or the pooled mean±std tables mix dataset sizes.
for seed in 11 23; do
  run celeba_s$seed python -m clearvae_tpu.experiments.celeba_downstream \
    --epochs 41 --n_synthetic 8192 --k_max 3 --seed $seed \
    --vae_lr 1e-4 --epochs_per_scan 4
  run pacs_s$seed python -m clearvae_tpu.experiments.pacs_downstream \
    --epochs 41 --n_synthetic 8192 --k_max 3 --seed $seed \
    --vae_lr 1e-4 --epochs_per_scan 4
done

echo "=== round-4 queue done $(date -u +%H:%M:%S) ==="
