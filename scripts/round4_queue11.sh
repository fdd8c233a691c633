#!/usr/bin/env bash
# Round-4 TPU queue, part 11 — fresh machine (cold XLA cache), no chaining.
# Goal: push the 64px protocols from 7 seeds toward the reference's 11-rep
# protocol (expr_run/run_styledmnist_downstream_expr.ps1 uses 11 reps).
# Value order: alternate CelebA/PACS seeds (13, 17, 29, 5) so a deadline cut
# leaves both protocols at the same seed count, then CheXpert seeds, then a
# second-seed CelebA MIG grid. All runners persist incrementally per model,
# so a timeout loses at most one model's training.
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

for seed in 13 17 29 5; do
  run celeba_s$seed python -m clearvae_tpu.experiments.celeba_downstream \
    --epochs 41 --n_synthetic 8192 --k_max 3 --seed $seed \
    --vae_lr 1e-4 --epochs_per_scan 4
  run pacs_s$seed python -m clearvae_tpu.experiments.pacs_downstream \
    --epochs 41 --n_synthetic 8192 --k_max 3 --seed $seed \
    --vae_lr 1e-4 --epochs_per_scan 4
done

# CheXpert toward 11 seeds (MUST use --n_synthetic 4096 to match the
# earlier seeds' dataset size — see CLAUDE.md; other args at the same
# defaults the existing 7 seeds used).
for seed in 13 17 29 5; do
  run chexpert_s$seed python -m clearvae_tpu.experiments.chexpert_downstream \
    --seed $seed --n_synthetic 4096
done

# Second-seed CelebA MIG grid (reference run_mig_expr_celeba.py's 9 betas),
# same protocol as the committed seed-101 grid.
run mig_celeba_s202 python -m clearvae_tpu.experiments.mig_expr_celeba \
  --seed 202 --epochs 16 --n_synthetic 4096 \
  --betas 0.03125 0.0625 0.125 0.25 0.5 1 2 4 8

echo "=== round-4 queue part 11 done $(date -u +%H:%M:%S) ==="
