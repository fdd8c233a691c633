#!/usr/bin/env bash
# Round-4 TPU queue, part 12 — close VERDICT r3 items 1 (CheXpert -> 11
# seeds) and 3 (Camelyon17 -> 20 seeds to resolve the p=0.057 cell).
# Value order: finish the partial chexpert seed 13 first (resume machinery
# skips its 4 finished models), then the 3 missing chexpert seeds, then the
# 8 new camelyon17 seeds (cheapest protocol — k=1 only), then the
# second-seed CelebA MIG grid carried over from queue11.
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

# CheXpert to 11 seeds; MUST use --n_synthetic 4096 (now also the runner
# default) to match the committed seeds' dataset size.
for seed in 13 5 17 29; do
  run chexpert_s$seed python -m clearvae_tpu.experiments.chexpert_downstream \
    --seed $seed --n_synthetic 4096
done

# Camelyon17 12 -> 20 seeds (k=1), protocol identical to the committed runs.
for seed in 41 43 47 53 59 61 67 71; do
  run camelyon17_s$seed python -m clearvae_tpu.experiments.camelyon17_downstream \
    --epochs 7 --cnn_epochs 6 --n_synthetic 8192 --k 1 --seed $seed
done

# Second-seed CelebA MIG grid (reference run_mig_expr_celeba.py's 9 betas),
# same protocol as the committed seed-101 grid.
run mig_celeba_s202 python -m clearvae_tpu.experiments.mig_expr_celeba \
  --seed 202 --epochs 16 --n_synthetic 4096 \
  --betas 0.03125 0.0625 0.125 0.25 0.5 1 2 4 8

echo "=== round-4 queue part 12 done $(date -u +%H:%M:%S) ==="
