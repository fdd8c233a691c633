#!/usr/bin/env bash
# Round-4 TPU queue, part 6 — fresh queue on an idle chip (no chaining).
# Value order: (1) upgrade the seed-202 MIG replication from one beta to
# the full 9-beta reference grid at tau=0.1, (2) CelebA/PACS seed 3 ->
# 7 seeds each (matching CheXpert), (3) second-seed grids for the
# tau=0.3/1.0 sweeps, (4) two more Camelyon17 seeds (cheap, bimodal cell).
# The MIG CSV and downstream JSONs persist incrementally, so a deadline
# cut loses at most one (beta, model) cell / one model.
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

run mig_tau01_s202_full python -m clearvae_tpu.experiments.mig_expr \
  --temperature 0.1 --seed 202 \
  --betas 0.03125 0.0625 0.125 0.25 0.5 1 2 4 8

run celeba_s3 python -m clearvae_tpu.experiments.celeba_downstream \
  --epochs 41 --n_synthetic 8192 --k_max 3 --seed 3 \
  --vae_lr 1e-4 --epochs_per_scan 4
run pacs_s3 python -m clearvae_tpu.experiments.pacs_downstream \
  --epochs 41 --n_synthetic 8192 --k_max 3 --seed 3 \
  --vae_lr 1e-4 --epochs_per_scan 4

run mig_tau03_s202 python -m clearvae_tpu.experiments.mig_expr \
  --temperature 0.3 --seed 202 \
  --betas 0.03125 0.0625 0.125 0.25 0.5 1 2 4 8
run mig_tau10_s202 python -m clearvae_tpu.experiments.mig_expr \
  --temperature 1.0 --seed 202 \
  --betas 0.03125 0.0625 0.125 0.25 0.5 1 2 4 8

for seed in 29 37; do
  run camelyon17_s$seed python -m clearvae_tpu.experiments.camelyon17_downstream \
    --epochs 7 --cnn_epochs 6 --n_synthetic 8192 --k 1 --seed $seed
done

echo "=== round-4 queue part 6 done $(date -u +%H:%M:%S) ==="
