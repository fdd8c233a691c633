#!/usr/bin/env bash
# Round-2 evidence campaign, phase 2 (after round2_runs.sh):
# - CheXpert downstream at scale (new-capability evidence)
# - CelebA MIG/ELBO beta sweep
# - fused-loss A/B benchmark
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p .runs

run() {
  local name="$1"; shift
  echo "=== $name: $* ==="
  local t0=$SECONDS
  if python "$@" >".runs/$name.log" 2>&1; then
    echo "=== $name OK ($((SECONDS - t0))s) ==="
  else
    echo "=== $name FAILED rc=$? ($((SECONDS - t0))s) — see .runs/$name.log ==="
  fi
}

run chexpert -m clearvae_tpu.experiments.chexpert_downstream \
    --epochs 41 --n_synthetic 4096 --k_max 3 --seed 42
run mig_sweep_celeba -m clearvae_tpu.experiments.mig_expr_celeba \
    --seed 101 --epochs 16 --n_synthetic 4096 \
    --betas 0.03125 0.125 0.5 2 8
run bench_fused scripts/bench_fused_loss.py
echo "=== phase 2 done ==="
