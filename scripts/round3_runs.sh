#!/usr/bin/env bash
# Round-3 evidence campaign (VERDICT r2 items 1, 3, 7, 8):
#   phase A: de-saturated 64x64 OOD protocols, 3 seeds each
#   phase B: demo artifacts for the remaining 3 models + full CelebA MIG grid
#   phase C: additional full-scale Styled-MNIST seeds (toward 11 reps)
# Jobs run strictly sequentially — only ONE process may use the TPU at a
# time (CLAUDE.md). Logs under .runs/. Usage: round3_runs.sh [A|B|C ...]
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

phase_A() {
  for seed in 7 19 42; do
    run celeba_s$seed -m clearvae_tpu.experiments.celeba_downstream \
        --epochs 41 --n_synthetic 8192 --k_max 3 --seed $seed \
        --vae_lr 1e-4 --epochs_per_scan 4
    run pacs_s$seed -m clearvae_tpu.experiments.pacs_downstream \
        --epochs 41 --n_synthetic 8192 --k_max 3 --seed $seed \
        --vae_lr 1e-4 --epochs_per_scan 4
    run camelyon17_s$seed -m clearvae_tpu.experiments.camelyon17_downstream \
        --epochs 7 --cnn_epochs 6 --n_synthetic 8192 --k 1 --seed $seed
  done
}

phase_B() {
  # rerun the seed-7 camelyon cell dropped with the old out-of-family stains
  run camelyon17_s7_rerun -m clearvae_tpu.experiments.camelyon17_downstream \
      --epochs 7 --cnn_epochs 6 --n_synthetic 8192 --k 1 --seed 7
  for model in cleartcvae clearmimvae gvae; do
    run demo_$model -m clearvae_tpu.experiments.demo \
        --dataset styled --model $model --epochs 31 --n_total 20000 \
        --out expr_output/demo
  done
  run mig_sweep_celeba9 -m clearvae_tpu.experiments.mig_expr_celeba \
      --seed 101 --epochs 16 --n_synthetic 4096 \
      --betas 0.03125 0.0625 0.125 0.25 0.5 1 2 4 8
}

phase_C() {
  # seed 3 runs the first-class on-device styling path in production
  # (numerics pinned equal to the materialized path, tests/test_parallel.py)
  run styledmnist_full_s3 \
      -m clearvae_tpu.experiments.styledmnist_downstream \
      --epochs 41 --seed 3 --epochs_per_scan 4 --style_on_device
  for seed in 11 23 31; do
    run styledmnist_full_s$seed \
        -m clearvae_tpu.experiments.styledmnist_downstream \
        --epochs 41 --seed $seed --epochs_per_scan 4
  done
}

for phase in "${@:-A B C}"; do
  "phase_$phase"
done
echo "=== round-3 campaign done ==="
