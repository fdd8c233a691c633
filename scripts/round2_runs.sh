#!/usr/bin/env bash
# Round-2 evidence campaign: the committed-run gaps from VERDICT r1
# (items 4, 5, 6, 9). Jobs run strictly sequentially — only ONE process may
# use the TPU at a time (CLAUDE.md). Logs under .runs/.
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

# item 4: first committed VAE64 runs (synthetic-fallback data, real TPU,
# reference hyperparameters; reduced dataset size)
run celeba -m clearvae_tpu.experiments.celeba_downstream \
    --epochs 41 --n_synthetic 4096 --k_max 3 --seed 42
run pacs -m clearvae_tpu.experiments.pacs_downstream \
    --epochs 41 --n_synthetic 4096 --k_max 3 --seed 42
run camelyon17 -m clearvae_tpu.experiments.camelyon17_downstream \
    --epochs 7 --cnn_epochs 6 --n_synthetic 4096 --k 1 --seed 42

# item 5: MIG/ELBO beta-sweep (reference full grid 1/32..8,
# run_mig_expr_mnist.py:28-29), reduced dataset
run mig_sweep -m clearvae_tpu.experiments.mig_expr \
    --seed 101 --epochs 16 --n_total 20000 \
    --betas 0.03125 0.0625 0.125 0.25 0.5 1 2 4 8

# item 6: multi-seed repeats (reduced scale; reference runs 11 reps)
for seed in 7 19 42; do
  run styledmnist_s$seed -m clearvae_tpu.experiments.styledmnist_downstream \
      --epochs 15 --n_train 20000 --n_test 5000 --k_max 5 --seed $seed \
      --out expr_output/styled-mnist/repeats
done

# item 9: Colored-MNIST + CelebA qualitative artifacts
run demo_colored -m clearvae_tpu.experiments.demo \
    --dataset colored --model clearvae --epochs 31 --n_total 20000 \
    --out expr_output/color-mnist
run demo_celeba -m clearvae_tpu.experiments.demo \
    --dataset celeba --model clearvae --epochs 31 --n_total 4096 \
    --z_dim 64 --beta 0.03125 --temperature 0.1 \
    --out expr_output/celeba
echo "=== campaign done ==="
