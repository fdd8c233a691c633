#!/usr/bin/env bash
# Session supervisor: finish round-3 phase A (seed 19 camelyon + seed 42
# triple) and phase B, then STOP — the controlling session interposes the
# TPU perf work (VERDICT r2 item 2) before phase C.  Strictly one TPU
# process at a time (CLAUDE.md).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p .runs

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for in-flight job pid $WAIT_PID ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  # the old wrapper (20412) has a pending SIGTERM and dies with its child;
  # give it a moment and verify no TPU job is still up
  sleep 10
fi

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

# --- phase A remainder ---
run camelyon17_s19 -m clearvae_tpu.experiments.camelyon17_downstream \
    --epochs 7 --cnn_epochs 6 --n_synthetic 8192 --k 1 --seed 19
for seed in 42; do
  run celeba_s$seed -m clearvae_tpu.experiments.celeba_downstream \
      --epochs 41 --n_synthetic 8192 --k_max 3 --seed $seed \
      --vae_lr 1e-4 --epochs_per_scan 4
  run pacs_s$seed -m clearvae_tpu.experiments.pacs_downstream \
      --epochs 41 --n_synthetic 8192 --k_max 3 --seed $seed \
      --vae_lr 1e-4 --epochs_per_scan 4
  run camelyon17_s$seed -m clearvae_tpu.experiments.camelyon17_downstream \
      --epochs 7 --cnn_epochs 6 --n_synthetic 8192 --k 1 --seed $seed
done

# --- phase B ---
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

echo "=== phases A+B done — TPU free for perf work ==="
