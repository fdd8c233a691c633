#!/usr/bin/env bash
# Round-3 phase C, one seed per invocation (full-scale Styled-MNIST protocol,
# ~2.3h each): round3_phaseC.sh SEED [extra flags...]
# Seed 3 runs the first-class on-device styling path in production.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p .runs
seed="$1"; shift
extra=("$@")
[ "$seed" = 3 ] && extra+=(--style_on_device)
echo "=== styledmnist_full_s$seed start $(date -u +%H:%M:%S) ==="
if python -m clearvae_tpu.experiments.styledmnist_downstream \
     --epochs 41 --seed "$seed" --epochs_per_scan 4 "${extra[@]}" \
     >".runs/styledmnist_full_s$seed.log" 2>&1; then
  echo "=== styledmnist_full_s$seed OK $(date -u +%H:%M:%S) ==="
else
  echo "=== styledmnist_full_s$seed FAILED rc=$? ==="
fi
