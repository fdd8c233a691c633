#!/usr/bin/env bash
# Round-3 phase D: push Styled-MNIST repeats toward the reference's 11
# (VERDICT r2 item 3).  Resumes seed 3 at the missing k=5 cell, then runs
# three more full-protocol seeds.  Strictly ONE TPU process at a time.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p .runs

run() {
  local name="$1"; shift
  echo "=== $name start $(date -u +%H:%M:%S): $* ==="
  local t0=$SECONDS
  if python -m clearvae_tpu.experiments.styledmnist_downstream \
       --epochs 41 --epochs_per_scan 4 "$@" >".runs/$name.log" 2>&1; then
    echo "=== $name OK ($((SECONDS - t0))s) ==="
  else
    echo "=== $name FAILED rc=$? ($((SECONDS - t0))s) — see .runs/$name.log ==="
  fi
}

# seed 3 ran with on-device styling; finish its k=5 cell the same way
run styledmnist_s3_k5 --seed 3 --style_on_device --k_min 5 --k_max 5

for seed in 11 23 31; do
  run styledmnist_full_s$seed --seed $seed
done

echo "=== phase D done $(date -u +%H:%M:%S) ==="
