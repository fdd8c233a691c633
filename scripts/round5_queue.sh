#!/usr/bin/env bash
# Round-5 TPU queue — CheXpert discriminative-generator campaign + the
# round-4 leftovers, priority-ordered so deadline skipping drops the least
# important tail first:
#   1. CheXpert 11-seed campaign, part 1 (seeds 3 5 7 11 13 17) — the
#      redesigned generator (synth64.synthetic_chexpert64, torch-proxy +
#      TPU calibrated; VERDICT r4 item 5). n=4096 (protocol size), 41
#      epochs, vae_lr 1e-4 (the BASELINE.md optimization-state fix),
#      epochs_per_scan 4. Results: expr_output/chexpert/classification/.
#   2. perf-mode A/B twins on the new protocol (seed 900, k=1..3), default
#      then --perf_mode back-to-back on this same machine (twin rule);
#      wall-clock from this log (VERDICT r4 item 4 / queue-19 tail).
#   3. bench.py round-5 row (adds the Conv1MXUPack A/B configs).
#   4. campaign part 2 (seeds 19 23 29 31 42).
#   5. third-seed CelebA MIG grid (s303, the queue-19 leftover; resumable).
# All sequential: every main holds the single-TPU-process flock.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p .runs expr_output/chexpert/ab_perfmode

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

chex() {
  run "chex5_s$1" python -m clearvae_tpu.experiments.chexpert_downstream \
    --epochs 41 --n_synthetic 4096 --k_max 3 --seed "$1" \
    --vae_lr 1e-4 --epochs_per_scan 4
}

for seed in 3 5 7 11 13 17; do chex "$seed"; done

AB=expr_output/chexpert/ab_perfmode
run chex5_ab_default python -m clearvae_tpu.experiments.chexpert_downstream \
  --epochs 41 --n_synthetic 4096 --k_max 3 --seed 900 \
  --vae_lr 1e-4 --epochs_per_scan 4 --out "$AB"
run chex5_ab_perf python -m clearvae_tpu.experiments.chexpert_downstream \
  --epochs 41 --n_synthetic 4096 --k_max 3 --seed 900 \
  --vae_lr 1e-4 --epochs_per_scan 4 --perf_mode --out "$AB"

run bench_r5 python bench.py

for seed in 19 23 29 31 42; do chex "$seed"; done

run mig_celeba_s303 python -m clearvae_tpu.experiments.mig_expr_celeba \
  --seed 303 --epochs 16 --n_synthetic 4096 \
  --betas 0.03125 0.0625 0.125 0.25 0.5 1 2 4 8

echo "=== round-5 queue done $(date -u +%H:%M:%S) ==="
