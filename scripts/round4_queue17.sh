#!/usr/bin/env bash
# Round-4 TPU queue, part 17 — fresh machine after a VM restart (queue16's
# jobs never ran; .runs/ and the persistent XLA cache were lost).
# Order:
# 1. the two quick gather A/Bs (the permute-slice measurement, VERDICT r3
#    batch-materialization thread; also warms the compile cache),
# 2. the celeba perf-mode A/B twins back-to-back into a fresh dir
#    (VERDICT r3 #6 — wall-clock comparability requires both twins on THIS
#    machine; the old k1/k2-only default-twin partials predate the restart),
# 3. bench.py snapshot (committed expr_output/perf row refresh),
# 4. Camelyon17 extension seeds 59/61/67/71 (16 seeds already resolve the
#    cell at p<0.05; these harden it toward the 20-seed target),
# 5. the resumable second-seed CelebA MIG grid with whatever time remains.
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

# Correctness-only job first: the background pytest suite (cold CPU
# compiles, fresh VM) is still draining; timing-sensitive jobs follow it.
run camelyon17_s59 python -m clearvae_tpu.experiments.camelyon17_downstream \
  --epochs 7 --cnn_epochs 6 --n_synthetic 8192 --k 1 --seed 59

run gather_ab_b2048 python scripts/bench_flat_gather.py --batch 2048 --steps 64
run gather_ab_b512 python scripts/bench_flat_gather.py --batch 512 --steps 64

AB_DIR=expr_output/celeba/ab_perfmode
run celeba_ab_default python -m clearvae_tpu.experiments.celeba_downstream \
  --epochs 41 --n_synthetic 8192 --k_max 3 --seed 900 \
  --vae_lr 1e-4 --epochs_per_scan 4 --out "$AB_DIR"
run celeba_ab_perf python -m clearvae_tpu.experiments.celeba_downstream \
  --epochs 41 --n_synthetic 8192 --k_max 3 --seed 900 \
  --vae_lr 1e-4 --epochs_per_scan 4 --perf_mode --out "$AB_DIR"

run bench_snapshot python bench.py

for seed in 61 67 71; do
  run camelyon17_s$seed python -m clearvae_tpu.experiments.camelyon17_downstream \
    --epochs 7 --cnn_epochs 6 --n_synthetic 8192 --k 1 --seed $seed
done

run mig_celeba_s202 python -m clearvae_tpu.experiments.mig_expr_celeba \
  --seed 202 --epochs 16 --n_synthetic 4096 \
  --betas 0.03125 0.0625 0.125 0.25 0.5 1 2 4 8

echo "=== round-4 queue part 17 done $(date -u +%H:%M:%S) ==="
