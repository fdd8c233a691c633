#!/usr/bin/env bash
# Round-4 TPU queue, part 19 — final evidence block for the round.
# Order (all sequential; experiment mains hold the TPU lockfile):
# 1. full pytest suite on the idle machine (correctness gate for the round),
# 2. CheXpert perf-mode A/B twins (seed 900, k=1..3, n_synthetic=4096):
#    hardens VERDICT r3 #6 beyond the CelebA-only twin pair — shows the
#    perf-mode (bf16 + fused heads) parity + wall-clock win is not
#    dataset-specific. Fresh dir so the twins are same-machine comparable.
# 3. third-seed CelebA MIG grid (s303, tau=0.1) — deepens the committed
#    2-seed grid; resumable (per-model/beta rows appended incrementally).
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

run pytest_full python -m pytest tests/ -q

AB_DIR=expr_output/chexpert/ab_perfmode
run chexpert_ab_default python -m clearvae_tpu.experiments.chexpert_downstream \
  --epochs 41 --n_synthetic 4096 --k_max 3 --seed 900 \
  --epochs_per_scan 4 --out "$AB_DIR"
run chexpert_ab_perf python -m clearvae_tpu.experiments.chexpert_downstream \
  --epochs 41 --n_synthetic 4096 --k_max 3 --seed 900 \
  --epochs_per_scan 4 --perf_mode --out "$AB_DIR"

run mig_celeba_s303 python -m clearvae_tpu.experiments.mig_expr_celeba \
  --seed 303 --epochs 16 --n_synthetic 4096 \
  --betas 0.03125 0.0625 0.125 0.25 0.5 1 2 4 8

echo "=== round-4 queue part 19 done $(date -u +%H:%M:%S) ==="
