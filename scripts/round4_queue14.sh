#!/usr/bin/env bash
# Round-4 TPU queue, part 14 — resumes queue13 after the builder session
# restart killed its supervisor mid camelyon17_s43 (the result JSON is
# incremental, so re-running seed 43 skips its 4 finished models).
# Remaining VERDICT r3 work, value order: finish the Camelyon17 extension
# to 20 seeds (#3), the perf-mode parity A/B (#6 — all-or-nothing value,
# placed after the first camelyon half so a deadline hit still leaves
# camelyon at 17+ seeds), then the second-seed CelebA MIG grid.
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

for seed in 43 47 53; do
  run camelyon17_s$seed python -m clearvae_tpu.experiments.camelyon17_downstream \
    --epochs 7 --cnn_epochs 6 --n_synthetic 8192 --k 1 --seed $seed
done

# perf-mode parity A/B (VERDICT r3 item 6): same seed/protocol with and
# without --perf_mode, back-to-back on this machine so the wall-clock delta
# is meaningful. Results: celeba-k*-900.json vs celeba-k*-900-perf.json.
run celeba_ab_default python -m clearvae_tpu.experiments.celeba_downstream \
  --epochs 41 --n_synthetic 8192 --k_max 3 --seed 900 \
  --vae_lr 1e-4 --epochs_per_scan 4
run celeba_ab_perf python -m clearvae_tpu.experiments.celeba_downstream \
  --epochs 41 --n_synthetic 8192 --k_max 3 --seed 900 \
  --vae_lr 1e-4 --epochs_per_scan 4 --perf_mode

for seed in 59 61 67 71; do
  run camelyon17_s$seed python -m clearvae_tpu.experiments.camelyon17_downstream \
    --epochs 7 --cnn_epochs 6 --n_synthetic 8192 --k 1 --seed $seed
done

run mig_celeba_s202 python -m clearvae_tpu.experiments.mig_expr_celeba \
  --seed 202 --epochs 16 --n_synthetic 4096 \
  --betas 0.03125 0.0625 0.125 0.25 0.5 1 2 4 8

echo "=== round-4 queue part 14 done $(date -u +%H:%M:%S) ==="
