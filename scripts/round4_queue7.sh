#!/usr/bin/env bash
# Round-4 TPU queue, part 7 — chained after part 6 (pass its pid as $1).
# (1) bvae demo artifacts at notebook scale (completes the reference's
# tsne-img set, which includes bvae-* grids); (2) a second seed of the
# CelebA MIG/ELBO 9-beta grid (reference run_mig_expr_celeba.py is
# single-seed).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p .runs

DEADLINE_EPOCH="${DEADLINE_EPOCH:?set DEADLINE_EPOCH (epoch seconds)}"
WAIT_PID="${1:-}"
if [[ -n "$WAIT_PID" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

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

run demo_bvae python -m clearvae_tpu.experiments.demo \
  --dataset styled --model bvae --epochs 31 --n_total 20000 \
  --out expr_output/demo

run mig_sweep_celeba9_s202 python -m clearvae_tpu.experiments.mig_expr_celeba \
  --seed 202 --epochs 16 --n_synthetic 4096 \
  --betas 0.03125 0.0625 0.125 0.25 0.5 1 2 4 8

echo "=== round-4 queue part 7 done $(date -u +%H:%M:%S) ==="
