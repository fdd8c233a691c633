#!/usr/bin/env bash
# Round-4 TPU queue, part 5 — chained after part 4 (pass its pid as $1).
# Fills leftover TPU time, cheapest-first so late jobs skip gracefully at
# the deadline: Camelyon17 -> 8 seeds, CheXpert -> 7 seeds, CelebA/PACS ->
# 6 seeds, then a second seed of the MIG/ELBO sweep at the headline
# tau=0.1 (the reference sweep is single-seed s101; a second seed shows
# the beta-grid shape is not a seed artifact).
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

for seed in 5 17; do
  run camelyon17_s$seed python -m clearvae_tpu.experiments.camelyon17_downstream \
    --epochs 7 --cnn_epochs 6 --n_synthetic 8192 --k 1 --seed $seed
done
for seed in 3 31; do
  run chexpert_s$seed python -m clearvae_tpu.experiments.chexpert_downstream \
    --seed $seed --n_synthetic 4096
done
for seed in 31; do
  run celeba_s$seed python -m clearvae_tpu.experiments.celeba_downstream \
    --epochs 41 --n_synthetic 8192 --k_max 3 --seed $seed \
    --vae_lr 1e-4 --epochs_per_scan 4
  run pacs_s$seed python -m clearvae_tpu.experiments.pacs_downstream \
    --epochs 41 --n_synthetic 8192 --k_max 3 --seed $seed \
    --vae_lr 1e-4 --epochs_per_scan 4
done
run mig_tau01_s202 python -m clearvae_tpu.experiments.mig_expr \
  --temperature 0.1 --seed 202

echo "=== round-4 queue part 5 done $(date -u +%H:%M:%S) ==="
