#!/usr/bin/env bash
# Round-4 TPU queue, part 13 — replaces queue12's remaining jobs with a
# deadline-hedged order (queue12's supervisor was killed between jobs; its
# running chexpert_s5 child survives and is waited on here — exactly ONE
# queue chains that pid, per the CLAUDE.md two-supervisor hazard).
# Order: finish CheXpert to 11 seeds (VERDICT r3 #1), first half of the
# Camelyon17 extension (#3), the perf-mode parity A/B (#6 — all-or-nothing
# value, so it must not sit behind 8 camelyon jobs), second camelyon half,
# then the second-seed CelebA MIG grid.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p .runs

DEADLINE_EPOCH="${DEADLINE_EPOCH:?set DEADLINE_EPOCH (epoch seconds)}"
WAIT_PID="${WAIT_PID:-}"

if [[ -n "$WAIT_PID" ]] && kill -0 "$WAIT_PID" 2>/dev/null; then
  echo "=== waiting on surviving chexpert_s5 (pid $WAIT_PID) ==="
  tail --pid="$WAIT_PID" -f /dev/null
  echo "=== pid $WAIT_PID finished $(date -u +%H:%M:%S) ==="
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

for seed in 17 29; do
  run chexpert_s$seed python -m clearvae_tpu.experiments.chexpert_downstream \
    --seed $seed --n_synthetic 4096
done

for seed in 41 43 47 53; do
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

echo "=== round-4 queue part 13 done $(date -u +%H:%M:%S) ==="
