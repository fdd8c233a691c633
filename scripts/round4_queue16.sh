#!/usr/bin/env bash
# Round-4 TPU queue, part 16 — REPLACES queue13's remaining jobs and
# queue15 (both supervisors killed between jobs; the running
# celeba_ab_default child survives and is waited on here — exactly ONE
# queue chains that pid, per the CLAUDE.md two-supervisor hazard).
# Reordered so everything high-value lands before the ~04:48Z deadline:
# 1. celeba_ab_perf (must follow its default twin back-to-back for the
#    wall-clock comparison to be meaningful),
# 2. the permute-slice gather A/B (quick; the one new measurement),
# 3. Camelyon17 seeds 59/61/67/71 (completes the 20-seed extension,
#    VERDICT r3 #3),
# 4. second-seed CelebA MIG grid (resumable; runs with whatever time is
#    left).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p .runs

DEADLINE_EPOCH="${DEADLINE_EPOCH:?set DEADLINE_EPOCH (epoch seconds)}"
WAIT_PID="${WAIT_PID:-}"

if [[ -n "$WAIT_PID" ]] && kill -0 "$WAIT_PID" 2>/dev/null; then
  echo "=== waiting on surviving celeba_ab_default (pid $WAIT_PID) ==="
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

run celeba_ab_perf python -m clearvae_tpu.experiments.celeba_downstream \
  --epochs 41 --n_synthetic 8192 --k_max 3 --seed 900 \
  --vae_lr 1e-4 --epochs_per_scan 4 --perf_mode

run gather_ab_b2048 python scripts/bench_flat_gather.py --batch 2048 --steps 64
run gather_ab_b512 python scripts/bench_flat_gather.py --batch 512 --steps 64

for seed in 59 61 67 71; do
  run camelyon17_s$seed python -m clearvae_tpu.experiments.camelyon17_downstream \
    --epochs 7 --cnn_epochs 6 --n_synthetic 8192 --k 1 --seed $seed
done

run mig_celeba_s202 python -m clearvae_tpu.experiments.mig_expr_celeba \
  --seed 202 --epochs 16 --n_synthetic 4096 \
  --betas 0.03125 0.0625 0.125 0.25 0.5 1 2 4 8

echo "=== round-4 queue part 16 done $(date -u +%H:%M:%S) ==="
