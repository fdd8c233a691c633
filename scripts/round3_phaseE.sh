#!/usr/bin/env bash
# Round-3 phase E: remaining TPU queue after phase D's styled-MNIST repeats.
#   1. lax.scan unroll A/B on the flagship bench config (is the 22.8% scan
#      overhead in the b128 trace recoverable?)
#   2. MIG/ELBO temperature sweep tau in {0.3, 1.0} — completes the
#      reference protocol (expr_run/run_elbo_mig_expr.ps1 runs 0.1/0.3/1.0;
#      tau=0.1 full 9-beta grid already committed)
#   3. extra styled-MNIST full-protocol seeds (7 -> 9)
#   4. CheXpert seeds 7/19 (matches the 3-seed coverage of the other 64px
#      pipelines)
# Strictly ONE TPU process at a time; DEADLINE guards the driver's
# end-of-round bench.py run from a TPU collision.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p .runs

DEADLINE_EPOCH="${DEADLINE_EPOCH:-1787035200}"   # ~06:40 UTC

# wait for phase D (pid in /tmp/phaseD.pid) to release the chip
if [[ -f /tmp/phaseD.pid ]]; then
  while kill -0 "$(cat /tmp/phaseD.pid)" 2>/dev/null; do sleep 60; done
fi

run() {
  local name="$1" tmo="$2"; shift 2
  if (( $(date +%s) > DEADLINE_EPOCH )); then
    echo "=== $name SKIPPED (past deadline) ==="; return
  fi
  echo "=== $name start $(date -u +%H:%M:%S): $* ==="
  local t0=$SECONDS
  if timeout "$tmo" "$@" >".runs/$name.log" 2>&1; then
    echo "=== $name OK ($((SECONDS - t0))s) ==="
  else
    echo "=== $name FAILED rc=$? ($((SECONDS - t0))s) — see .runs/$name.log ==="
  fi
}

run unroll_ab_u1 2700 python scripts/bench_scaling.py --batches 128 --unroll 1
run unroll_ab_u2 2700 python scripts/bench_scaling.py --batches 128 --unroll 2
run unroll_ab_u4 2700 python scripts/bench_scaling.py --batches 128 --unroll 4

run mig_tau03 10800 python -m clearvae_tpu.experiments.mig_expr \
  --temperature 0.3 --betas 0.03125 0.0625 0.125 0.25 0.5 1 2 4 8
run mig_tau10 10800 python -m clearvae_tpu.experiments.mig_expr \
  --temperature 1.0 --betas 0.03125 0.0625 0.125 0.25 0.5 1 2 4 8

for seed in 5 13; do
  run styledmnist_full_s$seed 7200 \
    python -m clearvae_tpu.experiments.styledmnist_downstream \
    --epochs 41 --epochs_per_scan 4 --seed $seed
done

for seed in 7 19; do
  run chexpert_s$seed 5400 \
    python -m clearvae_tpu.experiments.chexpert_downstream --seed $seed
done

echo "=== phase E done $(date -u +%H:%M:%S) ==="
