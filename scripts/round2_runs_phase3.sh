#!/usr/bin/env bash
# Round-2 evidence campaign, phase 3 (after round2_runs_phase2.sh):
# full-reference-scale Styled-MNIST repeats for two more seeds (seed 42
# was run in round 1), giving 3-seed spread at the reference's 41-epoch
# 50k/10k scale. Results land next to the round-1 JSONs so analyze.py
# aggregates all seeds together.
#
# COMPLETED in round 2 (run as k=5 first, then k=1..4, via --k_min/--k_max
# so the headline point landed before the time budget could run out);
# results committed under expr_output/styled-mnist/classification/.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p .runs

run() {
  local name="$1"; shift
  echo "=== $name: $* ==="
  local t0=$SECONDS
  if python "$@" >".runs/$name.log" 2>&1; then
    echo "=== $name OK ($((SECONDS - t0))s) ==="
  else
    echo "=== $name FAILED rc=$? ($((SECONDS - t0))s) — see .runs/$name.log ==="
  fi
}

for seed in 7 19; do
  run styledmnist_full_s$seed -m clearvae_tpu.experiments.styledmnist_downstream \
      --epochs 41 --seed $seed --epochs_per_scan 4
done
echo "=== phase 3 done ==="
