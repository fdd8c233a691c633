#!/usr/bin/env bash
# Repeat-run driver (equivalent of the reference's
# code/expr_run/run_styledmnist_downstream_expr.ps1: 11 repetitions with
# fresh seeds, results aggregated by clearvae_tpu.experiments.analyze).
set -euo pipefail
REPEATS="${1:-11}"
shift || true
for i in $(seq 1 "$REPEATS"); do
  echo "=== repetition $i/$REPEATS ==="
  python -m clearvae_tpu.experiments.styledmnist_downstream "$@"
done
