#!/usr/bin/env bash
# Temperature-sweep driver (equivalent of reference
# code/expr_run/run_elbo_mig_expr.ps1: runs the MIG/ELBO experiment at
# tau in {0.1, 0.3, 1.0}).
set -euo pipefail
for TAU in 0.1 0.3 1.0; do
  echo "=== temperature $TAU ==="
  python -m clearvae_tpu.experiments.mig_expr --temperature "$TAU" "$@"
done
