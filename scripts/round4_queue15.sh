#!/usr/bin/env bash
# Round-4 TPU queue, part 15 — chains after the queue13 supervisor (which
# survived a builder-session restart; exactly ONE queue waits on it, per the
# CLAUDE.md two-supervisor hazard; the lockfile now also enforces this
# mechanically — queue14's duplicate jobs all failed fast against it).
# Order: the new permute-slice gather A/B first (quick, and the only new
# measurement this queue owns), then re-run whatever queue13's deadline
# guard skipped — every runner resumes from its incremental JSONs.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p .runs

DEADLINE_EPOCH="${DEADLINE_EPOCH:?set DEADLINE_EPOCH (epoch seconds)}"
WAIT_PID="${WAIT_PID:-}"

if [[ -n "$WAIT_PID" ]] && kill -0 "$WAIT_PID" 2>/dev/null; then
  echo "=== waiting on queue13 supervisor (pid $WAIT_PID) ==="
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

# In-situ gather A/B with the new permute_slice variant (headline batch
# regimes; bf16 matches the best-measured rows).
run gather_ab_b2048 python scripts/bench_flat_gather.py --batch 2048 --steps 64
run gather_ab_b512 python scripts/bench_flat_gather.py --batch 512 --steps 64

# Leftovers from queue13 (resume machinery skips finished models/betas).
for seed in 47 53 59 61 67 71; do
  run camelyon17_s$seed python -m clearvae_tpu.experiments.camelyon17_downstream \
    --epochs 7 --cnn_epochs 6 --n_synthetic 8192 --k 1 --seed $seed
done

# perf-mode parity A/B: only meaningful as two complete back-to-back runs
# (wall-clock per model comes from the runner logs); if queue13 already ran
# both to completion these resume to instant no-ops, otherwise start clean.
if ! python - <<'EOF'
import json, sys
for k in (1, 2, 3):
    for suf in ("", "-perf"):
        try:
            d = json.load(open(f"expr_output/celeba/classification/celeba-k{k}-900{suf}.json"))
        except OSError:
            sys.exit(1)
        if len(d) < 7:
            sys.exit(1)
EOF
then
  rm -f expr_output/celeba/classification/celeba-k*-900.json \
        expr_output/celeba/classification/celeba-k*-900-perf.json
  run celeba_ab_default python -m clearvae_tpu.experiments.celeba_downstream \
    --epochs 41 --n_synthetic 8192 --k_max 3 --seed 900 \
    --vae_lr 1e-4 --epochs_per_scan 4
  run celeba_ab_perf python -m clearvae_tpu.experiments.celeba_downstream \
    --epochs 41 --n_synthetic 8192 --k_max 3 --seed 900 \
    --vae_lr 1e-4 --epochs_per_scan 4 --perf_mode
else
  echo "=== perf A/B already complete — skipping ==="
fi

run mig_celeba_s202 python -m clearvae_tpu.experiments.mig_expr_celeba \
  --seed 202 --epochs 16 --n_synthetic 4096 \
  --betas 0.03125 0.0625 0.125 0.25 0.5 1 2 4 8

echo "=== round-4 queue part 15 done $(date -u +%H:%M:%S) ==="
