#!/usr/bin/env bash
# Round-4 TPU queue, part 4 (supersedes the tail of round4_queue3.sh; its
# supervisor was stopped between jobs — the in-flight styled s29 survives
# and this waits on it). Adds a full bench.py warm run after the perf
# block: the container reset wiped the persistent XLA compile cache, and
# without a warm run the driver's end-of-round bench would cold-compile
# the TC/MIM/VAE64/perf-mode configs (minutes each). bench.py also
# re-measures + caches the torch-CPU baseline on a quiet host.
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

# perf block
for u in 1 2 4; do
  run unroll_ab_u$u python scripts/bench_scaling.py --batches 128 512 --unroll $u
done
run unroll_ab_u4_fused python scripts/bench_scaling.py \
    --batches 128 512 --unroll 4 --fused_heads
run vae64_scaling python scripts/bench_scaling.py \
    --batches 128 256 --size 64 --z_dim 64 --in_ch 3 --window_images 500000

# warm every bench.py config in the persistent XLA cache + cache the torch
# baseline, so the driver's end-of-round bench run is hot
run bench_warm python bench.py

# CelebA/PACS seeds 11/23 at the committed seeds' scale (n_synthetic 8192)
for seed in 11 23; do
  run celeba_s$seed python -m clearvae_tpu.experiments.celeba_downstream \
    --epochs 41 --n_synthetic 8192 --k_max 3 --seed $seed \
    --vae_lr 1e-4 --epochs_per_scan 4
  run pacs_s$seed python -m clearvae_tpu.experiments.pacs_downstream \
    --epochs 41 --n_synthetic 8192 --k_max 3 --seed $seed \
    --vae_lr 1e-4 --epochs_per_scan 4
done

# CheXpert -> 5 seeds (n_synthetic 4096 matches committed scale),
# Camelyon17 -> 8 seeds
for seed in 11 23; do
  run chexpert_s$seed python -m clearvae_tpu.experiments.chexpert_downstream \
    --seed $seed --n_synthetic 4096
done
for seed in 13 31; do
  run camelyon17_s$seed python -m clearvae_tpu.experiments.camelyon17_downstream \
    --epochs 7 --cnn_epochs 6 --n_synthetic 8192 --k 1 --seed $seed
done

echo "=== round-4 queue part 4 done $(date -u +%H:%M:%S) ==="
