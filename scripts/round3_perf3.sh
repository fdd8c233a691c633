#!/usr/bin/env bash
# Round-3 follow-up perf session (run AFTER the round4_queue campaign exits;
# strictly ONE TPU process at a time).
#
# Goal: land the scan-unroll win with the fixed device-get timing harness.
# The 00:15 unroll A/B (u1 867k / u2 1.015M / u4 1.096M f32 at B=128) was
# measured with the pre-fix block_until_ready sync; re-measure u1/2/4/8 at
# the parity batch, the B=512 perf point, and the VAE64 config before
# changing any default.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p .runs

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name start $(date -u +%H:%M:%S): $* ==="
  local t0=$SECONDS
  if timeout "$tmo" "$@" >".runs/$name.log" 2>&1; then
    echo "=== $name OK ($((SECONDS - t0))s) ==="
  else
    echo "=== $name rc=$? ($((SECONDS - t0))s) — see .runs/$name.log ==="
  fi
}

# 1. unroll sweep at the parity batch (f32 + bf16 each)
for u in 1 2 4 8; do
  run unroll2_b128_u$u 2700 python scripts/bench_scaling.py --batches 128 --unroll $u
done

# 2. best-known 28px perf point × unroll
run unroll2_b512_u4_fh 2700 python scripts/bench_scaling.py \
  --batches 512 --unroll 4 --fused_heads
run unroll2_b512_u8_fh 2700 python scripts/bench_scaling.py \
  --batches 512 --unroll 8 --fused_heads

# 3. VAE64 (the config that dominates experiment wall-clock): unroll + fused heads
run unroll2_vae64_u1 2700 python scripts/bench_scaling.py \
  --batches 128 --size 64 --z_dim 64 --in_ch 3 --unroll 1 --window_images 500000
run unroll2_vae64_u4 2700 python scripts/bench_scaling.py \
  --batches 128 --size 64 --z_dim 64 --in_ch 3 --unroll 4 --window_images 500000
run unroll2_vae64_u4_fh 2700 python scripts/bench_scaling.py \
  --batches 128 --size 64 --z_dim 64 --in_ch 3 --unroll 4 --fused_heads --window_images 500000

echo "=== perf3 done $(date -u +%H:%M:%S) ==="
