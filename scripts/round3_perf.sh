#!/usr/bin/env bash
# Round-3 TPU perf window (VERDICT r2 item 2) + extra Camelyon17 seeds.
# Sequential; ONE TPU process at a time. Outputs under .runs/.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p .runs

run() {
  local name="$1"; shift
  echo "=== $name: $* ==="
  local t0=$SECONDS
  if "$@" >".runs/$name.log" 2>&1; then
    echo "=== $name OK ($((SECONDS - t0))s) ==="
  else
    echo "=== $name FAILED rc=$? ($((SECONDS - t0))s) ==="
  fi
}

for seed in 3 11 23; do
  run camelyon17_s$seed python -m clearvae_tpu.experiments.camelyon17_downstream \
      --epochs 7 --cnn_epochs 6 --n_synthetic 8192 --k 1 --seed $seed
done

run trace_f32 python scripts/analyze_trace.py --steps 512 \
    --trace-dir /tmp/clearvae-trace-f32
run trace_b2048 python scripts/analyze_trace.py --steps 64 --batch 2048 \
    --dtype bf16 --trace-dir /tmp/clearvae-trace-b2048
run scaling python scripts/bench_scaling.py
run bench_r3 python bench.py

echo "=== perf window done ==="
