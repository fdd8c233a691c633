"""Batch-size scaling curve for the CLEAR-VAE training step (VERDICT r2
item 2): throughput + MFU at batch 128 → 4096, f32 parity config and bf16
perf mode. One JSON line per point; paste the table into BASELINE.md.

Usage: python scripts/bench_scaling.py [--batches 128 512 1024 2048 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# package: scripts/ is sys.path[0], so add the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="*",
                   default=[128, 256, 512, 1024, 2048, 4096])
    p.add_argument("--size", type=int, default=28)
    p.add_argument("--z_dim", type=int, default=16)
    p.add_argument("--in_ch", type=int, default=1)
    p.add_argument("--unroll", type=int, default=1,
                   help="lax.scan unroll factor for the inner step scan")
    p.add_argument("--fused_heads", action="store_true",
                   help="fold the four latent heads + decoder dense into "
                        "one [flat, 2z] matmul (VAE(fused_heads=True))")
    p.add_argument("--window_images", type=int, default=2_500_000,
                   help="images per timing window (>=1.2s of device time "
                        "at the config's expected rate; use ~500k for the "
                        "slower 64px configs)")
    args = p.parse_args()

    from clearvae_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    import bench

    for b in args.batches:
        n_images = max(4096, 4 * b)
        for dname, dtype in [("f32", None), ("bf16", jnp.bfloat16)]:
            ips = bench.measure_config(
                dtype=dtype, batch=b, z_dim=args.z_dim, size=args.size,
                in_ch=args.in_ch, n_images=n_images, unroll=args.unroll,
                fused_heads=args.fused_heads,
                # >=1.2s of device time even at ~2M img/s (bf16 large-batch)
                target_window_images=args.window_images)
            fl = bench.clear_vae_train_flops_per_image(
                z_dim=args.z_dim, batch=b, size=args.size, in_ch=args.in_ch)
            print(json.dumps({
                "batch": b, "dtype": dname, "unroll": args.unroll,
                "fused_heads": args.fused_heads,
                "images_per_sec_per_chip": round(ips, 1),
                "mfu": round(ips * fl / bench.V5E_PEAK_FLOPS, 4),
            }), flush=True)


if __name__ == "__main__":
    main()
