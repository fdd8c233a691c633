"""Micro-A/B for the in-scan batch gather that the b2048 trace shows
dominating device time (40.7% — .runs/trace_b2048.log): alternative ways to
materialize shuffled batches from HBM-resident data inside a lax.scan.

Variants (each scanned K steps in ONE program, median of 3 windows):
  take4d    — jnp.take from [N, H, W, C] (current make_epoch_fn)
  take2d    — jnp.take from [N, H*W*C], reshape after
  dynslice  — contiguous lax.dynamic_slice from a pre-permuted copy
              (permute once per epoch with one big take, then slice)
  onehot    — [B, N] one-hot @ [N, F] matmul gather (MXU does the shuffle)

Usage: python scripts/bench_gather.py [--n 8192] [--batch 2048] [--steps 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--size", type=int, default=28)
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    args = p.parse_args()

    from clearvae_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    n, b, k, s = args.n, args.batch, args.steps, args.size
    f = s * s
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rs = np.random.RandomState(0)
    data4 = jnp.asarray(rs.rand(n, s, s, 1), dt)
    data2 = data4.reshape(n, f)
    idx = jnp.asarray(
        np.stack([rs.permutation(n)[:b] for _ in range(k)]))

    def run(name, fn, *arrs):
        jfn = jax.jit(fn)
        np.asarray(jfn(*arrs))  # warmup; device-get sync
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            # window ends with a DEVICE_GET of the scalar output —
            # block_until_ready can return early on the axon backend with
            # few programs in flight (CLAUDE.md benchmark-sync invariant)
            np.asarray(jfn(*arrs))
            ts.append(time.perf_counter() - t0)
        us_per_step = float(np.median(ts)) / k * 1e6
        gbps = b * f * data4.dtype.itemsize / (us_per_step / 1e6) / 1e9
        print(json.dumps({"variant": name, "us_per_step": round(us_per_step, 1),
                          "effective_GB_s": round(gbps, 1)}), flush=True)

    def scan_sum(body):
        # consume each batch through a step-dependent nonlinearity so XLA
        # can neither commute the reduction with the gather nor hoist a
        # precomputed transform of `data` out of the loop
        def fn(data, idx):
            def step(acc, i):
                xb = body(data, i).astype(jnp.float32)
                acc = acc + jnp.tanh(xb * (1.0 + acc)).sum()
                return acc, 0.0
            acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), idx)
            return acc
        return fn

    run("take4d", scan_sum(lambda d, i: jnp.take(d, i, axis=0)), data4, idx)
    run("take2d", scan_sum(lambda d, i: jnp.take(d, i, axis=0)
                           .reshape(b, s, s, 1)), data2, idx)

    def dynslice(data, idx):
        # one epoch-level permutation gather, then contiguous slices
        perm = jnp.take(data, idx.reshape(-1), axis=0)

        def step(acc, t):
            xb = jax.lax.dynamic_slice_in_dim(perm, t * b, b)
            xb = xb.astype(jnp.float32)
            return acc + jnp.tanh(xb * (1.0 + acc)).sum(), 0.0

        acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                              jnp.arange(k))
        return acc

    run("dynslice", dynslice, data2, idx)

    def onehot(data, idx):
        def step(acc, i):
            oh = jax.nn.one_hot(i, n, dtype=data.dtype)
            xb = (oh @ data).astype(jnp.float32)
            return acc + jnp.tanh(xb * (1.0 + acc)).sum(), 0.0
        acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), idx)
        return acc

    run("onehot", onehot, data2, idx)


if __name__ == "__main__":
    main()
