"""In-situ A/B for the scanned-epoch batch gather layout (the b2048 trace
shows jit(_take)/gather at 40.7% of device time — .runs/trace_b2048.log).

Hypothesis: gathering rows of [N, H, W, 1] pays for the minor-dim=1 lane
padding; gathering from flat [N, H*W] rows and reshaping afterwards lets
the relayout happen once per batch on a dense row. Both variants run the
REAL CLEAR train step (bench._make_state_and_step) scanned K steps in one
program on the TPU.

Usage: python scripts/bench_flat_gather.py [--batch 2048] [--steps 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--size", type=int, default=28)
    p.add_argument("--z_dim", type=int, default=16)
    p.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    args = p.parse_args()

    from clearvae_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    import bench

    b, k, s = args.batch, args.steps, args.size
    n = 4 * b
    dt = jnp.bfloat16 if args.dtype == "bf16" else None
    model, state0, step = bench._make_state_and_step(
        "clear", dt, args.z_dim, s, 1)
    rs = np.random.RandomState(0)
    data4 = jnp.asarray(rs.rand(n, s, s, 1), jnp.float32)
    data2 = jnp.asarray(np.asarray(data4).reshape(n, s * s))
    labels = jnp.asarray(rs.randint(0, 10, n))
    idx = jnp.asarray(np.stack([rs.permutation(n)[:b] for _ in range(k)]))

    @partial(jax.jit, donate_argnums=(0,))
    def epoch4(state, data, lb, bi, rng):
        keys = jax.random.split(rng, k)

        def body(st, inp):
            i, kk = inp
            st, m = step.core(st, jnp.take(data, i, axis=0),
                              jnp.take(lb, i, axis=0), kk)
            return st, m["loss"]

        return jax.lax.scan(body, state, (bi, keys))

    @partial(jax.jit, donate_argnums=(0,))
    def epoch2(state, data, lb, bi, rng):
        keys = jax.random.split(rng, k)

        def body(st, inp):
            i, kk = inp
            xb = jnp.take(data, i, axis=0).reshape(b, s, s, 1)
            st, m = step.core(st, xb, jnp.take(lb, i, axis=0), kk)
            return st, m["loss"]

        return jax.lax.scan(body, state, (bi, keys))

    @partial(jax.jit, donate_argnums=(0,))
    def epoch_pre(state, data, lb, bi, rng):
        # permute-once: ONE big [k*B] row gather up front, then the scan
        # consumes contiguous [B] slices (scan xs slicing is free). Same
        # batches/order as epoch4 — only the materialization strategy
        # differs. Tests whether k interleaved in-scan gathers underutilize
        # HBM bandwidth vs a single bulk gather.
        keys = jax.random.split(rng, k)
        flat = bi.reshape(-1)
        xs = jnp.take(data, flat, axis=0).reshape(k, b, s, s, 1)
        ls = jnp.take(lb, flat, axis=0).reshape(k, b)

        def body(st, inp):
            xb, lbb, kk = inp
            st, m = step.core(st, xb, lbb, kk)
            return st, m["loss"]

        return jax.lax.scan(body, state, (xs, ls, keys))

    @partial(jax.jit, donate_argnums=(0,))
    def epoch_oh(state, data, lb, bi, rng):
        # MXU gather: one-hot [B, N] @ [N, F] materializes the batch as a
        # matmul; labels still use the (tiny) row gather
        keys = jax.random.split(rng, k)
        dmat = data.astype(jnp.bfloat16)

        def body(st, inp):
            i, kk = inp
            oh = jax.nn.one_hot(i, n, dtype=jnp.bfloat16)
            xb = (oh @ dmat).astype(data.dtype).reshape(b, s, s, 1)
            st, m = step.core(st, xb, jnp.take(lb, i, axis=0), kk)
            return st, m["loss"]

        return jax.lax.scan(body, state, (bi, keys))

    for name, fn, data in [("gather_nhwc", epoch4, data4),
                           ("gather_flat", epoch2, data2),
                           ("gather_permute_slice", epoch_pre, data4),
                           ("gather_onehot_mxu", epoch_oh, data2)]:
        st = jax.tree.map(jnp.copy, state0)
        st, loss = fn(st, data, labels, idx, jax.random.key(0))
        np.asarray(loss)  # warmup; device-get sync (CLAUDE.md invariant)
        # window = enough repeat dispatches of the k-step program that the
        # measured span is >=1s of device time (CLAUDE.md invariant; the
        # tunnel's ~100ms sync roundtrip then amortizes to <10%), with t0
        # BEFORE the first dispatch (same window convention as bench.py)
        # windows end with a DEVICE_GET of the small loss vector, never
        # block_until_ready (early-return on axon with few programs in
        # flight — CLAUDE.md benchmark-sync invariant, same fix as bench.py)
        reps, ts = 1, []
        while True:
            t0 = time.perf_counter()
            for w in range(reps):
                st, loss = fn(st, data, labels, idx, jax.random.key(1 + w))
            np.asarray(loss)
            dt = time.perf_counter() - t0
            if dt >= 1.0:
                break
            reps = max(reps + 1, int(reps * 1.3 / max(dt, 1e-3)))
        for _ in range(3):
            t0 = time.perf_counter()
            for w in range(reps):
                st, loss = fn(st, data, labels, idx, jax.random.key(1 + w))
            np.asarray(loss)
            ts.append(time.perf_counter() - t0)
        ips = reps * b * k / float(np.median(ts))
        print(json.dumps({"variant": name,
                          "images_per_sec": round(ips, 1),
                          "loss_last": float(np.asarray(loss)[-1])}),
              flush=True)


if __name__ == "__main__":
    main()
