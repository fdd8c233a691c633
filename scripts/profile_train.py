"""Capture a jax.profiler trace of the scanned CLEAR-VAE training epoch.

Usage: python scripts/profile_train.py [--trace-dir /tmp/clearvae-trace]
View with TensorBoard or xprof. Demonstrates the tracing hook from
clearvae_tpu.utils.logging.profile_trace (the reference has no profiling at
all, SURVEY §5).
"""

import argparse
import os
import sys

# package: scripts/ is sys.path[0], so add the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from clearvae_tpu.config import AnnealConfig, ContrastiveConfig
from clearvae_tpu.data.mnist import synthetic_mnist
from clearvae_tpu.data.styled import make_styled_mnist
from clearvae_tpu.models.vae import VAE
from clearvae_tpu.train.steps import init_vae_state, make_clear_vae_step, make_epoch_fn
from clearvae_tpu.utils.cache import enable_compilation_cache
from clearvae_tpu.utils.logging import Throughput, profile_trace


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace-dir", default="/tmp/clearvae-trace")
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--batch", type=int, default=128)
    args = p.parse_args()

    enable_compilation_cache()
    imgs, labels = synthetic_mnist(args.n, seed=0)
    ds = make_styled_mnist(imgs, labels, seed=0)
    data = jnp.asarray(ds.materialize()[..., None])
    lbl = jnp.asarray(labels)
    model = VAE(total_z_dim=16)
    tx = optax.adam(5e-4)
    state = init_vae_state(model, tx, jax.random.key(0), 28, 1)
    step = make_clear_vae_step(model, tx, AnnealConfig(), ContrastiveConfig())
    epoch_fn = make_epoch_fn(step.core)
    nb = args.n // args.batch
    bi = jnp.asarray(np.random.RandomState(0).permutation(args.n)
                     [: nb * args.batch].reshape(nb, args.batch))
    state, m = epoch_fn(state, data, lbl, bi, jax.random.key(0))  # compile
    jax.block_until_ready(m["loss"])

    meter = Throughput()
    meter.start()
    with profile_trace(args.trace_dir):
        state, m = epoch_fn(state, data, lbl, bi, jax.random.key(1))
        jax.block_until_ready(m["loss"])
    meter.add(nb * args.batch)
    print(f"trace written to {args.trace_dir}; "
          f"{meter.images_per_sec:,.0f} images/sec")


if __name__ == "__main__":
    main()
