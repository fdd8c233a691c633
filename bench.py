"""Benchmark harness: Styled-MNIST CLEAR-VAE training throughput.

Reference config (run_styledmnist_downstream_expr.py:231-238): z_dim=16,
batch=128, beta=1/8, alpha=1e2, tau=0.1, Adam lr 5e-4, sim_fn=cosine.

Prints ONE JSON line:
  {"metric": ..., "value": images/sec/chip, "unit": ..., "vs_baseline": ratio}

vs_baseline: ratio against the PyTorch-CPU *reference implementation* run in
this same container (the reference publishes no numbers — BASELINE.md). The
torch baseline is measured once by importing the reference's own trainer
(read-only) on synthetic data and cached in .bench_baseline.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")

BATCH = 128
Z_DIM = 16
N_STEPS = 256
N_IMAGES = 4096


def measure_tpu() -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from clearvae_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from clearvae_tpu.config import AnnealConfig, ContrastiveConfig
    from clearvae_tpu.data.mnist import synthetic_mnist
    from clearvae_tpu.data.styled import make_styled_mnist
    from clearvae_tpu.models.vae import VAE
    from clearvae_tpu.train.steps import (init_vae_state, make_clear_vae_step,
                                          make_epoch_fn)

    imgs, labels = synthetic_mnist(N_IMAGES, seed=0)
    ds = make_styled_mnist(imgs, labels, seed=0)
    styled = ds.materialize()  # on-device styling, cached host-side

    model = VAE(total_z_dim=Z_DIM)
    tx = optax.adam(5e-4)
    state = init_vae_state(model, tx, jax.random.key(0), 28, 1)
    step = make_clear_vae_step(model, tx, AnnealConfig(beta=1 / 8),
                               ContrastiveConfig(alpha=1e2, temperature=0.1,
                                                 ps=True))

    # whole epoch stays HBM-resident and runs as ONE scanned XLA program;
    # with multiple chips the batch shards over a 1-D data mesh (GSPMD)
    epoch_fn = make_epoch_fn(step.core)
    data = jnp.asarray(styled[..., None])
    lbl = jnp.asarray(labels)
    if jax.device_count() > 1:
        from clearvae_tpu.parallel.mesh import (make_mesh, replicate_state,
                                                shard_batch)

        mesh = make_mesh()
        state = replicate_state(mesh, state)
        data, lbl = shard_batch(mesh, data, lbl)
    n_batches = N_IMAGES // BATCH
    rs = np.random.RandomState(0)

    def one_epoch(state, seed):
        perm = rs.permutation(N_IMAGES)[: n_batches * BATCH]
        batch_idx = jnp.asarray(perm.reshape(n_batches, BATCH))
        return epoch_fn(state, data, lbl, batch_idx, jax.random.key(seed))

    state, m = one_epoch(state, 0)  # compile + warmup
    jax.block_until_ready(m["loss"])

    # median of 3 timing windows — throughput through the remote-TPU tunnel
    # is noisy, and a single short window under-reports steady state
    n_epochs = max(4, N_STEPS // n_batches)
    rates = []
    for w in range(3):
        t0 = time.perf_counter()
        for e in range(n_epochs):
            state, m = one_epoch(state, 1 + w * n_epochs + e)
        jax.block_until_ready(m["loss"])
        rates.append(n_epochs * n_batches * BATCH / (time.perf_counter() - t0))
    return float(np.median(rates))


def measure_torch_baseline(max_seconds: float = 120.0) -> float:
    """Run the reference implementation (PyTorch CPU) on the same config.

    Imports the reference's own CLEARVAETrainer/VAE/losses — no reimplemented
    torch code here — on synthetic styled data.
    """
    import torch
    from torch.utils.data import DataLoader, TensorDataset

    sys.path.insert(0, "/root/reference/code")
    from src.models.vae import VAE as TorchVAE  # noqa: E402
    from src.trainer import CLEARVAETrainer as TorchTrainer  # noqa: E402

    torch.manual_seed(0)
    n = BATCH * 16
    x = torch.rand(n, 1, 28, 28)
    y = torch.randint(0, 10, (n,))
    loader = DataLoader(TensorDataset(x, y), batch_size=BATCH, shuffle=False)

    vae = TorchVAE(total_z_dim=Z_DIM)
    opt = torch.optim.Adam(vae.parameters(), lr=5e-4)
    trainer = TorchTrainer(
        vae, opt, sim_fn="cosine",
        hyperparameter={"temperature": 0.1, "alpha": 1e2, "beta": 1 / 8,
                        "ps": True, "loc": 0, "scale": 1},
        verbose_period=10**9, device=torch.device("cpu"))

    # warm-up one epoch pass of 2 batches
    import itertools

    def run_batches(k):
        count = 0
        t0 = time.perf_counter()
        for _ in range(k):
            trainer._train(itertools.islice(iter(loader), 4), False, 0)
            count += 4 * BATCH
            if time.perf_counter() - t0 > max_seconds:
                break
        return count / (time.perf_counter() - t0)

    run_batches(1)  # warmup
    return run_batches(4)


def get_torch_baseline() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["torch_cpu_images_per_sec"]
    try:
        v = measure_torch_baseline()
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"torch_cpu_images_per_sec": v}, f)
        return v
    except Exception as e:  # reference import can fail in minimal envs
        print(f"# torch baseline unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)
        return float("nan")


def main():
    tpu_ips = measure_tpu()
    base_ips = get_torch_baseline()
    vs = tpu_ips / base_ips if np.isfinite(base_ips) else None
    print(json.dumps({
        "metric": "styledmnist_clearvae_train_images_per_sec_per_chip",
        "value": round(tpu_ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
