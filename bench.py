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
# steps per timing window: big enough that one window is ~1s of device time,
# so the final block_until_ready roundtrip through the remote-TPU tunnel
# (~100ms) amortizes away instead of dominating
N_STEPS = 3072
N_IMAGES = 4096


# TPU v5e (1 chip) peak: 197 TFLOP/s bf16 on the MXU (f32 matmuls decompose
# into multiple bf16 passes, so the same peak is the roofline either way).
V5E_PEAK_FLOPS = 197e12


def clear_vae_train_flops_per_image(z_dim: int = Z_DIM, batch: int = BATCH,
                                    size: int = 28, in_ch: int = 1) -> float:
    """Analytic training FLOPs per image for the CLEAR-VAE step (28×28 VAE,
    reference architecture vae.py:7-102): 2 FLOPs/MAC forward, backward ≈ 2×
    forward (standard MFU accounting). XLA's compiled cost_analysis() cannot
    be used here — TPU convolutions lower into fused custom calls whose FLOPs
    it does not count (measured ~40× undercount), so the roofline number
    comes from the layer math."""
    chans = (in_ch, 32, 64, 128)
    spatial = size
    macs = 0
    # encoder convs (3×3 stride 2) — MACs = out_spatial² · Cout · k² · Cin
    for cin, cout in zip(chans[:-1], chans[1:]):
        spatial = (spatial + 1) // 2
        macs += spatial * spatial * cout * 9 * cin
    flat = spatial * spatial * chans[-1]
    macs += 4 * flat * (z_dim // 2)          # four latent heads
    macs += z_dim * flat                     # decoder dense
    # decoder convTs mirror the encoder (MACs = in_spatial² · Cin · k² · Cout)
    spatial_in = spatial
    for cin, cout in zip(reversed(chans[1:]), reversed(chans[:-1])):
        macs += spatial_in * spatial_in * cin * 9 * cout
        spatial_in *= 2
    # contrastive [B,B] sim matrices on mu_c and mu_s (cosine: one matmul each)
    macs += 2 * batch * (z_dim // 2)         # per image: B·z/2 MACs ×2 halves
    return 3 * 2 * macs                      # fwd 2·MACs, train ≈ 3× fwd


def measure_tpu(dtype=None):
    """Returns (images/sec/chip, flops/image from XLA cost analysis)."""
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
                                          make_multi_epoch_fn)

    imgs, labels = synthetic_mnist(N_IMAGES, seed=0)
    ds = make_styled_mnist(imgs, labels, seed=0)
    styled = ds.materialize()  # on-device styling, cached host-side

    kw = {"dtype": dtype} if dtype is not None else {}
    model = VAE(total_z_dim=Z_DIM, **kw)
    tx = optax.adam(5e-4)
    state = init_vae_state(model, tx, jax.random.key(0), 28, 1)
    step = make_clear_vae_step(model, tx, AnnealConfig(beta=1 / 8),
                               ContrastiveConfig(alpha=1e2, temperature=0.1,
                                                 ps=True))

    # the production fast path: HBM-resident data, a whole BLOCK of epochs
    # fused into one scanned XLA program (one dispatch through the tunnel);
    # with multiple chips the batch shards over a 1-D data mesh (GSPMD) —
    # the same make_multi_epoch_fn(mesh=...) program trainers run with
    # fit(epochs_per_scan=...)
    mesh = None
    if jax.device_count() > 1:
        from clearvae_tpu.parallel.mesh import (make_mesh, replicate_state,
                                                shard_batch)

        mesh = make_mesh()
    epoch_fn = make_multi_epoch_fn(step.core, mesh=mesh)
    data = jnp.asarray(styled[..., None])
    lbl = jnp.asarray(labels)
    if mesh is not None:
        state = replicate_state(mesh, state)
        data, lbl = shard_batch(mesh, data, lbl)
    n_batches = N_IMAGES // BATCH
    epochs_per_block = max(1, N_STEPS // n_batches)
    rs = np.random.RandomState(0)

    def one_block(state, seed):
        bi = np.stack([rs.permutation(N_IMAGES)[: n_batches * BATCH]
                       .reshape(n_batches, BATCH)
                       for _ in range(epochs_per_block)])
        return epoch_fn(state, data, lbl, jnp.asarray(bi),
                        jax.random.key(seed))

    # FLOPs per image from the compiled program's own cost analysis
    # (cross-check only — TPU conv fusions under-report; see
    # clear_vae_train_flops_per_image)
    bi0 = jnp.asarray(np.stack(
        [rs.permutation(N_IMAGES)[: n_batches * BATCH].reshape(n_batches,
                                                               BATCH)
         for _ in range(epochs_per_block)]))
    flops_per_image = float("nan")
    try:
        compiled = epoch_fn.lower(state, data, lbl, bi0,
                                  jax.random.key(0)).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_per_image = (float(ca["flops"])
                           / (epochs_per_block * n_batches * BATCH))
    except Exception as e:
        print(f"# cost_analysis unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)

    state, m = one_block(state, 0)  # compile + warmup
    jax.block_until_ready(m["loss"])

    # median of 3 timing windows — throughput through the remote-TPU tunnel
    # is noisy, and a single short window under-reports steady state
    rates = []
    for w in range(3):
        t0 = time.perf_counter()
        state, m = one_block(state, 1 + w)
        jax.block_until_ready(m["loss"])
        rates.append(epochs_per_block * n_batches * BATCH
                     / (time.perf_counter() - t0))
    return float(np.median(rates)), flops_per_image


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
    tpu_ips, flops_per_image = measure_tpu()
    bf16_ips = float("nan")
    try:
        import jax.numpy as jnp

        bf16_ips, _ = measure_tpu(dtype=jnp.bfloat16)
    except Exception as e:
        print(f"# bf16 measurement failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    base_ips = get_torch_baseline()
    vs = tpu_ips / base_ips if np.isfinite(base_ips) else None
    flops = clear_vae_train_flops_per_image()
    mfu = tpu_ips * flops / V5E_PEAK_FLOPS
    bf16_mfu = (bf16_ips * flops / V5E_PEAK_FLOPS
                if np.isfinite(bf16_ips) else None)
    print(json.dumps({
        "metric": "styledmnist_clearvae_train_images_per_sec_per_chip",
        "value": round(tpu_ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "train_flops_per_image_analytic": round(flops),
        "xla_cost_analysis_flops_per_image": (
            round(flops_per_image) if np.isfinite(flops_per_image) else None),
        "mfu": round(mfu, 4),
        "bf16_images_per_sec_per_chip": (round(bf16_ips, 1)
                                         if np.isfinite(bf16_ips) else None),
        "bf16_mfu": round(bf16_mfu, 4) if bf16_mfu is not None else None,
        "peak_flops_assumed": V5E_PEAK_FLOPS,
    }))


if __name__ == "__main__":
    main()
