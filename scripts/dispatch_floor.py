"""Measure the reference implementation's per-batch host-dispatch floor and
eager-op count — the inputs to BASELINE.md's "A100 parity" arithmetic
(VERDICT r4 item 10).

Runs the reference's own CLEARVAETrainer (read-only import from
/root/reference/code) on torch-CPU at shrinking batch sizes: at batch 2 the
compute is negligible, so the per-batch time is the pure Python+dispatch
floor that bounds ANY eager-torch backend (A100 included — 2,400+ kernel
launches per step cost the same host time regardless of how fast the GPU
is). CPU-only; safe to run while a TPU campaign holds the chip.
"""

from __future__ import annotations

import itertools
import sys
import time

sys.path.insert(0, "/root/reference/code")


def make_trainer(z: int = 16):
    import torch

    from src.models.vae import VAE as TorchVAE
    from src.trainer import CLEARVAETrainer

    torch.manual_seed(0)
    vae = TorchVAE(total_z_dim=z)
    opt = torch.optim.Adam(vae.parameters(), lr=5e-4)
    return CLEARVAETrainer(
        vae, opt, sim_fn="cosine",
        hyperparameter={"temperature": 0.1, "alpha": 1e2, "beta": 1 / 8,
                        "ps": True, "loc": 0, "scale": 1},
        verbose_period=10 ** 9, device=__import__("torch").device("cpu"))


def time_per_batch(batch: int, n_batches: int = 30) -> float:
    import torch
    from torch.utils.data import DataLoader, TensorDataset

    x = torch.rand(batch * n_batches, 1, 28, 28)
    y = torch.randint(0, 10, (batch * n_batches,))
    loader = DataLoader(TensorDataset(x, y), batch_size=batch, shuffle=False)
    tr = make_trainer()
    tr._train(itertools.islice(iter(loader), 5), False, 0)  # warmup
    t0 = time.perf_counter()
    tr._train(iter(loader), False, 0)
    return (time.perf_counter() - t0) / n_batches


def main():
    import torch
    from torch.profiler import ProfilerActivity, profile

    for b in (2, 8, 128):
        dt = time_per_batch(b)
        print(f"batch {b}: {dt * 1e3:.2f} ms/batch -> {b / dt:.0f} img/s")

    tr = make_trainer()
    x = torch.rand(128, 1, 28, 28)
    y = torch.randint(0, 10, (128,))
    tr._train(iter([(x, y)]), False, 0)
    with profile(activities=[ProfilerActivity.CPU]) as prof:
        tr._train(iter([(x, y)]), False, 0)
    n_ops = sum(e.count for e in prof.key_averages()
                if e.key.startswith("aten::"))
    print("aten op invocations per training step:", n_ops)


if __name__ == "__main__":
    main()
