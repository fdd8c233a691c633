"""A/B benchmark: fused Pallas CLEAR latent-loss kernel vs XLA jnp path.

Measures value+grad of the four latent terms (KL_c, KL_s, SNN, PS-SNN) in
isolation, and the full CLEAR train step, at the reference size (B=128,
z=16) and a large configuration (B=512, z=64). Prints a markdown table;
VERDICT r1 item 7 requires the ContrastiveConfig.fused default to flip only
if the fused kernel wins.

Run on the real TPU (needs the chip free): python scripts/bench_fused_loss.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

# runnable as `python scripts/bench_fused_loss.py` without installing the
# package: scripts/ is sys.path[0], so add the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clearvae_tpu.utils.cache import enable_compilation_cache  # noqa: E402


def time_fn(fn, *args, iters=200):
    out = fn(*args)
    jax.block_until_ready(out)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        reps.append((time.perf_counter() - t0) / iters)
    return float(np.median(reps)) * 1e6  # µs


def latent_loss_ab(b, z, temperature=0.1):
    from clearvae_tpu.ops.losses import contrastive_loss, vae_loss
    from clearvae_tpu.ops.pallas.fused_loss import fused_clear_latent_loss

    rs = np.random.RandomState(0)
    mu_c = jnp.asarray(rs.randn(b, z), jnp.float32)
    lv_c = jnp.asarray(rs.randn(b, z) * 0.3, jnp.float32)
    mu_s = jnp.asarray(rs.randn(b, z), jnp.float32)
    lv_s = jnp.asarray(rs.randn(b, z) * 0.3, jnp.float32)
    lbl = jnp.asarray(rs.randint(0, 10, b))
    x = jnp.zeros((b, 1, 1, 1))

    def jnp_total(args):
        mu_c, lv_c, mu_s, lv_s = args
        _, kl_c, kl_s = vae_loss(x, x, mu_c, lv_c, mu_s, lv_s)
        c = contrastive_loss(mu_c, lv_c, lbl, sim_fn="cosine",
                             temperature=temperature)
        s = contrastive_loss(mu_s, lv_s, lbl, sim_fn="cosine",
                             temperature=temperature, ps=True)
        return kl_c + kl_s + 100.0 * (c + s)

    def fused_total(args):
        kl_c, kl_s, c, s = fused_clear_latent_loss(
            *args, lbl, temperature=temperature, ps=True)
        return kl_c + kl_s + 100.0 * (c + s)

    args = (mu_c, lv_c, mu_s, lv_s)
    jnp_vg = jax.jit(jax.value_and_grad(jnp_total))
    fus_vg = jax.jit(jax.value_and_grad(fused_total))
    return time_fn(jnp_vg, args), time_fn(fus_vg, args)


def full_step_ab(b, z, size=28, in_ch=1):
    from clearvae_tpu.config import AnnealConfig, ContrastiveConfig
    from clearvae_tpu.models.vae import VAE, VAE64
    from clearvae_tpu.train.steps import init_vae_state, make_clear_vae_step

    model = (VAE if size == 28 else VAE64)(total_z_dim=z, in_channel=in_ch)
    tx = optax.adam(5e-4)
    state = init_vae_state(model, tx, jax.random.key(0), size, in_ch)
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.rand(b, size, size, in_ch), jnp.float32)
    lbl = jnp.asarray(rs.randint(0, 10, b))
    rng = jax.random.key(2)

    out = {}
    for fused in (False, True):
        step = make_clear_vae_step(model, tx, AnnealConfig(),
                                   ContrastiveConfig(alpha=100.0, fused=fused))

        def run(st):
            st, m = step(st, x, lbl, rng)
            return m["loss"]

        out[fused] = time_fn(run, state, iters=100)
    return out[False], out[True]


K_SCAN = 50


def full_step_scan_ab(b, z, size=28, in_ch=1):
    """Like full_step_ab, but K_SCAN steps fused into ONE program via
    lax.scan — removes the per-dispatch tunnel latency (~ms) that dominates
    the eager numbers, i.e. this is the production (scanned-epoch) regime.
    Returned µs are per step."""
    import jax.lax as lax

    from clearvae_tpu.config import AnnealConfig, ContrastiveConfig
    from clearvae_tpu.models.vae import VAE, VAE64
    from clearvae_tpu.train.steps import init_vae_state, make_clear_vae_step

    model = (VAE if size == 28 else VAE64)(total_z_dim=z, in_channel=in_ch)
    tx = optax.adam(5e-4)
    state = init_vae_state(model, tx, jax.random.key(0), size, in_ch)
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.rand(b, size, size, in_ch), jnp.float32)
    lbl = jnp.asarray(rs.randint(0, 10, b))
    rng = jax.random.key(2)

    out = {}
    for fused in (False, True):
        step = make_clear_vae_step(model, tx, AnnealConfig(),
                                   ContrastiveConfig(alpha=100.0, fused=fused))

        @jax.jit
        def run(st):
            def body(st, _):
                st, m = step.core(st, x, lbl, rng) if hasattr(step, "core") \
                    else step(st, x, lbl, rng)
                return st, m["loss"]

            st, losses = lax.scan(body, st, None, length=K_SCAN)
            return losses[-1]

        out[fused] = time_fn(run, state, iters=4) / K_SCAN
    return out[False], out[True]


def main():
    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}")
    rows = []
    for b, z in [(128, 16), (512, 64), (1024, 128)]:
        j, f = latent_loss_ab(b, z)
        rows.append(("latent loss+grad", b, z, j, f))
    for b, z, size, ch in [(128, 16, 28, 1), (512, 64, 28, 1),
                           (128, 64, 64, 3)]:
        j, f = full_step_ab(b, z, size, ch)
        rows.append((f"full step {size}px", b, z, j, f))
    for b, z, size, ch in [(128, 16, 28, 1), (512, 64, 28, 1),
                           (128, 64, 64, 3)]:
        j, f = full_step_scan_ab(b, z, size, ch)
        rows.append((f"scanned step {size}px", b, z, j, f))
    print("| scope | B | z | XLA µs | fused µs | speedup |")
    print("|---|---|---|---|---|---|")
    for name, b, z, j, f in rows:
        print(f"| {name} | {b} | {z} | {j:.1f} | {f:.1f} | {j / f:.2f}× |")


if __name__ == "__main__":
    main()
