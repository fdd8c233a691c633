"""Fused Pallas contrastive kernel: A/B parity with the jnp reference path
(values + hand-derived gradients), run in interpreter mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clearvae_tpu.ops.losses import contrastive_loss
from clearvae_tpu.ops.pallas.fused_loss import _fused_snn, fused_contrastive_loss

rs = np.random.RandomState(0)


@pytest.mark.parametrize("b,z,ps,t", [
    (128, 8, False, 0.1), (128, 8, True, 0.1),
    (64, 32, True, 0.3), (100, 7, False, 2.0)])
def test_fused_matches_jnp(b, z, ps, t):
    mu = jnp.asarray(rs.randn(b, z), jnp.float32)
    lbl = jnp.asarray(rs.randint(0, 10, b))
    ref = contrastive_loss(mu, mu, lbl, sim_fn="cosine", temperature=t, ps=ps)
    fus = _fused_snn(mu, lbl, t, ps)
    np.testing.assert_allclose(float(fus), float(ref), rtol=1e-5)

    gref = jax.grad(lambda m: contrastive_loss(
        m, m * 0, lbl, sim_fn="cosine", temperature=t, ps=ps))(mu)
    gfus = jax.grad(lambda m: _fused_snn(m, lbl, t, ps))(mu)
    scale = float(jnp.abs(gref).max())
    np.testing.assert_allclose(np.asarray(gfus), np.asarray(gref),
                               atol=2e-5 * max(scale, 1.0), rtol=1e-3)


def test_fused_singleton_rows():
    lbl = jnp.asarray([0, 0, 1, 1, 2, 2, 3, 4] * 4)
    mu = jnp.asarray(rs.randn(32, 8), jnp.float32)
    ref = contrastive_loss(mu, mu, lbl, sim_fn="cosine", temperature=0.1)
    fus = _fused_snn(mu, lbl, 0.1, False)
    np.testing.assert_allclose(float(fus), float(ref), rtol=1e-5)
    g = jax.grad(lambda m: _fused_snn(m, lbl, 0.1, False))(mu)
    assert np.isfinite(np.asarray(g)).all()


def test_fused_fallback_other_sims():
    mu = jnp.asarray(rs.randn(16, 4), jnp.float32)
    lv = jnp.asarray(rs.randn(16, 4) * 0.1, jnp.float32)
    lbl = jnp.asarray(rs.randint(0, 4, 16))
    a = fused_contrastive_loss(mu, lv, lbl, sim_fn="l2", temperature=0.5)
    b = contrastive_loss(mu, lv, lbl, sim_fn="l2", temperature=0.5)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_fused_inside_train_step():
    """The CLEAR train step with fused=True runs and matches fused=False."""
    import optax
    from clearvae_tpu.config import AnnealConfig, ContrastiveConfig
    from clearvae_tpu.models.vae import VAE
    from clearvae_tpu.train.steps import init_vae_state, make_clear_vae_step

    model = VAE(total_z_dim=16)
    tx = optax.adam(5e-4)
    state = init_vae_state(model, tx, jax.random.key(0), 28, 1)
    x = jnp.asarray(rs.rand(16, 28, 28, 1), jnp.float32)
    lbl = jnp.asarray(rs.randint(0, 10, 16))
    outs = {}
    for fused in (True, False):
        cc = ContrastiveConfig(alpha=100.0, fused=fused)
        step = make_clear_vae_step(model, tx, AnnealConfig(), cc)
        _, m = step(state, x, lbl, jax.random.key(1))
        outs[fused] = float(m["loss"])
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-4)


@pytest.mark.parametrize("b,z,ps,t", [
    (128, 8, True, 0.1), (64, 32, False, 0.3), (100, 7, True, 2.0)])
def test_fused_clear_latent_loss_matches_jnp(b, z, ps, t):
    """The 4-term fused kernel (KL_c + KL_s + SNN + PS-SNN) matches the jnp
    path for values AND grads wrt all four latent heads."""
    from clearvae_tpu.ops.losses import vae_loss
    from clearvae_tpu.ops.pallas.fused_loss import fused_clear_latent_loss

    mu_c = jnp.asarray(rs.randn(b, z), jnp.float32)
    lv_c = jnp.asarray(rs.randn(b, z) * 0.3, jnp.float32)
    mu_s = jnp.asarray(rs.randn(b, z), jnp.float32)
    lv_s = jnp.asarray(rs.randn(b, z) * 0.3, jnp.float32)
    lbl = jnp.asarray(rs.randint(0, 10, b))
    x = jnp.zeros((b, 2, 2, 1))

    def ref_terms(mu_c, lv_c, mu_s, lv_s):
        _, kl_c, kl_s = vae_loss(x, x, mu_c, lv_c, mu_s, lv_s)
        c = contrastive_loss(mu_c, lv_c, lbl, sim_fn="cosine", temperature=t)
        s = contrastive_loss(mu_s, lv_s, lbl, sim_fn="cosine", temperature=t,
                             ps=ps)
        return kl_c, kl_s, c, s

    ref = ref_terms(mu_c, lv_c, mu_s, lv_s)
    fus = fused_clear_latent_loss(mu_c, lv_c, mu_s, lv_s, lbl,
                                  temperature=t, ps=ps)
    for a, r in zip(fus, ref):
        np.testing.assert_allclose(float(a), float(r), rtol=2e-5, atol=1e-6)

    # joint gradient through a weighted sum of all four terms
    w = (0.7, 1.3, 0.11, 0.05)

    def total(f):
        def inner(args):
            terms = f(*args)
            return sum(wi * ti for wi, ti in zip(w, terms))
        return inner

    args = (mu_c, lv_c, mu_s, lv_s)
    gref = jax.grad(total(ref_terms))(args)
    gfus = jax.grad(total(lambda *a: fused_clear_latent_loss(
        *a, lbl, temperature=t, ps=ps)))(args)
    for a, r in zip(gfus, gref):
        scale = max(float(jnp.abs(r).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=3e-5 * scale, rtol=1e-3)


def test_fused_clear_latent_loss_in_train_step():
    """fused=True (now the 4-term kernel) still matches fused=False in the
    full CLEAR step, both ps modes."""
    import optax
    from clearvae_tpu.config import AnnealConfig, ContrastiveConfig
    from clearvae_tpu.models.vae import VAE
    from clearvae_tpu.train.steps import init_vae_state, make_clear_vae_step

    model = VAE(total_z_dim=16)
    tx = optax.adam(5e-4)
    state = init_vae_state(model, tx, jax.random.key(0), 28, 1)
    x = jnp.asarray(rs.rand(16, 28, 28, 1), jnp.float32)
    lbl = jnp.asarray(rs.randint(0, 10, 16))
    for ps in (True, False):
        outs = {}
        for fused in (True, False):
            cc = ContrastiveConfig(alpha=100.0, fused=fused, ps=ps)
            step = make_clear_vae_step(model, tx, AnnealConfig(), cc)
            s2, m = step(state, x, lbl, jax.random.key(1))
            outs[fused] = (float(m["loss"]), s2.params)
        np.testing.assert_allclose(outs[True][0], outs[False][0], rtol=1e-4)
        for a, b in zip(jax.tree.leaves(outs[True][1]),
                        jax.tree.leaves(outs[False][1])):
            tol = max(1e-3 * float(jnp.abs(b).max()), 1.2e-3)
            assert float(jnp.abs(a - b).max()) <= tol


def test_pallas_style_kernel_matches_xla():
    """The fused deterministic-style kernel must match the per-style XLA
    kernels (scale included, via interpolation matmuls)."""
    from clearvae_tpu.ops import corruptions as C
    from clearvae_tpu.ops.pallas.style_kernel import (STYLE_CODES,
                                                      pallas_style_batch)

    rs2 = np.random.RandomState(7)
    imgs = (rs2.rand(7, 28, 28) * 255).astype(np.float32)
    names = ["identity", "stripe", "brightness", "inverse", "quantize",
             "contrast", "scale"]
    codes = jnp.asarray([STYLE_CODES[n] for n in names])
    out = np.asarray(pallas_style_batch(jnp.asarray(imgs), codes, severity=5))
    for i, name in enumerate(names):
        fn = C.CORRUPTION_FNS[name]
        if name in ("brightness", "quantize", "contrast", "scale"):
            expected = np.asarray(fn(imgs[i], severity=5))
        else:
            expected = np.asarray(fn(imgs[i]))
        np.testing.assert_allclose(out[i], expected, atol=0.51, err_msg=name)


def test_fused_flag_plumbs_through_trainer_hyperparameter():
    """CLEARVAETrainer(hyperparameter={'fused': True}) must reach the
    ContrastiveConfig (the public opt-in path for the Pallas kernel)."""
    import optax
    from clearvae_tpu.models.vae import VAE
    from clearvae_tpu.train.trainers import CLEARVAETrainer

    hp = {"temperature": 0.1, "alpha": 100.0, "beta": 0.125, "ps": True,
          "loc": 0, "scale": 1, "fused": True}
    t = CLEARVAETrainer(VAE(total_z_dim=16), optax.adam(5e-4),
                        sim_fn="cosine", hyperparameter=hp)
    assert t.contr_cfg.fused is True
    t2 = CLEARVAETrainer(VAE(total_z_dim=16), optax.adam(5e-4),
                         sim_fn="cosine",
                         hyperparameter={k: v for k, v in hp.items()
                                         if k != "fused"})
    assert t2.contr_cfg.fused is False
