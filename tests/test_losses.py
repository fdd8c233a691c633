"""Golden-value tests for the loss layer.

Golden scalars were computed by running the *reference implementation*
(/root/reference/code/src/losses.py, vae.py, mi_estimator.py) on fixed
RandomState(42) inputs; the exact generation order of the draws below must
not change.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from clearvae_tpu.ops import losses as L


def _fixed_inputs():
    rs = np.random.RandomState(42)
    mu = rs.randn(8, 4)
    logvar = rs.randn(8, 4) * 0.3
    x = rs.rand(8, 1, 6, 6)
    xh = rs.rand(8, 1, 6, 6)
    mu2 = rs.randn(8, 4)
    lv2 = rs.randn(8, 4) * 0.3
    feat = rs.randn(8, 5)
    feat_t = rs.randn(8, 5)
    w = rs.randn(4, 5)
    y = rs.randn(8, 4)
    label = np.array([0, 1, 0, 2, 1, 0, 2, 3])
    return dict(mu=mu, logvar=logvar, x=x, xh=xh, mu2=mu2, lv2=lv2,
                feat=feat, feat_t=feat_t, w=w, y=y, label=label)


I = _fixed_inputs()
f32 = lambda a: jnp.asarray(a, jnp.float32)


def test_vae_loss_golden():
    r, kc, ks = L.vae_loss(jnp.asarray(I["xh"]), jnp.asarray(I["x"]),
                           jnp.asarray(I["mu"]), jnp.asarray(I["logvar"]),
                           jnp.asarray(I["mu2"]), jnp.asarray(I["lv2"]))
    np.testing.assert_allclose(
        [float(r), float(kc), float(ks)],
        [5.781120951699443, 1.8360758411671088, 1.5828580901925982], rtol=1e-6)


SIM_GOLDEN = {
    "cosine": (2.9487223625183105, -0.5842854976654053, -0.08908817172050476),
    "l2": (-432.0174865722656, -15.731647491455078, -5.536662578582764),
    "jeffrey": (-252.73837280273438, -10.357233047485352, -2.824948787689209),
    "mahalanobis": (-473.0854797363281, -20.018310546875, -5.216800689697266),
    "modified_l2": (-481.5041809082031, -20.230865478515625, -5.3177080154418945),
}


@pytest.mark.parametrize("name", list(SIM_GOLDEN))
def test_pairwise_sim_golden(name):
    s = L.SIM_FNS[name](f32(I["mu"]), f32(I["logvar"]))
    total, e13, e52 = SIM_GOLDEN[name]
    np.testing.assert_allclose(float(jnp.sum(s)), total, rtol=2e-4)
    np.testing.assert_allclose(float(s[1, 3]), e13, rtol=1e-4)
    np.testing.assert_allclose(float(s[5, 2]), e52, rtol=1e-4)


CONTRASTIVE_GOLDEN = {
    ("cosine", False): 8.096138000488281,
    ("cosine", True): 0.13333070278167725,
    ("l2", False): 48.040199279785156,
    ("l2", True): 4.796915054321289,
    ("modified_l2", False): 53.40605926513672,
    ("modified_l2", True): 5.106261253356934,
    ("jeffrey", False): 26.715829849243164,
    ("jeffrey", True): 2.8337230682373047,
    ("mahalanobis", False): 52.685935974121094,
    ("mahalanobis", True): 4.947440147399902,
}


@pytest.mark.parametrize("sim,ps", list(CONTRASTIVE_GOLDEN))
def test_contrastive_snn_golden(sim, ps):
    val = L.contrastive_loss(f32(I["mu"]), f32(I["logvar"]),
                             jnp.asarray(I["label"]), sim_fn=sim,
                             temperature=0.1, loss_name="snn", ps=ps)
    np.testing.assert_allclose(float(val), CONTRASTIVE_GOLDEN[(sim, ps)], rtol=2e-4)


def test_supcon_golden():
    v_in = L.contrastive_loss(f32(I["mu"]), f32(I["logvar"]),
                              jnp.asarray(I["label"]), sim_fn="cosine",
                              temperature=0.5, loss_name="supcon_in")
    v_out = L.contrastive_loss(f32(I["mu"]), f32(I["logvar"]),
                               jnp.asarray(I["label"]), sim_fn="cosine",
                               temperature=0.5, loss_name="supcon_out")
    np.testing.assert_allclose(float(v_in), 2.6627748012542725, rtol=1e-4)
    np.testing.assert_allclose(float(v_out), 2.458885669708252, rtol=1e-4)


def test_contrastive_singleton_rows_filtered():
    """Labels 3 and 4 appear once: their snn rows are +inf and must be
    excluded from the mean exactly as the reference's finite mask does."""
    lbl = jnp.asarray([0, 0, 1, 1, 2, 2, 3, 4])
    val = L.contrastive_loss(f32(I["mu"]), f32(I["logvar"]), lbl,
                             sim_fn="cosine", temperature=0.1, loss_name="snn")
    np.testing.assert_allclose(float(val), 4.080741882324219, rtol=2e-4)


def test_contrastive_grads_finite_with_singletons():
    import jax
    lbl = jnp.asarray([0, 0, 1, 1, 2, 2, 3, 4])

    def f(mu):
        return L.contrastive_loss(mu, f32(I["logvar"]), lbl, sim_fn="cosine",
                                  temperature=0.1, loss_name="snn")

    grad = jax.grad(f)(f32(I["mu"]))
    assert np.isfinite(np.asarray(grad)).all()


def test_lam_loss_golden():
    val = L.lam_loss(f32(I["feat"]), f32(I["feat_t"]),
                     jnp.clip(jnp.asarray(I["label"]), 0, 3), f32(I["w"]))
    np.testing.assert_allclose(float(val), 13.688507080078125, rtol=1e-5)


def test_masked_logsumexp_empty_row():
    x = jnp.zeros((2, 3))
    mask = jnp.array([[True, False, True], [False, False, False]])
    out = L.masked_logsumexp(x, mask, axis=1)
    np.testing.assert_allclose(float(out[0]), np.log(2.0), rtol=1e-6)
    assert out[1] == -jnp.inf


def test_logistic_annealer():
    from clearvae_tpu.ops.schedules import logistic_anneal
    # reference LogisticAnnealer: beta/(1+exp(-(step-loc)/scale))
    for step in [0, 1, 5, 100]:
        w = float(logistic_anneal(step, beta=0.125, loc=0.0, scale=1.0))
        expected = 0.125 / (1 + np.exp(-step))
        np.testing.assert_allclose(w, expected, rtol=1e-6)
