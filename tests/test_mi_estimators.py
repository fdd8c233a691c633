"""MI estimator bounds vs reference goldens (RandomState(42), see
tests/test_losses.py for the draw order)."""

import numpy as np
import jax
import jax.numpy as jnp

from clearvae_tpu.models import mi_estimators as M


def _inputs():
    rs = np.random.RandomState(42)
    mu = rs.randn(8, 4)
    logvar = rs.randn(8, 4) * 0.3
    rs.rand(8, 1, 6, 6)
    rs.rand(8, 1, 6, 6)
    rs.randn(8, 4)
    rs.randn(8, 4) * 0.3
    rs.randn(8, 5)
    rs.randn(8, 5)
    rs.randn(4, 5)
    y = rs.randn(8, 4)
    muf = jnp.asarray(mu, jnp.float32)
    lvf = jnp.tanh(jnp.asarray(logvar, jnp.float32))
    return muf, lvf, jnp.asarray(y, jnp.float32)


MU, LV, Y = _inputs()


def test_club_bound_golden():
    np.testing.assert_allclose(float(M.club_bound(MU, LV, Y)),
                               -0.9641355872154236, rtol=1e-5)


def test_club_mean_bound_golden():
    np.testing.assert_allclose(float(M.club_mean_bound(MU, Y)),
                               -0.7972995638847351, rtol=1e-5)


def test_club_sample_bound_golden():
    perm = jnp.asarray([3, 1, 0, 2, 7, 6, 5, 4])
    np.testing.assert_allclose(float(M.club_sample_bound(MU, LV, Y, perm)),
                               -1.1902104616165161, rtol=1e-5)


def test_l1out_reference_broadcast_golden():
    """Must match the reference's accidental [B,B,B] broadcast semantics
    (see module docstring of mi_estimators)."""
    np.testing.assert_allclose(float(M.l1out_bound(MU, LV, Y, True)),
                               -0.9641354084014893, rtol=1e-5)


def test_l1out_intended_differs():
    ref = float(M.l1out_bound(MU, LV, Y, True))
    loo = float(M.l1out_bound(MU, LV, Y, False))
    assert abs(ref - loo) > 1e-3  # genuinely different quantities


def test_var_ub_golden():
    np.testing.assert_allclose(float(M.var_ub_bound(MU, LV)),
                               0.4575914442539215, rtol=1e-5)


def test_loglikeli_golden():
    np.testing.assert_allclose(float(M._gaussian_loglikeli(MU, LV, Y)),
                               -10.43844223022461, rtol=1e-5)


def test_estimator_modules_run():
    """Every registered estimator initializes, bounds and learns."""
    x = jax.random.normal(jax.random.key(0), (16, 8))
    y = jax.random.normal(jax.random.key(1), (16, 8))
    for name in ["club", "club_mean", "club_sample", "l1out", "var_ub", "infonce"]:
        cls = M.MI_ESTIMATORS[name]
        mod = cls(x_dim=8, y_dim=8, hidden_size=16)
        rngs = {"params": jax.random.key(2), "shuffle": jax.random.key(3)}
        variables = mod.init(rngs, x, y)
        val = mod.apply(variables, x, y, rngs={"shuffle": jax.random.key(4)})
        ll = mod.apply(variables, x, y, method="learning_loss")
        assert np.isfinite(float(val)) and np.isfinite(float(ll)), name
