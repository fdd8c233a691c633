"""Group-evidence accumulation vs reference goldens (RandomState(42) inputs,
golden arrays from /root/reference/code/src/models/vae.py:159-190)."""

import numpy as np
import jax
import jax.numpy as jnp

from clearvae_tpu.ops.group import (
    accumulate_group_evidence,
    group_reparam,
    grouped_kl,
)

rs = np.random.RandomState(42)
MU = jnp.asarray(rs.randn(8, 4), jnp.float32)
LOGVAR = jnp.asarray(rs.randn(8, 4) * 0.3, jnp.float32)
LABEL = jnp.asarray([0, 1, 0, 2, 1, 0, 2, 3])

GOLDEN = {
    "MLVAE": (
        [[0.6329668760299683, 0.04358825460076332, 0.029734600335359573, 0.18507561087608337],
         [-0.6156235337257385, 0.03197038173675537, 0.6376538872718811, -0.4173299968242645],
         [-0.11362186074256897, -0.9634402394294739, -1.4718830585479736, -0.0875561535358429],
         [-0.6006386876106262, -0.291693776845932, -0.6017066240310669, 1.8522783517837524]],
        [[-1.1087300777435303, -1.1492011547088623, -0.9363245368003845, -1.1918312311172485],
         [-0.6104791760444641, -1.2519886493682861, -0.8741655945777893, -0.7251853942871094],
         [-1.0453990697860718, -0.8494014739990234, -0.7195919752120972, -0.3883219063282013],
         [-0.14375227689743042, -0.055697694420814514, -0.3319004774093628, -0.3588619828224182]],
    ),
    "GVAE": (
        [[0.4976295232772827, 0.059506479650735855, 0.0839330330491066, -0.12248269468545914],
         [-0.6234922409057617, 0.04005519300699234, 0.3355943560600281, -0.3224344849586487],
         [-0.1512102484703064, -0.9011788368225098, -1.4379557371139526, -0.09329473972320557],
         [-0.6006386876106262, -0.2916937470436096, -0.6017066240310669, 1.852278232574463]],
        [[0.019858837127685547, -0.005925536155700684, 0.18460988998413086, -0.02385866641998291],
         [0.0830765962600708, -0.557971715927124, -0.12021219730377197, -0.024428129196166992],
         [-0.34306997060775757, -0.15246272087097168, -0.012367844581604004, 0.30497491359710693],
         [-0.14375227689743042, -0.055697694420814514, -0.3319004774093628, -0.3588619828224182]],
    ),
}


def test_group_evidence_golden():
    for mode, (mu_g_golden, lv_g_golden) in GOLDEN.items():
        mu_g, lv_g, present = accumulate_group_evidence(MU, LOGVAR, LABEL, 4, mode)
        assert bool(jnp.all(present))
        np.testing.assert_allclose(np.asarray(mu_g), mu_g_golden, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(lv_g), lv_g_golden, rtol=1e-5, atol=1e-6)


def test_group_evidence_absent_class_masked():
    mu_g, lv_g, present = accumulate_group_evidence(MU, LOGVAR, LABEL, 6, "GVAE")
    assert present.shape == (6,)
    assert not bool(present[4]) and not bool(present[5])
    assert float(jnp.sum(jnp.abs(mu_g[4:]))) == 0.0


def test_group_reparam_uses_group_params():
    mu_g, lv_g, _ = accumulate_group_evidence(MU, LOGVAR, LABEL, 4, "GVAE")
    z = group_reparam(mu_g, lv_g, LABEL, jax.random.key(0))
    assert z.shape == (8, 4)
    # with zero variance, z must equal the group's mu exactly
    z0 = group_reparam(mu_g, jnp.full_like(lv_g, -1e10), LABEL, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(z0), np.asarray(mu_g)[np.asarray(LABEL)],
                               rtol=1e-6)


def test_grouped_kl_mean_over_present():
    mu_g, lv_g, present = accumulate_group_evidence(MU, LOGVAR, LABEL, 6, "GVAE")
    kl = grouped_kl(mu_g, lv_g, present)
    rows = -0.5 * np.sum(1 + np.asarray(lv_g[:4]) - np.asarray(mu_g[:4]) ** 2
                         - np.exp(np.asarray(lv_g[:4])), axis=-1)
    np.testing.assert_allclose(float(kl), rows.mean(), rtol=1e-5)


def test_group_evidence_jits():
    f = jax.jit(lambda m, lv, y: accumulate_group_evidence(m, lv, y, 4, "MLVAE"))
    mu_g, _, _ = f(MU, LOGVAR, LABEL)
    np.testing.assert_allclose(np.asarray(mu_g), GOLDEN["MLVAE"][0],
                               rtol=1e-5, atol=1e-6)
