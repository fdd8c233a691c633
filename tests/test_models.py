"""Model shape/behavior tests vs the reference layer math
(28→14→7→4, flatten 2048; 64→32→16→8→4→2, flatten 2048; reference vae.py, cnn.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clearvae_tpu.models.cnn import LAMCNN, LAMCNN64, SimpleCNN, SimpleCNN64, lam_head_weight
from clearvae_tpu.models.mlp import ProbeMLP
from clearvae_tpu.models.vae import VAE, VAE64


def _init(model, x, **kwargs):
    rngs = {"params": jax.random.key(0), "reparam": jax.random.key(1)}
    return model.init(rngs, x, **kwargs)


@pytest.mark.parametrize("cls,size,ch,z", [(VAE, 28, 1, 16), (VAE64, 64, 3, 64)])
def test_vae_shapes(cls, size, ch, z):
    m = cls(total_z_dim=z, in_channel=ch)
    x = jnp.zeros((4, size, size, ch))
    variables = _init(m, x)
    (xh, lp), muts = m.apply(variables, x, rngs={"reparam": jax.random.key(2)},
                             mutable=["batch_stats"])
    assert xh.shape == x.shape
    assert lp["mu_c"].shape == (4, z // 2)
    assert float(xh.min()) >= 0.0 and float(xh.max()) <= 1.0  # final sigmoid
    heads = m.apply(variables, x, train=False, method="encode")
    assert all(h.shape == (4, z // 2) for h in heads)


def test_vae_flatten_is_2048():
    """Encoder trunk flatten width parity (reference Dense heads take 2048)."""
    for cls, size, ch in [(VAE, 28, 1), (VAE64, 64, 3)]:
        m = cls(total_z_dim=16, in_channel=ch)
        variables = _init(m, jnp.zeros((2, size, size, ch)))
        kernel = variables["params"]["mu_c_head"]["Dense_0"]["kernel"]
        assert kernel.shape[0] == 2048


def test_vae_explicit_returns_z():
    m = VAE(total_z_dim=16)
    x = jnp.zeros((4, 28, 28, 1))
    variables = _init(m, x)
    (xh, lp, z), _ = m.apply(variables, x, explicit=True,
                             rngs={"reparam": jax.random.key(2)},
                             mutable=["batch_stats"])
    assert z.shape == (4, 16)


def test_vae_grouped_forward():
    m = VAE(total_z_dim=16, group_mode="MLVAE", n_classes=10)
    x = jnp.zeros((6, 28, 28, 1))
    label = jnp.asarray([0, 1, 0, 2, 1, 0])
    rngs = {"params": jax.random.key(0), "reparam": jax.random.key(1)}
    variables = m.init(rngs, x, label=label)
    (xh, lp), _ = m.apply(variables, x, label=label,
                          rngs={"reparam": jax.random.key(2)},
                          mutable=["batch_stats"])
    assert lp["mu_c"].shape == (10, 8)  # group params
    assert lp["present"].sum() == 3


def test_decode_only():
    m = VAE(total_z_dim=16)
    variables = _init(m, jnp.zeros((2, 28, 28, 1)))
    xh = m.apply(variables, jnp.zeros((5, 16)), train=False, method="decode")
    assert xh.shape == (5, 28, 28, 1)


@pytest.mark.parametrize("cls,size,ch,nc", [
    (SimpleCNN, 28, 1, 10), (SimpleCNN64, 64, 3, 4),
    (LAMCNN, 28, 1, 10), (LAMCNN64, 64, 3, 4)])
def test_cnn_shapes(cls, size, ch, nc):
    m = cls(n_class=nc, in_channel=ch)
    x = jnp.zeros((4, size, size, ch))
    variables = m.init({"params": jax.random.key(0)}, x)
    logits, _ = m.apply(variables, x, mutable=["batch_stats"])
    assert logits.shape == (4, nc)
    feats = m.apply(variables, x, train=False, method="features")
    assert feats.shape == (4, 2048)


def test_lam_head_weight_layout():
    m = LAMCNN(n_class=10)
    variables = m.init({"params": jax.random.key(0)}, jnp.zeros((2, 28, 28, 1)))
    w = lam_head_weight(variables["params"])
    assert w.shape == (10, 2048)  # torch [n_class, feat] layout


def test_probe_mlp():
    m = ProbeMLP(n_class=10)
    variables = m.init({"params": jax.random.key(0)}, jnp.zeros((4, 8)))
    logits, _ = m.apply(variables, jnp.zeros((4, 8)), mutable=["batch_stats"])
    assert logits.shape == (4, 10)


def test_batchnorm_updates_stats_in_train_only():
    m = VAE(total_z_dim=16)
    x = jax.random.normal(jax.random.key(5), (8, 28, 28, 1))
    variables = _init(m, x)
    _, muts = m.apply(variables, x, rngs={"reparam": jax.random.key(2)},
                      mutable=["batch_stats"])
    before = variables["batch_stats"]
    after = muts["batch_stats"]
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), before, after)
    assert max(jax.tree.leaves(diffs)) > 0


def test_vae_fused_heads_option():
    """Perf-mode fused latent heads: same shapes + same output distribution
    family (one [flat, 2z] matmul split four ways) and trains through a
    CLEAR step."""
    import jax
    import jax.numpy as jnp
    import optax

    from clearvae_tpu.config import AnnealConfig, ContrastiveConfig
    from clearvae_tpu.models.vae import VAE
    from clearvae_tpu.train.steps import init_vae_state, make_clear_vae_step

    model = VAE(total_z_dim=16, fused_heads=True)
    x = jnp.zeros((4, 28, 28, 1))
    variables = model.init({"params": jax.random.key(0),
                            "reparam": jax.random.key(1)}, x)
    assert "latent_heads" in variables["params"]
    assert "mu_c_head" not in variables["params"]
    heads = model.apply(variables, x, train=False, method="encode")
    assert all(h.shape == (4, 8) for h in heads)

    tx = optax.adam(5e-4)
    state = init_vae_state(model, tx, jax.random.key(2), 28, 1)
    step = make_clear_vae_step(model, tx, AnnealConfig(), ContrastiveConfig())
    x = jnp.asarray(np.random.RandomState(0).rand(8, 28, 28, 1), jnp.float32)
    lbl = jnp.asarray(np.arange(8) % 3)
    state, m = step(state, x, lbl, jax.random.key(3))
    assert np.isfinite(float(m["loss"]))


def test_conv1_mxu_pack_matches_convtorch():
    """Conv1MXUPack (2×2-block im2col matmul, the VERDICT-r4 MXU-underfeed
    formulation attempt) == ConvTorch(3, s2, p1) exactly — values AND
    gradients — for 28×1 and 64×3 inputs with shared kernel params."""
    from clearvae_tpu.models.layers import Conv1MXUPack, ConvTorch

    rs_ = np.random.RandomState(0)
    for cin, h in ((1, 28), (3, 64)):
        x = jnp.asarray(rs_.rand(4, h, h, cin), jnp.float32)
        ref = ConvTorch(32, 3, 2, 1)
        vref = ref.init(jax.random.key(0), x)
        pack = Conv1MXUPack(32)
        vpack = {"params": {"kernel": vref["params"]["Conv_0"]["kernel"],
                            "bias": vref["params"]["Conv_0"]["bias"]}}
        np.testing.assert_allclose(np.asarray(ref.apply(vref, x)),
                                   np.asarray(pack.apply(vpack, x)),
                                   atol=1e-5)
        g_ref = jax.grad(lambda v: jnp.sum(ref.apply(v, x) ** 2))(vref)
        g_pack = jax.grad(lambda v: jnp.sum(pack.apply(v, x) ** 2))(vpack)
        np.testing.assert_allclose(
            np.asarray(g_ref["params"]["Conv_0"]["kernel"]),
            np.asarray(g_pack["params"]["kernel"]), rtol=1e-4)

    # whole-VAE twin: first_conv_pack=True reproduces the default forward
    from clearvae_tpu.models.vae import VAE

    x = jnp.asarray(rs_.rand(4, 28, 28, 1), jnp.float32)
    base = VAE(total_z_dim=16)
    vb = base.init({"params": jax.random.key(1), "reparam": jax.random.key(0)}, x)
    packed = VAE(total_z_dim=16, first_conv_pack=True)
    vp = packed.init({"params": jax.random.key(1),
                      "reparam": jax.random.key(0)}, x)
    # graft the base params into the packed tree (only the first conv's
    # param path differs: encoder/ConvTorch_0/Conv_0 -> encoder/Conv1MXUPack_0)
    import flax

    pb = flax.core.unfreeze(vb["params"])
    # packed tree names: Conv1MXUPack_0 + ConvTorch_{0,1} (type-indexed)
    pp_enc = {"Conv1MXUPack_0": pb["encoder"]["ConvTorch_0"]["Conv_0"],
              "ConvTorch_0": pb["encoder"]["ConvTorch_1"],
              "ConvTorch_1": pb["encoder"]["ConvTorch_2"],
              **{k: v for k, v in pb["encoder"].items()
                 if k.startswith("BatchNorm")}}
    pp = {**pb, "encoder": pp_enc}
    out_b = base.apply({"params": pb, "batch_stats": vb["batch_stats"]},
                       x, train=False, method="encode")
    out_p = packed.apply({"params": pp, "batch_stats": vb["batch_stats"]},
                         x, train=False, method="encode")
    for a, b in zip(out_b, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
