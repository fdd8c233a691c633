"""Data-parallel correctness: the jitted CLEAR step over an 8-device CPU mesh
must match single-device numerics exactly (SURVEY §2.2 design decision:
batch-global contrastive terms are preserved under DP via GSPMD all-gather)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from clearvae_tpu.config import AnnealConfig, ContrastiveConfig
from clearvae_tpu.models.vae import VAE
from clearvae_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
from clearvae_tpu.train.steps import init_vae_state, make_clear_vae_step


@pytest.fixture(scope="module")
def setup():
    model = VAE(total_z_dim=16)
    tx = optax.adam(5e-4)
    state = init_vae_state(model, tx, jax.random.key(0), 28, 1)
    step = make_clear_vae_step(model, tx, AnnealConfig(),
                               ContrastiveConfig(alpha=100.0))
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(32, 28, 28, 1), jnp.float32)
    label = jnp.asarray(rs.randint(0, 10, 32))
    return model, tx, state, step, x, label


def test_eight_virtual_devices_available():
    assert jax.device_count() >= 8


def test_dp_matches_single_device(setup):
    model, tx, state, step, x, label = setup
    rng = jax.random.key(42)

    # single device
    s1, m1 = step(state, x, label, rng)

    # 8-device mesh: batch sharded, state replicated
    mesh = make_mesh(8)
    state_r = replicate_state(mesh, state)
    xs, ls = shard_batch(mesh, x, label)
    s8, m8 = step(state_r, xs, ls, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["c_loss"]), float(m8["c_loss"]),
                               rtol=1e-5)
    # updated parameters agree to within f32 reduction-order noise relative
    # to each tensor's scale (Adam's first step is sign-like on ~0 grads, so
    # elementwise rtol is meaningless there)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        a, b = np.asarray(a), np.asarray(b)
        tol = 1e-3 * max(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() <= max(tol, 1.2e-3), np.abs(a - b).max()


def test_dp_multiple_steps_stay_synced(setup):
    model, tx, state, step, x, label = setup
    mesh = make_mesh(8)
    s1 = state
    s8 = replicate_state(mesh, state)
    xs, ls = shard_batch(mesh, x, label)
    for i in range(3):
        rng = jax.random.key(100 + i)
        s1, m1 = step(s1, x, label, rng)
        s8, m8 = step(s8, xs, ls, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


def _tiny_ds(n=64, size=28, channels=1, seed=3):
    from clearvae_tpu.data.common import ArrayDataset
    rs = np.random.RandomState(seed)
    return ArrayDataset(rs.rand(n, size, size, channels).astype(np.float32),
                        rs.randint(0, 10, n), np.zeros(n, np.int64))


def test_scanned_epoch_on_mesh_matches_single_device():
    """The trainer fast path (scanned epoch) composes with the mesh and its
    numerics match the meshless scanned epoch (VERDICT r1 item 2)."""
    from clearvae_tpu.train.trainers import CLEARVAETrainer

    ds = _tiny_ds()
    hp = {"temperature": 0.1, "alpha": 100.0, "beta": 1 / 8, "ps": True}

    t1 = CLEARVAETrainer(VAE(total_z_dim=16), optax.adam(5e-4), "cosine", hp,
                         seed=0)
    ms1 = []
    t1._post_train_epoch = lambda ms: ms1.append(ms)
    t1.fit(2, ds, batch_size=16, use_scan=True)
    assert t1._epoch_fn is not None  # really took the scan path

    t8 = CLEARVAETrainer(VAE(total_z_dim=16), optax.adam(5e-4), "cosine", hp,
                         seed=0, mesh=make_mesh(8))
    ms8 = []
    t8._post_train_epoch = lambda ms: ms8.append(ms)
    t8.fit(2, ds, batch_size=16, use_scan=True)
    assert t8._epoch_fn is not None

    # every per-batch loss of both epochs agrees — the numerics pin
    for m1, m8 in zip(ms1, ms8):
        np.testing.assert_allclose(np.asarray(m1["loss"]),
                                   np.asarray(m8["loss"]), rtol=2e-4)
    # params agree up to f32 reduction-order noise compounded through
    # 8 Adam steps (sign-like updates on ~0 grads bound drift by ~steps*lr)
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t8.state.params)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 8 * 5e-4 * 2, np.abs(a - b).max()

    # evaluation also goes through the scanned mesh path
    mig1, mse1 = t1.evaluate(ds, batch_size=16)
    mig8, mse8 = t8.evaluate(ds, batch_size=16)
    np.testing.assert_allclose(mse1, mse8, rtol=1e-3)


def test_styled_epoch_on_mesh_matches_single_device():
    """On-the-fly in-scan styling composes with the mesh too."""
    from clearvae_tpu.config import AnnealConfig, ContrastiveConfig
    from clearvae_tpu.data.mnist import synthetic_mnist
    from clearvae_tpu.train.steps import (init_vae_state, make_clear_vae_step,
                                          make_styled_epoch_fn)

    imgs, labels = synthetic_mnist(64, seed=0)
    rs2 = np.random.RandomState(0)
    style_idx = rs2.randint(0, 6, 64).astype(np.int32)
    model = VAE(total_z_dim=16)
    tx = optax.adam(5e-4)
    step = make_clear_vae_step(model, tx, AnnealConfig(),
                               ContrastiveConfig(alpha=100.0))
    bi = jnp.asarray(np.arange(64).reshape(2, 32))
    rng = jax.random.key(5)
    args = (jnp.asarray(imgs, jnp.float32), jnp.asarray(labels),
            jnp.asarray(style_idx), jnp.asarray(np.arange(64, dtype=np.int32)))

    s1 = init_vae_state(model, tx, jax.random.key(1), 28, 1)
    _, m1 = make_styled_epoch_fn(step.core, base_seed=3)(s1, *args, bi, rng)

    mesh = make_mesh(8)
    s8 = replicate_state(mesh, init_vae_state(model, tx, jax.random.key(1),
                                              28, 1))
    sharded = shard_batch(mesh, *args)
    _, m8 = make_styled_epoch_fn(step.core, base_seed=3, mesh=mesh)(
        s8, *sharded, bi, rng)
    np.testing.assert_allclose(np.asarray(m1["loss"]), np.asarray(m8["loss"]),
                               rtol=2e-4)


def test_styled_eval_epoch_on_mesh_matches_materialized():
    """The styled EVAL scan (make_styled_eval_epoch_fn) matches the plain
    eval scan over materialized pixels, single-device and on the mesh."""
    from clearvae_tpu.config import ContrastiveConfig
    from clearvae_tpu.data.mnist import synthetic_mnist
    from clearvae_tpu.data.styled import make_styled_mnist
    from clearvae_tpu.train.steps import (init_vae_state,
                                          make_clear_vae_eval_step,
                                          make_eval_epoch_fn,
                                          make_styled_eval_epoch_fn)

    imgs, labels = synthetic_mnist(64, seed=4)
    ds = make_styled_mnist(imgs, labels, seed=4)
    model = VAE(total_z_dim=16)
    tx = optax.adam(5e-4)
    state = init_vae_state(model, tx, jax.random.key(1), 28, 1)
    eval_step = make_clear_vae_eval_step(model, ContrastiveConfig())
    bi = jnp.asarray(np.arange(64).reshape(2, 32))
    rng = jax.random.key(9)

    m_mat = make_eval_epoch_fn(eval_step)(
        state, jnp.asarray(ds.materialize()[..., None]),
        jnp.asarray(labels), bi, rng)
    styled_args = (jnp.asarray(imgs, jnp.float32), jnp.asarray(labels),
                   jnp.asarray(ds.style_idx), jnp.asarray(ds.sample_ids))
    m_otf = make_styled_eval_epoch_fn(eval_step, styles=ds.styles,
                                      base_seed=4)(state, *styled_args, bi,
                                                   rng)
    np.testing.assert_allclose(np.asarray(m_mat["recon"]),
                               np.asarray(m_otf["recon"]), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(m_mat["z_c"]),
                               np.asarray(m_otf["z_c"]), rtol=1e-3,
                               atol=1e-5)

    mesh = make_mesh(8)
    s8 = replicate_state(mesh, state)
    sharded = shard_batch(mesh, *styled_args)
    m8 = make_styled_eval_epoch_fn(eval_step, styles=ds.styles, base_seed=4,
                                   mesh=mesh)(s8, *sharded, bi, rng)
    np.testing.assert_allclose(np.asarray(m_otf["recon"]),
                               np.asarray(m8["recon"]), rtol=2e-4)


def test_epochs_per_scan_fuses_blocks():
    """fit(epochs_per_scan=k) runs k epochs per program dispatch (nested
    scan) and still advances the step counter correctly, incl. on a mesh."""
    from clearvae_tpu.train.trainers import CLEARVAETrainer

    ds = _tiny_ds()
    hp = {"temperature": 0.1, "alpha": 100.0, "beta": 1 / 8, "ps": True}
    for mesh in (None, make_mesh(8)):
        t = CLEARVAETrainer(VAE(total_z_dim=16), optax.adam(5e-4), "cosine",
                            hp, seed=0, mesh=mesh)
        t.fit(5, ds, batch_size=16, epochs_per_scan=2)
        assert int(t.state.step) == 5 * (64 // 16)  # 3 blocks: 2+2+1 epochs
        mig, mse = t.evaluate(ds, batch_size=16)
        assert np.isfinite(mse)


def test_scan_unroll_matches_unroll1():
    """fit(scan_unroll=k) only unrolls loop bookkeeping — same gathers,
    same step order — so the trained state must match the unroll=1 path up
    to float reassociation (XLA fuses across unrolled bodies), in both the
    single- and multi-epoch-per-scan programs. SGD keeps updates linear in
    the gradients: a wrong batch order or dropped step would show as O(1)
    divergence, while reassociation noise stays ~1e-6 (Adam's normalized
    updates amplify it chaotically, so it can't pin this)."""
    from clearvae_tpu.train.trainers import CLEARVAETrainer

    ds = _tiny_ds()
    hp = {"temperature": 0.1, "alpha": 100.0, "beta": 1 / 8, "ps": True}

    def run(scan_unroll, epochs_per_scan):
        t = CLEARVAETrainer(VAE(total_z_dim=16), optax.sgd(1e-3), "cosine",
                            hp, seed=0)
        t.state = t._init_state()
        init = jax.device_get(t.state.params)
        t.fit(3, ds, batch_size=16, epochs_per_scan=epochs_per_scan,
              scan_unroll=scan_unroll)
        return t.state, init

    for eps in (1, 3):
        (ref, init_params), (unrolled, _) = run(1, eps), run(2, eps)
        assert int(ref.step) == int(unrolled.step) == 3 * (64 // 16)
        moved = jax.tree.map(lambda a, b: float(np.abs(a - b).max()),
                             jax.device_get(ref.params), init_params)
        assert max(jax.tree.leaves(moved)) > 1e-4  # training actually moved
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4,
                                                    atol=1e-6),
            jax.device_get(ref.params), jax.device_get(unrolled.params))


def test_scan_gather_permute_slice_feeds_identical_batches():
    """The permute_slice mode's defining invariant, pinned EXACTLY: the
    bulk-gather-then-slice program feeds the step core bit-identical
    batches, labels and rng keys in the same order as the in-scan per-batch
    gather, for the single- and multi-epoch programs and on the mesh."""
    from clearvae_tpu.train.steps import make_epoch_fn, make_multi_epoch_fn

    rs = np.random.RandomState(0)
    data = jnp.asarray(rs.rand(64, 8, 8, 1).astype(np.float32))
    labels = jnp.asarray(rs.randint(0, 10, 64))
    rng = jax.random.key(0)

    def probe(st, xb, lb, k):
        return st, {"x_sum": jnp.sum(xb), "x00": xb[0, 0, 0, 0],
                    "lab_sum": jnp.sum(lb), "key": jax.random.bits(k)}

    bi1 = jnp.asarray(np.stack([rs.permutation(64)[:16] for _ in range(4)]))
    bi2 = jnp.asarray(np.stack([np.stack(
        [rs.permutation(64)[:16] for _ in range(4)]) for _ in range(2)]))
    for make, bi, mesh in ((make_epoch_fn, bi1, None),
                           (make_multi_epoch_fn, bi2, None),
                           (make_epoch_fn, bi1, make_mesh(8))):
        _, m_take = make(probe, mesh=mesh)(
            jnp.zeros(()), data, labels, bi, rng)
        _, m_pre = make(probe, mesh=mesh, gather="permute_slice")(
            jnp.zeros(()), data, labels, bi, rng)
        for k in m_take:
            np.testing.assert_array_equal(np.asarray(m_take[k]),
                                          np.asarray(m_pre[k]))


def test_scan_gather_permute_slice_matches_take():
    """fit(scan_gather="permute_slice") feeds bit-identical batches (pinned
    exactly above), so a short training run must land on the same params up
    to float reassociation — the bulk gather only moves XLA's fusion
    boundaries. One epoch (4 SGD steps) keeps the chaotic amplification of
    that noise through the contrastive loss below ~1e-5; longer runs drift
    multiplicatively (measured 1e-4 at 48 steps), which is why this pins a
    SHORT window and the exact-identity test above carries the real load."""
    from clearvae_tpu.train.trainers import CLEARVAETrainer

    ds = _tiny_ds()
    hp = {"temperature": 0.1, "alpha": 100.0, "beta": 1 / 8, "ps": True}

    def run(scan_gather, epochs, epochs_per_scan, mesh=None):
        t = CLEARVAETrainer(VAE(total_z_dim=16), optax.sgd(1e-3), "cosine",
                            hp, seed=0, mesh=mesh)
        t.state = t._init_state()
        init = jax.device_get(t.state.params)
        t.fit(epochs, ds, batch_size=16, epochs_per_scan=epochs_per_scan,
              scan_gather=scan_gather)
        return t.state, init

    for epochs, eps, mesh in ((1, 1, None), (2, 2, None),
                              (1, 1, make_mesh(8))):
        (ref, init_params), (pre, _) = (run("take", epochs, eps, mesh),
                                        run("permute_slice", epochs, eps,
                                            mesh))
        assert int(ref.step) == int(pre.step) == epochs * (64 // 16)
        moved = jax.tree.map(lambda a, b: float(np.abs(a - b).max()),
                             jax.device_get(ref.params), init_params)
        assert max(jax.tree.leaves(moved)) > 1e-4  # training actually moved
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4,
                                                    atol=2e-5),
            jax.device_get(ref.params), jax.device_get(pre.params))


def test_scan_gather_rejected_on_styled_path():
    """style_on_device keys corruption off per-batch sample ids, so the
    bulk-gather mode must be refused rather than silently ignored."""
    import pytest

    from clearvae_tpu.data.styled import StyledDataset
    from clearvae_tpu.train.trainers import CLEARVAETrainer

    rs = np.random.RandomState(0)
    ds = StyledDataset(rs.randint(0, 255, (32, 28, 28)).astype(np.float32),
                       rs.randint(0, 10, 32),
                       rs.randint(0, 2, 32), seed=0)
    hp = {"temperature": 0.1, "alpha": 100.0, "beta": 1 / 8, "ps": True}
    t = CLEARVAETrainer(VAE(total_z_dim=16), optax.sgd(1e-3), "cosine",
                        hp, seed=0)
    with pytest.raises(ValueError, match="scan_gather"):
        t.fit(1, ds, batch_size=16, style_on_device=True,
              scan_gather="permute_slice")


def test_custom_image_size_vae_trains_through_every_trainer():
    """Models carry image_size; a nonstandard-size VAE subclass must train
    through all four VAE trainers (VERDICT r1 item 8)."""
    from clearvae_tpu.models.factor import FactorCls
    from clearvae_tpu.models.mi_estimators import CLUBSample
    from clearvae_tpu.train.trainers import (CLEARVAETrainer,
                                             ClearMIMVAETrainer,
                                             ClearTCVAETrainer,
                                             HierarchicalVAETrainer)

    class VAE56(VAE):
        image_size: int = 56
        enc_channels: tuple = (32, 64, 128, 256)
        dec_spatial: int = 4
        dec_output_paddings: tuple = (0, 1, 1, 1)

    ds = _tiny_ds(n=32, size=56)
    hp = {"temperature": 0.1, "alpha": 10.0, "beta": 1 / 8, "ps": True,
          "lambda": 1.0}

    trainers = [
        CLEARVAETrainer(VAE56(total_z_dim=16), optax.adam(5e-4), "cosine", hp),
        HierarchicalVAETrainer(VAE56(total_z_dim=16, group_mode="MLVAE"),
                               optax.adam(5e-4), hp),
        ClearTCVAETrainer(VAE56(total_z_dim=16), FactorCls(z_dim=16),
                          {"vae_optim": optax.adam(5e-4),
                           "factor_optim": optax.adam(1e-4)}, "cosine", hp),
        ClearMIMVAETrainer(VAE56(total_z_dim=16),
                           CLUBSample(x_dim=8, y_dim=8, hidden_size=16),
                           {"vae_optim": optax.adam(5e-4),
                            "mi_estimator_optim": optax.adam(2e-3)},
                           "cosine", hp),
    ]
    for tr in trainers:
        assert tr.model.image_size == 56
        tr.fit(1, ds, batch_size=16)
        assert int(tr.state.step) == 2


@pytest.mark.parametrize("kind", ["tc", "mim"])
def test_dual_optimizer_dp_matches_single_device(kind):
    """The adversarial two-player steps (TC discriminator / MIM estimator)
    must keep DP == single-device numerics too: both phases run in one XLA
    program with batch-global terms."""
    from clearvae_tpu.config import (AnnealConfig, ContrastiveConfig,
                                     MIMConfig, TCConfig)
    from clearvae_tpu.models.factor import FactorCls
    from clearvae_tpu.models.mi_estimators import CLUBSample
    from clearvae_tpu.train.steps import (make_clear_mim_step,
                                          make_clear_tc_step)

    model = VAE(total_z_dim=16)
    tx = optax.adam(5e-4)
    anneal, contr = AnnealConfig(), ContrastiveConfig(alpha=100.0)
    if kind == "tc":
        aux = FactorCls(z_dim=16)
        state = init_vae_state(model, tx, jax.random.key(0), 28, 1,
                               aux_model=aux, aux_tx=optax.adam(1e-4),
                               aux_shapes=[(2, 16)])
        step = make_clear_tc_step(model, aux, tx, optax.adam(1e-4), anneal,
                                  contr, TCConfig())
    else:
        aux = CLUBSample(x_dim=8, y_dim=8, hidden_size=16)
        state = init_vae_state(model, tx, jax.random.key(0), 28, 1,
                               aux_model=aux, aux_tx=optax.adam(2e-3),
                               aux_shapes=[(2, 8), (2, 8)])
        step = make_clear_mim_step(model, aux, tx, optax.adam(2e-3), anneal,
                                   contr, MIMConfig())

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.rand(16, 28, 28, 1), jnp.float32)
    label = jnp.asarray(rs.randint(0, 10, 16))
    rng = jax.random.key(7)

    _, m1 = step(state, x, label, rng)

    mesh = make_mesh(8)
    xs, ls = shard_batch(mesh, x, label)
    _, m8 = step(replicate_state(mesh, state), xs, ls, rng)

    for k in m1:
        np.testing.assert_allclose(float(jnp.ravel(m1[k])[-1]),
                                   float(jnp.ravel(m8[k])[-1]),
                                   rtol=2e-4, err_msg=k)


def test_fit_style_on_device_matches_materialized():
    """fit(style_on_device=True) — the first-class on-the-fly styling path —
    reproduces the materialized path's training numerics: identical corruption
    keys/batch permutations/step rngs, so per-batch losses agree to float
    fusion tolerance and params stay within the Adam drift bound (in-scan
    styling compiles into a different XLA program, so bitwise equality is not
    expected — same bound the mesh-parity tests use)."""
    from clearvae_tpu.config import AnnealConfig, ContrastiveConfig
    from clearvae_tpu.data.mnist import synthetic_mnist
    from clearvae_tpu.data.styled import make_styled_mnist
    from clearvae_tpu.train.factories import get_clearvae_trainer
    from clearvae_tpu.train.steps import (init_vae_state, make_clear_vae_step,
                                          make_epoch_fn, make_styled_epoch_fn)

    imgs, labels = synthetic_mnist(96, seed=11)
    kw = dict(beta=1 / 8, ps=True, vae_lr=5e-4, z_dim=16, alpha=100.0,
              temperature=0.1, seed=12)

    # loss parity of one epoch, same state/rng, low level
    ds0 = make_styled_mnist(imgs, labels, seed=11)
    model = VAE(total_z_dim=16)
    tx = optax.adam(5e-4)
    step = make_clear_vae_step(model, tx, AnnealConfig(beta=1 / 8),
                               ContrastiveConfig(alpha=100.0, temperature=0.1))
    bi = jnp.asarray(np.arange(96).reshape(3, 32))
    rng = jax.random.key(7)
    s_a = init_vae_state(model, tx, jax.random.key(2), 28, 1)
    _, m_mat = make_epoch_fn(step.core)(
        s_a, jnp.asarray(ds0.materialize()[..., None]),
        jnp.asarray(labels), bi, rng)
    s_b = init_vae_state(model, tx, jax.random.key(2), 28, 1)
    _, m_otf = make_styled_epoch_fn(step.core, base_seed=11)(
        s_b, jnp.asarray(imgs, jnp.float32), jnp.asarray(labels),
        jnp.asarray(ds0.style_idx), jnp.asarray(ds0.sample_ids), bi, rng)
    np.testing.assert_allclose(np.asarray(m_mat["loss"]),
                               np.asarray(m_otf["loss"]), rtol=2e-4)

    ds_a = make_styled_mnist(imgs, labels, seed=11)
    t_mat = get_clearvae_trainer(**kw)
    t_mat.fit(2, ds_a, batch_size=32)

    ds_b = make_styled_mnist(imgs, labels, seed=11)  # fresh, never materialized
    t_otf = get_clearvae_trainer(**kw)
    t_otf.fit(2, ds_b, batch_size=32, style_on_device=True)
    assert ds_b._styled_cache is None, "style_on_device must not materialize"

    # 6 Adam steps: sign-like updates bound drift by ~steps*lr*2
    for a, b in zip(jax.tree.leaves(t_mat.state.params),
                    jax.tree.leaves(t_otf.state.params)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 6 * 5e-4 * 2, np.abs(a - b).max()

    # ArrayDataset (no raw images + style ids) must reject the flag
    from clearvae_tpu.data.celeba import synthetic_celeba

    arr = synthetic_celeba(8, seed=0)
    t_bad = get_clearvae_trainer(**kw)
    try:
        t_bad.fit(1, arr, batch_size=8, style_on_device=True)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# ---------------------------------------------------------------- tensor par.


def test_tp_param_placement_rules():
    """shard_state_tp shards conv/dense kernels + matching channel vectors
    over 'model' and replicates indivisible leaves (final in_channel=1 conv)
    and scalars — including the Adam mu/nu mirrors (ZeRO-style)."""
    from clearvae_tpu.parallel.tp import (MODEL_AXIS, make_mesh2d,
                                          shard_state_tp)

    model = VAE(total_z_dim=16)
    tx = optax.adam(5e-4)
    state = init_vae_state(model, tx, jax.random.key(0), 28, 1)
    mesh = make_mesh2d(2, 4)
    st = shard_state_tp(mesh, state)

    def axes(leaf):
        return set(a for s in leaf.sharding.spec for a in (
            (s,) if isinstance(s, str) else (s or ())))

    flat = jax.tree_util.tree_flatten_with_path(st.params)[0]
    sharded = [(p, l) for p, l in flat if MODEL_AXIS in axes(l)]
    assert len(sharded) >= 8, [jax.tree_util.keystr(p) for p, _ in flat]
    # conv kernels shard on the output-channel (last) dim
    k4 = [l for _, l in sharded if l.ndim == 4]
    assert k4 and all(l.sharding.spec[3] == MODEL_AXIS for l in k4)
    # the decoder's final conv (out-channels = in_channel = 1) replicates
    rep4 = [l for p, l in flat if l.ndim == 4 and MODEL_AXIS not in axes(l)]
    assert any(l.shape[3] == 1 for l in rep4)
    # Adam mu mirrors the param shardings
    mu_flat = jax.tree_util.tree_flatten_with_path(st.opt_state)[0]
    assert sum(MODEL_AXIS in axes(l) for _, l in mu_flat
               if hasattr(l, "sharding")) >= 2 * len(sharded)
    # the traced step counter stays replicated
    assert axes(st.step) == set()


def test_tp_matches_single_device(setup):
    """(data=2, model=4) mesh: weights sharded over 'model', batch over
    'data' — numerics must match single-device exactly like plain DP."""
    from clearvae_tpu.parallel.tp import make_mesh2d, shard_state_tp

    model, tx, state, step, x, label = setup
    rng = jax.random.key(42)
    s1, m1 = step(state, x, label, rng)

    mesh = make_mesh2d(2, 4)
    st = shard_state_tp(mesh, state)
    xs, ls = shard_batch(mesh, x, label)
    s8, m8 = step(st, xs, ls, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["c_loss"]), float(m8["c_loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        a, b = np.asarray(a), np.asarray(b)
        tol = 1e-3 * max(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() <= max(tol, 1.2e-3), np.abs(a - b).max()
    # the updated state keeps its model-axis shardings (no silent regather)
    from clearvae_tpu.parallel.tp import MODEL_AXIS
    specs = [l.sharding.spec for l in jax.tree.leaves(s8.params)
             if hasattr(l, "sharding")]
    assert any(MODEL_AXIS in [a for s in sp for a in ((s,) if isinstance(s, str)
               else (s or ()))] for sp in specs)


def test_tp_scanned_epoch_matches_single_device():
    """The scanned multi-epoch fast path composes with the 2-D mesh."""
    from clearvae_tpu.config import AnnealConfig, ContrastiveConfig
    from clearvae_tpu.parallel.tp import make_mesh2d, shard_state_tp
    from clearvae_tpu.train.steps import make_multi_epoch_fn

    model = VAE(total_z_dim=16)
    tx = optax.adam(5e-4)
    step = make_clear_vae_step(model, tx, AnnealConfig(beta=1 / 8),
                               ContrastiveConfig(alpha=100.0))
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.rand(64, 28, 28, 1), jnp.float32)
    label = jnp.asarray(rs.randint(0, 10, 64))
    bi = jnp.asarray(np.stack([np.arange(64).reshape(4, 16)] * 2))
    rng = jax.random.key(9)

    s1 = init_vae_state(model, tx, jax.random.key(2), 28, 1)
    _, m1 = make_multi_epoch_fn(step.core)(s1, x, label, bi, rng)

    mesh = make_mesh2d(4, 2)
    s8 = shard_state_tp(mesh, init_vae_state(model, tx, jax.random.key(2),
                                             28, 1))
    xs, ls = shard_batch(mesh, x, label)
    _, m8 = make_multi_epoch_fn(step.core, mesh=mesh)(s8, xs, ls, bi, rng)
    np.testing.assert_allclose(np.asarray(m1["loss"]).ravel(),
                               np.asarray(m8["loss"]).ravel(), rtol=2e-4)


def test_tp_trainer_user_path():
    """User-level TP: passing a (data, model) mesh to a Trainer TP-shards
    the state via place_state and trains/evaluates with DP-equal numerics."""
    from clearvae_tpu.parallel.tp import MODEL_AXIS, make_mesh2d
    from clearvae_tpu.train.trainers import CLEARVAETrainer

    ds = _tiny_ds()
    hp = {"temperature": 0.1, "alpha": 100.0, "beta": 1 / 8, "ps": True}

    t1 = CLEARVAETrainer(VAE(total_z_dim=16), optax.adam(5e-4), "cosine", hp,
                         seed=0)
    t1.fit(2, ds, batch_size=16, use_scan=True)

    t2 = CLEARVAETrainer(VAE(total_z_dim=16), optax.adam(5e-4), "cosine", hp,
                         seed=0, mesh=make_mesh2d(4, 2))
    t2.fit(2, ds, batch_size=16, use_scan=True)

    # params sharded over 'model' and numerics match the meshless run
    specs = [l.sharding.spec for l in jax.tree.leaves(t2.state.params)]
    assert any(MODEL_AXIS in [a for s in sp for a in ((s,) if isinstance(
        s, str) else (s or ()))] for sp in specs)
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t2.state.params)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 8 * 5e-4 * 2, np.abs(a - b).max()

    mig1, mse1 = t1.evaluate(ds, batch_size=16)
    mig2, mse2 = t2.evaluate(ds, batch_size=16)
    np.testing.assert_allclose(mse1, mse2, rtol=1e-3)


def test_non_divisible_dataset_warns_not_silent():
    """A dataset whose length doesn't divide the data axis used to fall back
    to unsharded placement with no signal (VERDICT r3 weak #7); now it warns
    while keeping numerics correct."""
    import warnings

    from clearvae_tpu.train.trainers import CLEARVAETrainer

    ds = _tiny_ds(n=60)  # 60 % 8 != 0
    hp = {"temperature": 0.1, "alpha": 100.0, "beta": 1 / 8, "ps": True}
    t8 = CLEARVAETrainer(VAE(total_z_dim=16), optax.adam(5e-4), "cosine", hp,
                         seed=0, mesh=make_mesh(8))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        t8.fit(1, ds, batch_size=15, use_scan=True)
    assert any("does not divide the data axis" in str(x.message) for x in w)

    # divisible length stays silent
    ds64 = _tiny_ds(n=64)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        t8.fit(1, ds64, batch_size=16, use_scan=True)
    assert not any("does not divide" in str(x.message) for x in w)


def test_tpu_lock_single_process_discipline(tmp_path):
    """Two TPU processes sharing the chip contaminate both runs (the r3
    two-supervisor incident); utils.lock makes the second fail fast."""
    import json as _json
    import os
    import subprocess
    import sys

    from clearvae_tpu.utils import lock as L

    path = str(tmp_path / "clearvae_tpu.lock")

    # CPU-backed process (this test suite) skips the lock entirely
    assert L.acquire_tpu_lock("t", path=path) is False
    assert not os.path.exists(path)

    # simulate a TPU-backed holder: clear the cpu markers in a child env
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORM_NAME", "CLEARVAE_TPU_NO_LOCK")}
    hold = subprocess.Popen(
        [sys.executable, "-c",
         "import sys, time; sys.path.insert(0, %r); "
         "from clearvae_tpu.utils.lock import acquire_tpu_lock; "
         "assert acquire_tpu_lock('holder', path=%r); "
         "print('held', flush=True); time.sleep(30)"
         % (os.getcwd(), path)],
        env=env, stdout=subprocess.PIPE, text=True)
    try:
        assert hold.stdout.readline().strip() == "held"
        second = subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, %r); "
             "from clearvae_tpu.utils.lock import acquire_tpu_lock; "
             "acquire_tpu_lock('second', path=%r)" % (os.getcwd(), path)],
            env=env, capture_output=True, text=True)
        assert second.returncode != 0
        assert "another TPU process holds" in second.stderr
        info = _json.load(open(path))
        assert info["label"] == "holder" and info["pid"] == hold.pid
        # the escape hatch still works
        third = subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, %r); "
             "from clearvae_tpu.utils.lock import acquire_tpu_lock; "
             "assert acquire_tpu_lock('third', path=%r) is False"
             % (os.getcwd(), path)],
            env={**env, "CLEARVAE_TPU_NO_LOCK": "1"},
            capture_output=True, text=True)
        assert third.returncode == 0, third.stderr
    finally:
        hold.kill()
        hold.wait()


def test_fit_acquires_tpu_lock(monkeypatch):
    """TrainerCore.fit and DownstreamMLPTrainer.fit take the single-TPU
    -process lock themselves (VERDICT r4 weak #5: the discipline must not
    depend on the runner having called enable_compilation_cache)."""
    import optax

    from clearvae_tpu.models.vae import VAE
    from clearvae_tpu.train.trainers import (CLEARVAETrainer,
                                             DownstreamMLPTrainer)
    from clearvae_tpu.utils import lock as L

    calls = []
    monkeypatch.setattr(L, "acquire_tpu_lock",
                        lambda label=None, path=L.LOCK_PATH:
                        calls.append(label) or False)
    hp = {"temperature": 0.1, "alpha": 100.0, "beta": 1 / 8, "ps": True}
    t = CLEARVAETrainer(VAE(total_z_dim=16), optax.adam(5e-4), "cosine", hp,
                        seed=0)
    ds = _tiny_ds(n=32)
    t.fit(1, ds, batch_size=16, use_scan=True)
    assert calls and calls[0] == "CLEARVAETrainer.fit"

    calls.clear()
    probe = DownstreamMLPTrainer(t, n_class=10, seed=0)
    probe.fit(1, ds, batch_size=16)
    assert calls and calls[0] == "DownstreamMLPTrainer.fit"


def test_checkpoint_roundtrip_dp_mesh(tmp_path):
    """Save a DP-placed (replicated) TrainState mid-campaign, restore into a
    FRESH mesh trainer, resume, and assert numeric continuation vs an
    uninterrupted run (VERDICT r4 weak #6)."""
    from clearvae_tpu.data.mnist import synthetic_mnist
    from clearvae_tpu.data.styled import make_styled_mnist
    from clearvae_tpu.train.factories import get_clearvae_trainer

    imgs, labels = synthetic_mnist(64, seed=4)
    ds = make_styled_mnist(imgs, labels, seed=4)
    kw = dict(beta=1 / 8, ps=True, vae_lr=5e-4, z_dim=16, alpha=100.0,
              temperature=0.1, seed=5)

    # uninterrupted 3-epoch run on the 8-device mesh
    ref = get_clearvae_trainer(**kw, mesh=make_mesh(8))
    ref.fit(3, ds, batch_size=16, use_scan=True)

    # interrupted twin: 2 epochs -> checkpoint (sharded state) -> fresh
    # process-level trainer restores and runs the third epoch
    t1 = get_clearvae_trainer(**kw, mesh=make_mesh(8))
    t1.fit(2, ds, batch_size=16, use_scan=True,
           checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=1)
    assert jax.tree.leaves(t1.state.params)[0].sharding.mesh.size == 8

    t2 = get_clearvae_trainer(**kw, mesh=make_mesh(8))
    t2.restore_checkpoint(str(tmp_path / "ck"))
    assert int(t2.state.step) == int(t1.state.step)
    t2.fit(1, ds, batch_size=16, use_scan=True, start_epoch=2)

    assert int(t2.state.step) == int(ref.state.step)
    for a, b in zip(jax.tree.leaves(ref.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4)


def test_checkpoint_roundtrip_tp_sharded(tmp_path):
    """Save a TP-sharded TrainState (weights + Adam state split over the
    'model' axis), restore into a fresh host-side template, re-place on the
    2-D mesh, and assert the next step matches the original's."""
    import optax

    from clearvae_tpu.config import AnnealConfig, ContrastiveConfig
    from clearvae_tpu.parallel.tp import make_mesh2d, shard_state_tp
    from clearvae_tpu.train.steps import init_vae_state, make_clear_vae_step
    from clearvae_tpu.utils.checkpoint import (latest_checkpoint,
                                               restore_checkpoint,
                                               save_checkpoint)

    model = VAE(total_z_dim=16)
    tx = optax.adam(5e-4)
    mesh2 = make_mesh2d(4, 2)
    state = shard_state_tp(
        mesh2, init_vae_state(model, tx, jax.random.key(0), 28, 1))
    step = make_clear_vae_step(model, tx, AnnealConfig(),
                               ContrastiveConfig())

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(16, 28, 28, 1), jnp.float32)
    label = jnp.asarray(rs.randint(0, 10, 16))
    state, _ = step(state, x, label, jax.random.key(1))  # one step in

    save_checkpoint(str(tmp_path / "ck"), state)
    template = init_vae_state(model, tx, jax.random.key(2), 28, 1)  # fresh
    restored = restore_checkpoint(latest_checkpoint(str(tmp_path / "ck")),
                                  template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    restored = shard_state_tp(mesh2, restored)
    s1, m1 = step(state, x, label, jax.random.key(3))
    s2, m2 = step(restored, x, label, jax.random.key(3))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)


def test_checkpoint_resume_eager_path(tmp_path):
    """start_epoch resume on the NON-scan (eager per-batch) path: the rng
    fast-forward there is per-batch, not per-block."""
    from clearvae_tpu.data.mnist import synthetic_mnist
    from clearvae_tpu.data.styled import make_styled_mnist
    from clearvae_tpu.train.factories import get_clearvae_trainer

    imgs, labels = synthetic_mnist(48, seed=4)
    ds = make_styled_mnist(imgs, labels, seed=4)
    kw = dict(beta=1 / 8, ps=True, vae_lr=5e-4, z_dim=16, alpha=100.0,
              temperature=0.1, seed=5)

    ref = get_clearvae_trainer(**kw)
    ref.fit(3, ds, batch_size=16, use_scan=False)

    t1 = get_clearvae_trainer(**kw)
    t1.fit(2, ds, batch_size=16, use_scan=False)
    t1.save_checkpoint(str(tmp_path / "ck"))
    t2 = get_clearvae_trainer(**kw)
    t2.restore_checkpoint(str(tmp_path / "ck"))
    t2.fit(1, ds, batch_size=16, use_scan=False, start_epoch=2)

    assert int(t2.state.step) == int(ref.state.step)
    for a, b in zip(jax.tree.leaves(ref.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4)
