"""Twin-training parity against the reference's own torch binary
(VERDICT r4 'next round' item 1 — the strongest oracle in the container).

Imports the reference implementation READ-ONLY from /root/reference/code
(same import bench.py uses) and runs it side-by-side with this framework on
identical data, identical weights (one flax init copied into the torch VAE)
and identical reparameterization noise (the eps our step drew is derived
from its z and injected into the torch model), so that:

  stage layers     — every encoder/head/decoder sub-layer agrees to float
                     tolerance after the weight copy (maps NHWC<->NCHW,
                     flax [in,out] dense vs torch [out,in], the 2048-dim
                     flatten-order permutation, and the ConvTranspose
                     kernel layout — asserted numerically, reference
                     vae.py:15-46).
  stage first_step — the FIRST CLEAR training-step loss (recon, kl_c, kl_s,
                     c_loss, s_loss, total with the annealer at step 0) of
                     reference CLEARVAETrainer._train (trainer.py:435-493)
                     matches make_clear_vae_step's metrics to ~1e-4.
  stage gvae       — same first-step exactness for the group-evidence path
                     (GVAE and MLVAE modes, HierarchicalVAETrainer._train,
                     trainer.py:326-359, incl. the B/m group adjust).
  stage mim        — CLUBSample and L1OutUB bounds + learning losses agree
                     on identical inputs (same negative-permutation), and
                     one estimator Adam update step matches.
  stage trajectory — 10 epochs, identical batch order AND identical eps per
                     step: per-epoch loss curves overlay (committed to
                     BASELINE.md); final MIG (one shared sklearn estimator)
                     and downstream probe accuracy compared in-distribution.

Runs on CPU only (jax_platforms=cpu: torch-CPU is the oracle and the TPU
may be busy with a campaign; nothing here needs the chip).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference/code")

Z_TOTAL = 16
BATCH = 128


# ---------------------------------------------------------------------------
# weight copy: flax variables -> torch state_dict
# ---------------------------------------------------------------------------

def _flat_perm(c: int, h: int, w: int):
    """Permutation p with torch_flat[t] = flax_flat[p[t]]: torch flattens
    (C,H,W) C-major, flax flattens NHWC (H,W,C)."""
    idx = np.arange(c * h * w).reshape(h, w, c)      # flax order
    return idx.transpose(2, 0, 1).reshape(-1)        # torch order


def copy_flax_to_torch(variables, tvae, z_dim: int, spatial: int = 4):
    """Load one flax VAE init into the reference torch VAE in-place."""
    import torch

    p = variables["params"]
    bs = variables["batch_stats"]
    c0 = tvae.decoder[3].unflattened_size[0]  # 128 for VAE28
    perm = _flat_perm(c0, spatial, spatial)
    sd = {}

    # encoder: torch Sequential indices Conv(0) BN(1) ReLU(2) ...
    for i in range(len([k for k in p["encoder"] if k.startswith("ConvTorch")])):
        k = np.asarray(p["encoder"][f"ConvTorch_{i}"]["Conv_0"]["kernel"])
        sd[f"encoder.{3 * i}.weight"] = k.transpose(3, 2, 0, 1)  # HWIO->OIHW
        sd[f"encoder.{3 * i}.bias"] = np.asarray(
            p["encoder"][f"ConvTorch_{i}"]["Conv_0"]["bias"])
        sd[f"encoder.{3 * i + 1}.weight"] = np.asarray(
            p["encoder"][f"BatchNorm_{i}"]["scale"])
        sd[f"encoder.{3 * i + 1}.bias"] = np.asarray(
            p["encoder"][f"BatchNorm_{i}"]["bias"])
        sd[f"encoder.{3 * i + 1}.running_mean"] = np.asarray(
            bs["encoder"][f"BatchNorm_{i}"]["mean"])
        sd[f"encoder.{3 * i + 1}.running_var"] = np.asarray(
            bs["encoder"][f"BatchNorm_{i}"]["var"])

    # latent heads: flax [2048,z] (flax flatten order) -> torch [z,2048]
    for name in ("mu_c", "logvar_c", "mu_s", "logvar_s"):
        k = np.asarray(p[f"{name}_head"]["Dense_0"]["kernel"])  # [2048, z]
        sd[f"{name}.weight"] = k[perm, :].T
        sd[f"{name}.bias"] = np.asarray(p[f"{name}_head"]["Dense_0"]["bias"])

    # decoder Linear(2z->2048): output feature order differs the same way
    k = np.asarray(p["decoder"]["DenseTorch_0"]["Dense_0"]["kernel"])  # [2z,2048]
    sd["decoder.0.weight"] = k[:, perm].T
    sd["decoder.0.bias"] = np.asarray(
        p["decoder"]["DenseTorch_0"]["Dense_0"]["bias"])[perm]
    # BN1d over the 2048 features, same permutation
    sd["decoder.1.weight"] = np.asarray(p["decoder"]["BatchNorm_0"]["scale"])[perm]
    sd["decoder.1.bias"] = np.asarray(p["decoder"]["BatchNorm_0"]["bias"])[perm]
    sd["decoder.1.running_mean"] = np.asarray(
        bs["decoder"]["BatchNorm_0"]["mean"])[perm]
    sd["decoder.1.running_var"] = np.asarray(
        bs["decoder"]["BatchNorm_0"]["var"])[perm]

    # ConvTranspose stack: torch modules at Sequential indices 4,7,10 with
    # BNs at 5,8,11. Our ConvTransposeTorch kernel is the HWIO kernel of the
    # equivalent lhs-dilated *cross-correlation*; torch's ConvTranspose2d
    # weight [in,out,kh,kw] applies the kernel NON-flipped in the output
    # domain, which equals a cross-correlation with the spatially FLIPPED
    # kernel — so the map is flip(h,w) + HWIO->IOHW (asserted numerically in
    # stage 'layers').
    n_ct = len([k_ for k_ in p["decoder"]
                if k_.startswith("ConvTransposeTorch")])
    for i in range(n_ct):
        k = np.asarray(p["decoder"][f"ConvTransposeTorch_{i}"]["kernel"])
        sd[f"decoder.{4 + 3 * i}.weight"] = k[::-1, ::-1].transpose(2, 3, 0, 1)
        sd[f"decoder.{4 + 3 * i}.bias"] = np.asarray(
            p["decoder"][f"ConvTransposeTorch_{i}"]["bias"])
        sd[f"decoder.{5 + 3 * i}.weight"] = np.asarray(
            p["decoder"][f"BatchNorm_{i + 1}"]["scale"])
        sd[f"decoder.{5 + 3 * i}.bias"] = np.asarray(
            p["decoder"][f"BatchNorm_{i + 1}"]["bias"])
        sd[f"decoder.{5 + 3 * i}.running_mean"] = np.asarray(
            bs["decoder"][f"BatchNorm_{i + 1}"]["mean"])
        sd[f"decoder.{5 + 3 * i}.running_var"] = np.asarray(
            bs["decoder"][f"BatchNorm_{i + 1}"]["var"])

    missing = set(tvae.state_dict()) - set(sd) - {
        k_ for k_ in tvae.state_dict() if k_.endswith("num_batches_tracked")}
    assert not missing, f"unmapped torch params: {sorted(missing)[:8]}"
    tvae.load_state_dict(
        {k_: torch.from_numpy(np.ascontiguousarray(v.astype(np.float32)))
         for k_, v in sd.items()}, strict=False)
    return tvae


def make_pair(seed: int = 0, group_mode=None):
    """(flax model, variables, torch VAE with copied weights)."""
    import torch  # noqa: F401

    from clearvae_tpu.models.vae import VAE
    from src.models.vae import VAE as TorchVAE

    model = VAE(total_z_dim=Z_TOTAL, group_mode=group_mode)
    variables = model.init({"params": jax.random.key(seed),
                            "reparam": jax.random.key(0)},
                           jnp.zeros((2, 28, 28, 1)))
    tvae = TorchVAE(total_z_dim=Z_TOTAL, group_mode=group_mode)
    copy_flax_to_torch(variables, tvae, Z_TOTAL // 2)
    return model, variables, tvae


def styled_batch(n: int, seed: int = 11):
    """Images styled by OUR on-device kernels, exported for torch: the twin
    trains the reference on data our pipeline produced."""
    from clearvae_tpu.data.mnist import synthetic_mnist
    from clearvae_tpu.data.styled import make_styled_mnist

    imgs, labels = synthetic_mnist(n, seed=seed)
    ds = make_styled_mnist(imgs, labels, seed=seed)
    x = np.asarray(ds.materialize(), np.float32)[..., None] / 255.0
    return x, np.asarray(ds.labels, np.int64)


def stage_layers():
    import torch

    model, variables, tvae = make_pair()
    tvae.eval()
    x, _ = styled_batch(32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    # encoder trunk + heads (eval mode: running stats, so BN is exercised
    # through the copied running_mean/var too)
    mu_c, logvar_c, mu_s, logvar_s = model.apply(
        variables, jnp.asarray(x), train=False, method="encode")
    with torch.no_grad():
        tmu_c, tlogvar_c, tmu_s, tlogvar_s = tvae.encode(xt)
    for a, b, name in [(mu_c, tmu_c, "mu_c"), (logvar_c, tlogvar_c, "logvar_c"),
                       (mu_s, tmu_s, "mu_s"), (logvar_s, tlogvar_s, "logvar_s")]:
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=2e-5,
                                   err_msg=name)

    # decoder
    z = np.random.RandomState(3).randn(32, Z_TOTAL).astype(np.float32)
    xh = model.apply(variables, jnp.asarray(z), train=False, method="decode")
    with torch.no_grad():
        txh = tvae.decode(torch.from_numpy(z))
    np.testing.assert_allclose(np.asarray(xh).transpose(0, 3, 1, 2),
                               txh.numpy(), atol=2e-5)
    print("stage layers: encoder heads + decoder agree (atol 2e-5, eval mode)")


# ---------------------------------------------------------------------------
# eps injection: make the torch model reuse the eps our step drew
# ---------------------------------------------------------------------------

def derive_eps(model, variables, x, rng):
    """Run OUR forward exactly as make_clear_vae_step does and recover
    (z, eps_c, eps_s) from the returned z (train-mode batch stats)."""
    out, _ = model.apply(variables, jnp.asarray(x), explicit=True, train=True,
                         rngs={"reparam": rng}, mutable=["batch_stats"])
    x_hat, lp, z = out
    zd = Z_TOTAL // 2
    z_c, z_s = np.asarray(z[:, :zd]), np.asarray(z[:, zd:])
    eps_c = (z_c - np.asarray(lp["mu_c"])) / np.exp(
        0.5 * np.asarray(lp["logvar_c"]))
    eps_s = (z_s - np.asarray(lp["mu_s"])) / np.exp(
        0.5 * np.asarray(lp["logvar_s"]))
    return np.asarray(x_hat), lp, z, eps_c, eps_s


def inject_eps(tvae, eps_queue):
    """Replace tvae.sample with one that pops pre-derived eps (in the
    reference's draw order: z_c first, then z_s — vae.py:62-79)."""
    import torch

    def sample(mu, logvar):
        eps = torch.from_numpy(np.ascontiguousarray(eps_queue.pop(0)))
        return mu + eps * torch.exp(0.5 * logvar)

    tvae.sample = sample


def reference_clear_loss(tvae, xt, label_t, hyper):
    """The exact loss composition of CLEARVAETrainer._train
    (trainer.py:453-480), using the reference's own loss functions."""
    from src.losses import contrastive_loss as t_contrastive
    from src.losses import vae_loss as t_vae_loss
    from src.trainer import LogisticAnnealer

    annealer = LogisticAnnealer(loc=hyper["loc"], scale=hyper["scale"],
                                beta=hyper["beta"])
    X_hat, latent_params = tvae(xt)
    _reconstr_loss, _kl_c, _kl_s = t_vae_loss(X_hat, xt, **latent_params)
    _c_loss = t_contrastive(mu=latent_params["mu_c"],
                            logvar=latent_params["logvar_c"], label=label_t,
                            sim_fn="cosine", temperature=hyper["temperature"])
    _s_loss = t_contrastive(mu=latent_params["mu_s"],
                            logvar=latent_params["logvar_s"], label=label_t,
                            sim_fn="cosine", temperature=hyper["temperature"],
                            ps=hyper["ps"])
    if not hyper["ps"]:
        _s_loss = -_s_loss
    loss = (_reconstr_loss + annealer(_kl_c) + annealer(_kl_s)
            + hyper["alpha"] * _c_loss + hyper["alpha"] * _s_loss)
    return loss, {"recon": float(_reconstr_loss), "kl_c": float(_kl_c),
                  "kl_s": float(_kl_s), "c_loss": float(_c_loss),
                  "s_loss": float(_s_loss), "loss": float(loss)}


def stage_first_step():
    import optax
    import torch

    from clearvae_tpu.config import AnnealConfig, ContrastiveConfig
    from clearvae_tpu.train.steps import init_vae_state, make_clear_vae_step

    model, variables, tvae = make_pair()
    x, label = styled_batch(BATCH)
    rng = jax.random.key(42)

    # ours: the jitted training step's own metrics
    tx = optax.adam(5e-4)
    state = init_vae_state(model, tx, jax.random.key(0), 28, 1)
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    step = make_clear_vae_step(model, tx, AnnealConfig(beta=1 / 8),
                               ContrastiveConfig(alpha=1e2, temperature=0.1,
                                                 ps=True))
    _, metrics = step(state, jnp.asarray(x), jnp.asarray(label), rng)
    ours = {k: float(v) for k, v in metrics.items()}

    # theirs: same weights, same data, same eps (derived from our z)
    _, _, _, eps_c, eps_s = derive_eps(model, variables, x, rng)
    inject_eps(tvae, [eps_c, eps_s])
    tvae.train()
    hyper = {"temperature": 0.1, "alpha": 1e2, "beta": 1 / 8, "ps": True,
             "loc": 0, "scale": 1}
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    lt = torch.from_numpy(label)
    _, theirs = reference_clear_loss(tvae, xt, lt, hyper)

    print(f"{'term':<8} {'ours':>12} {'reference':>12} {'rel diff':>10}")
    for k in ("recon", "kl_c", "kl_s", "c_loss", "s_loss", "loss"):
        rel = abs(ours[k] - theirs[k]) / max(1e-8, abs(theirs[k]))
        print(f"{k:<8} {ours[k]:>12.6f} {theirs[k]:>12.6f} {rel:>10.2e}")
        assert rel < 1e-4, (k, ours[k], theirs[k])
    print("stage first_step: CLEAR first-step loss parity < 1e-4 rel")
    return ours, theirs


def stage_gvae():
    """First-step loss parity on the group-evidence path (GVAE and MLVAE;
    reference HierarchicalVAETrainer._train trainer.py:326-359 incl. the B/m
    group adjust, accumulate_group_evidence vae.py:159-190). Run twice: a
    batch containing all 10 classes and one with two classes absent (our
    static-shape masking vs the reference's dynamic unique())."""
    import optax
    import torch

    import src.models.vae as tvae_mod
    from clearvae_tpu.config import AnnealConfig
    from clearvae_tpu.train.steps import (init_vae_state,
                                          make_hierarchical_step)
    from src.losses import vae_loss as t_vae_loss
    from src.trainer import LogisticAnnealer

    results = {}
    for mode in ("GVAE", "MLVAE"):
        for absent, sub in (("all10", None), ("8of10", list(range(8)))):
            model, variables, tvae = make_pair(group_mode=mode)
            x, label = styled_batch(BATCH)
            if sub is not None:
                label = np.asarray(sub, np.int64)[label % len(sub)]
            rng = jax.random.key(7)

            tx = optax.adam(5e-4)
            state = init_vae_state(model, tx, jax.random.key(0), 28, 1)
            state = state.replace(params=variables["params"],
                                  batch_stats=variables["batch_stats"])
            step = make_hierarchical_step(model, tx, AnnealConfig(beta=1 / 8))
            _, metrics = step(state, jnp.asarray(x), jnp.asarray(label), rng)
            ours = {k: float(v) for k, v in metrics.items()}

            # reproduce OUR z (group-reparam'd z_c + sampled z_s) and derive
            # per-sample eps against our group params, then inject both into
            # the torch model (autograd-connected: z = mu_g[row] + eps*std_g)
            out, _ = model.apply(variables, jnp.asarray(x),
                                 label=jnp.asarray(label), explicit=True,
                                 train=True, rngs={"reparam": rng},
                                 mutable=["batch_stats"])
            _, lp, z = out
            zd = Z_TOTAL // 2
            mu_g = np.asarray(lp["mu_c"])[label]        # [B, z] via label rows
            std_g = np.exp(0.5 * np.asarray(lp["logvar_c"]))[label]
            eps_c = (np.asarray(z[:, :zd]) - mu_g) / std_g
            eps_s = ((np.asarray(z[:, zd:]) - np.asarray(lp["mu_s"]))
                     / np.exp(0.5 * np.asarray(lp["logvar_s"])))

            uniq = np.unique(label)
            rows = np.searchsorted(uniq, label)         # their sorted-group rows

            def fake_group_reparam(mu_acc, logvar_acc, g_dict,
                                   rows=rows, eps=eps_c):
                std = torch.exp(0.5 * logvar_acc)
                r = torch.from_numpy(rows)
                e = torch.from_numpy(np.ascontiguousarray(eps))
                return mu_acc[r] + e * std[r], None, None

            orig = tvae_mod.groupwise_reparam_each
            tvae_mod.groupwise_reparam_each = fake_group_reparam
            try:
                inject_eps(tvae, [eps_s])
                tvae.train()
                xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
                lt = torch.from_numpy(label)
                X_hat, latent_params = tvae(xt, label=lt)
                _reconstr, _kl_c, _kl_s = t_vae_loss(X_hat, xt,
                                                     **latent_params)
                B, m = len(label), len(uniq)
                _reconstr, _kl_s = _reconstr * B / m, _kl_s * B / m
                ann = LogisticAnnealer(loc=0, scale=1, beta=1 / 8)
                loss = _reconstr + ann(_kl_c) + ann(_kl_s)
                theirs = {"recon": float(_reconstr), "kl_c": float(_kl_c),
                          "kl_s": float(_kl_s), "loss": float(loss)}
            finally:
                tvae_mod.groupwise_reparam_each = orig

            for k in ("recon", "kl_c", "kl_s", "loss"):
                rel = abs(ours[k] - theirs[k]) / max(1e-8, abs(theirs[k]))
                assert rel < 1e-4, (mode, absent, k, ours[k], theirs[k])
            results[f"{mode}-{absent}"] = {"ours": ours, "reference": theirs}
            print(f"stage gvae [{mode} {absent}]: loss {ours['loss']:.4f} "
                  f"== {theirs['loss']:.4f} (rel<1e-4)")
    return results


def stage_tc():
    """CLEAR-TC parity: (a) the real `make_clear_tc_step`'s phase-1 metrics
    (incl. the relu(log(d/(1−d))) == relu(logit) TC penalty) vs the exact
    reference composition (trainer.py:629-676) with identical weights/eps;
    (b) the discriminator BCE on one shared z: our
    sigmoid_binary_cross_entropy-on-logits formula vs the reference's
    BCELoss(sigmoid) + factor_shuffling (trainer.py:679-699)."""
    import optax
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    from clearvae_tpu.config import (AnnealConfig, ContrastiveConfig,
                                     TCConfig)
    from clearvae_tpu.models.factor import FactorCls
    from clearvae_tpu.train.steps import (factor_shuffling, init_vae_state,
                                          make_clear_tc_step)
    from src.losses import contrastive_loss as t_contrastive
    from src.losses import vae_loss as t_vae_loss
    from src.trainer import LogisticAnnealer
    from src.trainer import factor_shuffling as t_factor_shuffling

    model, variables, tvae = make_pair()
    x, label = styled_batch(BATCH)
    rng = jax.random.key(21)

    factor = FactorCls(z_dim=Z_TOTAL)
    fparams = factor.init(jax.random.key(3),
                          jnp.zeros((2, Z_TOTAL)))["params"]
    # torch twin of the factor classifier (trainer_utils.py:133-138)
    tfactor = tnn.Sequential(tnn.Linear(Z_TOTAL, Z_TOTAL), tnn.ReLU(),
                             tnn.Linear(Z_TOTAL, 1), tnn.Sigmoid())
    tfactor.load_state_dict({
        "0.weight": torch.from_numpy(
            np.asarray(fparams["DenseTorch_0"]["Dense_0"]["kernel"]).T.copy()),
        "0.bias": torch.from_numpy(
            np.asarray(fparams["DenseTorch_0"]["Dense_0"]["bias"]).copy()),
        "2.weight": torch.from_numpy(
            np.asarray(fparams["DenseTorch_1"]["Dense_0"]["kernel"]).T.copy()),
        "2.bias": torch.from_numpy(
            np.asarray(fparams["DenseTorch_1"]["Dense_0"]["bias"]).copy()),
    })

    tx, ftx = optax.adam(5e-4), optax.adam(1e-4)
    state = init_vae_state(model, tx, jax.random.key(0), 28, 1,
                           aux_model=factor, aux_tx=ftx,
                           aux_shapes=[(2, Z_TOTAL)])
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"],
                          aux_params=fparams)
    step = make_clear_tc_step(model, factor, tx, ftx,
                              AnnealConfig(beta=1 / 8),
                              ContrastiveConfig(alpha=1e2, temperature=0.1),
                              TCConfig(la=1.0))
    _, metrics = step(state, jnp.asarray(x), jnp.asarray(label), rng)
    ours = {k: float(v) for k, v in metrics.items()}

    # (a) phase-1: same weights, same eps (the step splits rng and uses the
    # FIRST key for the vae phase — reproduce that split)
    k_vae, _ = jax.random.split(rng)
    _, _, z_ours, eps_c, eps_s = derive_eps(model, variables, x, k_vae)
    inject_eps(tvae, [eps_c, eps_s])
    tvae.train()
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    lt = torch.from_numpy(label)
    ann = LogisticAnnealer(loc=0, scale=1, beta=1 / 8)
    X_hat, latent_params, zt = tvae(xt, explicit=True)
    _reconstr, _kl_c, _kl_s = t_vae_loss(X_hat, xt, **latent_params)
    _c = t_contrastive(mu=latent_params["mu_c"],
                       logvar=latent_params["logvar_c"], label=lt,
                       sim_fn="cosine", temperature=0.1)
    d_score = tfactor(zt)
    _mi = F.relu(torch.log(d_score / (1 - d_score))).mean()
    loss = _reconstr + ann(_kl_c) + ann(_kl_s) + 1e2 * _c + 1.0 * _mi
    theirs = {"recon": float(_reconstr), "kl_c": float(_kl_c),
              "kl_s": float(_kl_s), "c_loss": float(_c),
              "mi_loss": float(_mi), "loss": float(loss)}
    for k in theirs:
        rel = abs(ours[k] - theirs[k]) / max(1e-6, abs(theirs[k]))
        assert rel < 1e-3, (k, ours[k], theirs[k])
    print(f"stage tc [phase-1 incl. relu-logit TC penalty]: loss "
          f"{ours['loss']:.4f} == {theirs['loss']:.4f}")

    # (b) discriminator BCE on one shared z (formula-level: the real step's
    # phase-2 z is internal to the fused program)
    z_shared = np.asarray(z_ours)
    l_joint = factor.apply({"params": fparams}, jnp.asarray(z_shared), True)
    l_marg = factor.apply({"params": fparams},
                          factor_shuffling(jnp.asarray(z_shared)), True)
    logits = jnp.concatenate([l_joint, l_marg], 0)
    target = jnp.concatenate([jnp.ones_like(l_joint),
                              jnp.zeros_like(l_marg)], 0)
    ours_d = float(jnp.mean(
        optax.sigmoid_binary_cross_entropy(logits, target)))
    zt2 = torch.from_numpy(z_shared)
    dj = tfactor(zt2)
    dm = tfactor(t_factor_shuffling(zt2))
    theirs_d = float(tnn.BCELoss()(
        torch.cat([dj, dm], 0),
        torch.cat([torch.ones_like(dj), torch.zeros_like(dm)], 0)))
    assert abs(ours_d - theirs_d) / abs(theirs_d) < 1e-4, (ours_d, theirs_d)
    print(f"stage tc [discriminator BCE + factor_shuffling]: "
          f"{ours_d:.6f} == {theirs_d:.6f}")
    return {"phase1": {"ours": ours, "reference": theirs},
            "disc_bce": [ours_d, theirs_d]}


def _copy_estimator(flax_params, test_module):
    """flax _MuLogvarNet params -> torch p_mu/p_logvar Sequentials."""
    import torch

    net = flax_params["net"]

    def w(n):
        return np.asarray(net[n]["Dense_0"]["kernel"]).T

    def b(n):
        return np.asarray(net[n]["Dense_0"]["bias"])

    sd = {"p_mu.0.weight": w("mu_l1"), "p_mu.0.bias": b("mu_l1"),
          "p_mu.2.weight": w("mu_l2"), "p_mu.2.bias": b("mu_l2"),
          "p_logvar.0.weight": w("lv_l1"), "p_logvar.0.bias": b("lv_l1"),
          "p_logvar.2.weight": w("lv_l2"), "p_logvar.2.bias": b("lv_l2")}
    test_module.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()})


def stage_mim():
    """MI-estimator parity on identical inputs + one estimator Adam step:
    CLUBSample (same negative permutation injected) and L1OutUB (incl. the
    [B,B,B] broadcast quirk; the reference's hard-coded .cuda() at
    mi_estimator.py:185 is bypassed by a no-op patch — documented CPU bug)."""
    import optax
    import torch

    from clearvae_tpu.models.mi_estimators import (CLUBSample, L1OutUB,
                                                   club_sample_bound,
                                                   l1out_bound)
    from src.models.mi_estimator import CLUBSample as TorchCLUBSample
    from src.models.mi_estimator import L1OutUB as TorchL1OutUB

    torch.Tensor.cuda = lambda self, *a, **k: self  # reference CPU bug bypass

    rs = np.random.RandomState(5)
    zc = rs.randn(BATCH, 8).astype(np.float32)
    zs = rs.randn(BATCH, 8).astype(np.float32)
    perm = rs.permutation(BATCH)

    # --- CLUBSample ---
    ours_mod = CLUBSample(x_dim=8, y_dim=8, hidden_size=16)
    params = ours_mod.init({"params": jax.random.key(0),
                            "shuffle": jax.random.key(1)},
                           jnp.asarray(zc), jnp.asarray(zs))["params"]
    tmod = TorchCLUBSample(x_dim=8, y_dim=8, hidden_size=16)
    _copy_estimator(params, tmod)

    # bound with the SAME permutation: drive our pure fn with the critic
    # outputs, and patch torch.randperm for theirs
    mu, logvar = ours_mod.apply({"params": params}, jnp.asarray(zc),
                                method=lambda m, x: m.net(x))
    ours_bound = float(club_sample_bound(mu, logvar, jnp.asarray(zs),
                                         jnp.asarray(perm)))
    orig_randperm = torch.randperm
    torch.randperm = lambda n: torch.from_numpy(perm)
    try:
        theirs_bound = float(tmod(torch.from_numpy(zc),
                                  torch.from_numpy(zs)))
    finally:
        torch.randperm = orig_randperm
    rel = abs(ours_bound - theirs_bound) / max(1e-8, abs(theirs_bound))
    assert rel < 1e-4, (ours_bound, theirs_bound)
    print(f"stage mim [CLUBSample bound]: {ours_bound:.6f} == "
          f"{theirs_bound:.6f}")

    # learning loss + ONE Adam estimator update on each side
    ll_ours = float(ours_mod.apply({"params": params}, jnp.asarray(zc),
                                   jnp.asarray(zs), method="learning_loss"))
    ll_theirs = float(tmod.learning_loss(torch.from_numpy(zc),
                                         torch.from_numpy(zs)))
    assert abs(ll_ours - ll_theirs) / abs(ll_theirs) < 1e-4
    print(f"stage mim [CLUBSample learning_loss]: {ll_ours:.6f} == "
          f"{ll_theirs:.6f}")

    tx = optax.adam(2e-3)
    opt_state = tx.init(params)
    g = jax.grad(lambda p: ours_mod.apply({"params": p}, jnp.asarray(zc),
                                          jnp.asarray(zs),
                                          method="learning_loss"))(params)
    updates, _ = tx.update(g, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    topt = torch.optim.Adam(tmod.parameters(), lr=2e-3)
    topt.zero_grad()
    tmod.learning_loss(torch.from_numpy(zc), torch.from_numpy(zs)).backward()
    topt.step()
    ll2_ours = float(ours_mod.apply({"params": new_params}, jnp.asarray(zc),
                                    jnp.asarray(zs), method="learning_loss"))
    ll2_theirs = float(tmod.learning_loss(torch.from_numpy(zc),
                                          torch.from_numpy(zs)))
    assert abs(ll2_ours - ll2_theirs) / abs(ll2_theirs) < 1e-3, (ll2_ours,
                                                                 ll2_theirs)
    print(f"stage mim [CLUBSample post-Adam-step loss]: {ll2_ours:.6f} == "
          f"{ll2_theirs:.6f}")

    # --- L1OutUB (broadcast quirk) ---
    ours_l1 = L1OutUB(x_dim=8, y_dim=8, hidden_size=16)
    p_l1 = ours_l1.init({"params": jax.random.key(2)}, jnp.asarray(zc),
                        jnp.asarray(zs))["params"]
    tl1 = TorchL1OutUB(x_dim=8, y_dim=8, hidden_size=16)
    _copy_estimator(p_l1, tl1)
    b_ours = float(ours_l1.apply({"params": p_l1}, jnp.asarray(zc),
                                 jnp.asarray(zs)))
    b_theirs = float(tl1(torch.from_numpy(zc), torch.from_numpy(zs)))
    assert abs(b_ours - b_theirs) / max(1e-8, abs(b_theirs)) < 1e-4, (
        b_ours, b_theirs)
    print(f"stage mim [L1OutUB bound, broadcast quirk]: {b_ours:.6f} == "
          f"{b_theirs:.6f}")
    return {"club_sample": {"bound": [ours_bound, theirs_bound],
                            "learning_loss": [ll_ours, ll_theirs],
                            "post_step_loss": [ll2_ours, ll2_theirs]},
            "l1out": {"bound": [b_ours, b_theirs]}}


def stage_trajectory(out_dir: str, epochs: int = 10, n: int = 2048):
    """Train both frameworks for ``epochs`` on identical data, identical
    init, identical batch ORDER and identical per-step eps (derived from our
    rng chain and injected into the torch model), then compare:
      - per-epoch mean loss curves (overlay committed as JSON + PNG),
      - final MIG (the reference's own losses.mutual_info_gap for BOTH
        sides' eval-mode latents — one shared estimator),
      - downstream accuracy (one shared sklearn logistic probe on mu_c).
    Residual divergence sources (documented): float reassociation across
    frameworks, and torch's unbiased (n/(n-1)) running-var update vs flax's
    biased one — eval-mode-only, ~0.4% on var at B=128."""
    import optax
    import torch
    from torch.utils.data import DataLoader  # noqa: F401

    from clearvae_tpu.config import AnnealConfig, ContrastiveConfig
    from clearvae_tpu.train.steps import init_vae_state, make_clear_vae_step
    from src.trainer import CLEARVAETrainer as TorchTrainer

    model, variables, tvae = make_pair()
    x, label = styled_batch(n)
    hyper = {"temperature": 0.1, "alpha": 1e2, "beta": 1 / 8, "ps": True,
             "loc": 0, "scale": 1}

    tx = optax.adam(5e-4)
    state = init_vae_state(model, tx, jax.random.key(0), 28, 1)
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    step = make_clear_vae_step(model, tx, AnnealConfig(beta=1 / 8),
                               ContrastiveConfig(alpha=1e2, temperature=0.1,
                                                 ps=True))

    topt = torch.optim.Adam(tvae.parameters(), lr=5e-4)
    ttrainer = TorchTrainer(tvae, topt, sim_fn="cosine", hyperparameter=hyper,
                            verbose_period=10 ** 9,
                            device=torch.device("cpu"))

    n_batches = n // BATCH
    eps_queue = []
    inject_eps(tvae, eps_queue)

    # record the reference's own per-batch postfix losses by swapping the
    # tqdm symbol in src.trainer for a recorder — _train runs verbatim
    import src.trainer as t_trainer_mod

    class RecordingBar:
        records: list = []

        def __init__(self, iterable=None, **kw):
            self.iterable = iterable

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def __iter__(self):
            return iter(self.iterable)

        def set_description(self, *a, **k):
            pass

        def set_postfix(self, **kw):
            RecordingBar.records.append(
                {k: float(v) for k, v in kw.items()})

    orig_tqdm = t_trainer_mod.tqdm
    t_trainer_mod.tqdm = RecordingBar

    ours_hist, theirs_hist = [], []
    gstep = 0
    for epoch in range(epochs):
        perm = np.random.RandomState(epoch).permutation(n)[
            : n_batches * BATCH].reshape(n_batches, BATCH)
        batches_t = []
        losses_o = []
        for bi in range(n_batches):
            xb = x[perm[bi]]
            lb = label[perm[bi]]
            rng = jax.random.fold_in(jax.random.key(123), gstep)
            # derive this step's eps from OUR pre-step state, then step ours
            _, _, _, eps_c, eps_s = derive_eps(
                model, {"params": state.params,
                        "batch_stats": state.batch_stats}, xb, rng)
            eps_queue.extend([eps_c, eps_s])
            state, metrics = step(state, jnp.asarray(xb), jnp.asarray(lb),
                                  rng)
            losses_o.append({k: float(v) for k, v in metrics.items()})
            batches_t.append((torch.from_numpy(xb.transpose(0, 3, 1, 2)),
                              torch.from_numpy(lb)))
            gstep += 1
        # run the reference trainer's OWN _train verbatim on the same epoch
        RecordingBar.records = []
        ttrainer._train(batches_t, True, epoch)
        key_map = {"recontr_loss": "recon", "kl_c": "kl_c", "kl_s": "kl_s",
                   "c_loss": "c_loss", "s_loss": "s_loss"}
        ours_hist.append({k: float(np.mean([m[k] for m in losses_o]))
                          for k in losses_o[0]})
        theirs_hist.append({key_map[k]: float(np.mean(
            [r[k] for r in RecordingBar.records]))
            for k in key_map})
    t_trainer_mod.tqdm = orig_tqdm

    # per-epoch overlay proxy: with eps injected, per-STEP losses were
    # asserted equal at step 0; across the trajectory compare the final
    # states instead (strongest form): eval-mode encoder outputs + losses.
    tvae.eval()
    mu_ours = np.asarray(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x), train=False, method="encode")[0])
    mu_s_ours = np.asarray(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x), train=False, method="encode")[2])
    with torch.no_grad():
        t_out = tvae.encode(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    mu_theirs, mu_s_theirs = t_out[0].numpy(), t_out[2].numpy()

    sd = np.std(mu_theirs) + 1e-8
    drift = np.max(np.abs(mu_ours - mu_theirs)) / sd
    mean_drift = np.mean(np.abs(mu_ours - mu_theirs)) / sd
    r = np.corrcoef(mu_ours.ravel(), mu_theirs.ravel())[0, 1]
    print(f"trajectory: {epochs} epochs x {n_batches} batches; final "
          f"eval-mode mu_c drift max={drift:.4f} mean={mean_drift:.4f} "
          f"(feature-std units), pearson r={r:.6f}")
    # eval mode includes the known BN skew (torch updates running_var with
    # the UNBIASED batch var, flax with the biased one — a systematic
    # n/(n-1) factor, not training divergence); train-mode batch-stat
    # encodings isolate the actual weight drift
    mu_tm = np.asarray(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x[:512]), train=True, method="encode",
        mutable=["batch_stats"], rngs={"reparam": jax.random.key(0)})[0][0])
    tvae.train()
    with torch.no_grad():
        mu_tm_t = tvae.encode(
            torch.from_numpy(x[:512].transpose(0, 3, 1, 2)))[0].numpy()
    tvae.eval()
    sd_tm = np.std(mu_tm_t) + 1e-8
    tm_drift = np.mean(np.abs(mu_tm - mu_tm_t)) / sd_tm
    print(f"trajectory: train-mode (batch-stat) mu_c mean drift = "
          f"{tm_drift:.4f} feature-std")

    # shared-instrument metrics
    from src.losses import mutual_info_gap

    mig_ours = float(mutual_info_gap(torch.from_numpy(label),
                                     torch.from_numpy(mu_ours),
                                     torch.from_numpy(mu_s_ours)))
    mig_theirs = float(mutual_info_gap(torch.from_numpy(label),
                                       torch.from_numpy(mu_theirs),
                                       torch.from_numpy(mu_s_theirs)))

    from sklearn.linear_model import LogisticRegression

    ntr = int(0.8 * n)
    acc = {}
    for name, feats in (("ours", mu_ours), ("reference", mu_theirs)):
        clf = LogisticRegression(max_iter=2000).fit(feats[:ntr], label[:ntr])
        acc[name] = float(clf.score(feats[ntr:], label[ntr:]))
    print(f"trajectory: MIG ours={mig_ours:.4f} ref={mig_theirs:.4f}; "
          f"probe acc ours={acc['ours']:.4f} ref={acc['reference']:.4f}")

    # overlay check: per-epoch mean recon curves must track closely (same
    # eps, so residual divergence is float accumulation only)
    rel_recon = [abs(o["recon"] - t["recon"]) / max(1.0, abs(t["recon"]))
                 for o, t in zip(ours_hist, theirs_hist)]
    print("trajectory per-epoch recon rel-diff:",
          [f"{r:.2e}" for r in rel_recon])

    result = {"epochs": epochs, "n": n,
              "per_epoch_loss_ours": ours_hist,
              "per_epoch_loss_reference": theirs_hist,
              "per_epoch_recon_rel_diff": rel_recon,
              "final_mu_c_maxabs_drift_in_feature_std": float(drift),
              "final_mu_c_mean_drift_in_feature_std": float(mean_drift),
              "final_mu_c_pearson_r": float(r),
              "train_mode_mu_c_mean_drift_in_feature_std": float(tm_drift),
              "mig": {"ours": mig_ours, "reference": mig_theirs},
              "probe_acc": acc}
    with open(os.path.join(out_dir, "trajectory.json"), "w") as f:
        json.dump(result, f, indent=1)

    # overlay PNG for BASELINE.md
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(12, 3.2))
        es = np.arange(1, epochs + 1)
        for ax, key in zip(axes, ("recon", "c_loss", "kl_c")):
            ax.plot(es, [h[key] for h in ours_hist], "o-",
                    label="clearvae_tpu", lw=2, ms=4)
            ax.plot(es, [h[key] for h in theirs_hist], "x--",
                    label="reference torch", lw=1.5, ms=6)
            ax.set_title(key)
            ax.set_xlabel("epoch")
        axes[0].legend()
        fig.suptitle("Twin training: same data/init/batch-order/eps")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "trajectory_overlay.png"), dpi=110)
        print("wrote", os.path.join(out_dir, "trajectory_overlay.png"))
    except Exception as e:  # matplotlib is present in this image; belt+braces
        print("overlay plot skipped:", e)
    return result


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="all",
                   choices=["layers", "first_step", "gvae", "tc", "mim",
                            "trajectory", "all"])
    p.add_argument("--out", default="expr_output/validation/reference_twin")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    if args.stage in ("layers", "all"):
        stage_layers()
    if args.stage in ("first_step", "all"):
        ours, theirs = stage_first_step()
        with open(os.path.join(args.out, "first_step.json"), "w") as f:
            json.dump({"ours": ours, "reference": theirs}, f, indent=1)
    if args.stage in ("gvae", "all"):
        res = stage_gvae()
        with open(os.path.join(args.out, "gvae_first_step.json"), "w") as f:
            json.dump(res, f, indent=1)
    if args.stage in ("tc", "all"):
        res = stage_tc()
        with open(os.path.join(args.out, "tc_parity.json"), "w") as f:
            json.dump(res, f, indent=1)
    if args.stage in ("mim", "all"):
        res = stage_mim()
        with open(os.path.join(args.out, "mim_parity.json"), "w") as f:
            json.dump(res, f, indent=1)
    if args.stage in ("trajectory", "all"):
        stage_trajectory(args.out)


if __name__ == "__main__":
    main()
