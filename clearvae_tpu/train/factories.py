"""Trainer factories — the de-facto public API, mirroring the reference's
``get_*_trainer`` functions and their exact hyperparameter defaults
(reference: code/src/utils/trainer_utils.py:21-201), with registries instead
of ``eval(arch_string)``.
"""

from __future__ import annotations

import optax

from clearvae_tpu.models.factor import FactorCls
from clearvae_tpu.models.mi_estimators import MI_ESTIMATORS
from clearvae_tpu.registry import MODELS
from clearvae_tpu.train.trainers import (
    CLEARVAETrainer,
    ClearMIMVAETrainer,
    ClearTCVAETrainer,
    HierarchicalVAETrainer,
    LAMCNNTrainer,
    SimpleCNNTrainer,
)


def get_cnn_trainer(n_class, cnn_arch: str = "SimpleCNNClassifier",
                    in_channel: int = 1, verbose_period: int = 5,
                    seed: int = 0, mesh=None, **_):
    """reference trainer_utils.py:21-34 (Adam lr 1e-4)."""
    cnn = MODELS[cnn_arch](n_class=n_class, in_channel=in_channel)
    return SimpleCNNTrainer(cnn, optax.adam(1e-4), verbose_period, seed, mesh)


def get_lamcnn_trainer(n_class, lam_coef, cnn_arch: str = "LAMCNNClassifier",
                       in_channel: int = 1, verbose_period: int = 5,
                       seed: int = 0, mesh=None, **_):
    """reference trainer_utils.py:37-56."""
    cnn = MODELS[cnn_arch](n_class=n_class, in_channel=in_channel)
    return LAMCNNTrainer(cnn, optax.adam(1e-4), {"lam_coef": lam_coef},
                         verbose_period, seed, mesh)


def get_hierarchical_vae_trainer(beta, vae_lr, z_dim, group_mode,
                                 vae_arch: str = "VAE", in_channel: int = 1,
                                 verbose_period: int = 5, seed: int = 0,
                                 mesh=None, n_classes: int = 10,
                                 vae_kwargs: dict | None = None,
                                 mig_backend: str = "auto", **_):
    """reference trainer_utils.py:59-84."""
    vae = MODELS[vae_arch](total_z_dim=z_dim, in_channel=in_channel,
                           group_mode=group_mode, n_classes=n_classes,
                           **(vae_kwargs or {}))
    return HierarchicalVAETrainer(
        vae, optax.adam(vae_lr),
        hyperparameter={"beta": beta, "scale": 1, "loc": 0},
        verbose_period=verbose_period, seed=seed, mesh=mesh,
        mig_backend=mig_backend)


def get_clearvae_trainer(beta, ps, vae_lr, z_dim, alpha, temperature,
                         vae_arch: str = "VAE", in_channel: int = 1,
                         verbose_period: int = 5, seed: int = 0, mesh=None,
                         sim_fn: str = "cosine",
                         vae_kwargs: dict | None = None,
                         mig_backend: str = "auto", **_):
    """reference trainer_utils.py:87-116 (sim_fn='cosine').

    ``vae_kwargs`` forwards extra model fields (e.g. perf-mode
    ``{"dtype": jnp.bfloat16, "fused_heads": True}``)."""
    vae = MODELS[vae_arch](total_z_dim=z_dim, in_channel=in_channel,
                           **(vae_kwargs or {}))
    return CLEARVAETrainer(
        vae, optax.adam(vae_lr), sim_fn=sim_fn,
        hyperparameter={"temperature": temperature, "alpha": alpha,
                        "beta": beta, "ps": ps, "loc": 0, "scale": 1},
        verbose_period=verbose_period, seed=seed, mesh=mesh,
        mig_backend=mig_backend)


def get_cleartcvae_trainer(beta, la, vae_lr, factor_cls_lr, z_dim, alpha,
                           temperature, vae_arch: str = "VAE",
                           in_channel: int = 1, verbose_period: int = 5,
                           seed: int = 0, mesh=None,
                           vae_kwargs: dict | None = None,
                           mig_backend: str = "auto", **_):
    """reference trainer_utils.py:119-157."""
    vae = MODELS[vae_arch](total_z_dim=z_dim, in_channel=in_channel,
                           **(vae_kwargs or {}))
    factor_cls = FactorCls(z_dim=z_dim)
    return ClearTCVAETrainer(
        vae, factor_cls,
        optimizers={"vae_optim": optax.adam(vae_lr),
                    "factor_optim": optax.adam(factor_cls_lr)},
        sim_fn="cosine",
        hyperparameter={"temperature": temperature, "alpha": alpha,
                        "beta": beta, "loc": 0, "scale": 1, "lambda": la},
        verbose_period=verbose_period, seed=seed, mesh=mesh,
        mig_backend=mig_backend)


def get_clearmimvae_trainer(beta, mi_estimator: str, la, vae_lr,
                            mi_estimator_lr, z_dim, alpha, temperature,
                            vae_arch: str = "VAE", in_channel: int = 1,
                            verbose_period: int = 5, seed: int = 0, mesh=None,
                            vae_kwargs: dict | None = None,
                            mig_backend: str = "auto", **_):
    """reference trainer_utils.py:160-201 (estimator sized
    x_dim=y_dim=z_dim//2, hidden=z_dim)."""
    vae = MODELS[vae_arch](total_z_dim=z_dim, in_channel=in_channel,
                           **(vae_kwargs or {}))
    est = MI_ESTIMATORS[mi_estimator](x_dim=z_dim // 2, y_dim=z_dim // 2,
                                      hidden_size=z_dim)
    return ClearMIMVAETrainer(
        vae, est,
        optimizers={"vae_optim": optax.adam(vae_lr),
                    "mi_estimator_optim": optax.adam(mi_estimator_lr)},
        sim_fn="cosine",
        hyperparameter={"temperature": temperature, "beta": beta, "loc": 0,
                        "scale": 1, "alpha": alpha, "lambda": la},
        verbose_period=verbose_period, seed=seed, mesh=mesh,
        mig_backend=mig_backend)


def trainer_from_config(cfg):
    """Build a trainer from a typed ClearVAEConfig (the structured alternative
    to the reference's stringly dicts). Dispatches on which optional section
    is present: tc → CLEAR-TC, mim → CLEAR-MIM, else plain CLEAR."""
    common = dict(
        beta=cfg.anneal.beta, vae_lr=cfg.optim.lr,
        z_dim=cfg.model.total_z_dim, alpha=cfg.contrastive.alpha,
        temperature=cfg.contrastive.temperature,
        vae_arch="VAE" if cfg.model.arch == "vae28" else "VAE64",
        in_channel=cfg.model.in_channel, seed=cfg.train.seed,
        verbose_period=cfg.train.verbose_period,
        sim_fn=cfg.contrastive.sim_fn,
    )
    if cfg.model.group_mode:
        common.pop("alpha"); common.pop("temperature"); common.pop("sim_fn")
        return get_hierarchical_vae_trainer(group_mode=cfg.model.group_mode,
                                            n_classes=cfg.train.n_classes,
                                            **common)
    if cfg.tc is not None:
        common.pop("sim_fn")
        return get_cleartcvae_trainer(la=cfg.tc.la,
                                      factor_cls_lr=cfg.tc.factor_cls_lr,
                                      **common)
    if cfg.mim is not None:
        common.pop("sim_fn")
        return get_clearmimvae_trainer(mi_estimator=cfg.mim.estimator,
                                       la=cfg.mim.la,
                                       mi_estimator_lr=cfg.mim.mi_estimator_lr,
                                       **common)
    return get_clearvae_trainer(ps=cfg.contrastive.ps, **common)
