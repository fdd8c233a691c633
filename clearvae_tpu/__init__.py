"""clearvae_tpu — a TPU-native (JAX/XLA/Pallas) style–content disentanglement framework.

A from-scratch rebuild of the capabilities of the CLEAR-VAE reference
(scotsun/clear-vae): style–content disentangling VAEs trained with
contrastive (SNN) + anti-contrastive (PS-SNN) regularizers, total-correlation
and MI-upper-bound variants, group-evidence baselines (GVAE/ML-VAE), CNN/LAM
classifier baselines, the MNIST-C styling pipeline as on-device JAX kernels,
MIG/AUC evaluation, k-style OOD experiment protocol, and latent
swapping/interpolation visualisation.

Design stance (idiomatic TPU-first, not a torch translation):
  - functional core: pure jitted train steps ``(state, batch, rng) -> (state, metrics)``
  - static shapes everywhere (group evidence via one-hot segment ops)
  - registries instead of ``eval``-based dispatch
  - data parallelism via ``jax.sharding`` over a device mesh; batch-global
    contrastive/MI terms are handled by the XLA SPMD partitioner
  - Pallas kernels for the fused contrastive loss and on-device corruption ops
"""

__version__ = "0.1.0"

from clearvae_tpu import config, registry  # noqa: F401


def __getattr__(name):
    """Lazy convenience exports: clearvae_tpu.VAE, .get_clearvae_trainer,
    .InferenceSession, ... without importing jax-heavy modules at package
    import time."""
    lazy = {
        "VAE": ("clearvae_tpu.models.vae", "VAE"),
        "VAE64": ("clearvae_tpu.models.vae", "VAE64"),
        "InferenceSession": ("clearvae_tpu.serve", "InferenceSession"),
        "get_clearvae_trainer": ("clearvae_tpu.train.factories", "get_clearvae_trainer"),
        "get_cleartcvae_trainer": ("clearvae_tpu.train.factories", "get_cleartcvae_trainer"),
        "get_clearmimvae_trainer": ("clearvae_tpu.train.factories", "get_clearmimvae_trainer"),
        "get_hierarchical_vae_trainer": ("clearvae_tpu.train.factories", "get_hierarchical_vae_trainer"),
        "get_cnn_trainer": ("clearvae_tpu.train.factories", "get_cnn_trainer"),
        "get_lamcnn_trainer": ("clearvae_tpu.train.factories", "get_lamcnn_trainer"),
        "trainer_from_config": ("clearvae_tpu.train.factories", "trainer_from_config"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'clearvae_tpu' has no attribute {name!r}")
