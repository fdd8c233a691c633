"""Group-evidence accumulation for GVAE / ML-VAE — static shapes, no host loops.

The reference loops over the unique labels in the batch with data-dependent
shapes (reference: code/src/models/vae.py:159-223). Here evidence is
accumulated over a *fixed* class count with one-hot matmuls (MXU-friendly) and
presence masks, so the whole thing jits and shards.

Semantics parity:
  - MLVAE: precision-weighted product of member Gaussians
    (vae.py:174-180: mu_g = Σ mu·exp(-lv) · exp(-logsumexp(-lv)),
     logvar_g = -logsumexp(-lv)).
  - GVAE: mean of mus; logvar_g = logsumexp(lv) - log(n) (vae.py:181-186).
  - group reparam: each sample draws its own eps from its group's accumulated
    Gaussian (vae.py:193-223 draws eps per sample, not per group).
  - the KL over content is computed on the [n_groups, z] group params with a
    mean over *present* groups (trainer.py:344 via losses.py:36-38).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def accumulate_group_evidence(mu: Array, logvar: Array, label: Array,
                              n_classes: int, mode: str):
    """Accumulate per-class evidence over the batch.

    Returns (mu_g, logvar_g, present) with shapes
    ([n_classes, z], [n_classes, z], [n_classes] bool). Absent classes get
    zeros and present=False; callers must mask.
    """
    onehot = jax.nn.one_hot(label, n_classes, dtype=mu.dtype)  # [B, C]
    counts = jnp.sum(onehot, axis=0)  # [C]
    present = counts > 0

    # per-class logsumexp over members, via masked max-shift: [C, B, z]
    def class_lse(values):  # values: [B, z] -> [C, z]
        big_neg = jnp.finfo(values.dtype).min
        member = onehot.T[:, :, None] > 0  # [C, B, 1]
        masked = jnp.where(member, values[None, :, :], big_neg)
        m = jnp.max(masked, axis=1, keepdims=True)
        # absent classes get m = finfo.min; zero it AND use the masked values
        # inside exp so neither forward nor backward sees an inf
        m_safe = jnp.where(present[:, None, None] & jnp.isfinite(m), m, 0.0)
        e = jnp.where(member, jnp.exp(jnp.where(member, values[None, :, :],
                                                m_safe) - m_safe), 0.0)
        s = jnp.sum(e, axis=1)
        return jnp.log(jnp.where(s > 0, s, 1.0)) + jnp.squeeze(m_safe, axis=1)

    if mode == "MLVAE":
        loginvvar = -logvar
        group_loginvvar = class_lse(loginvvar)  # [C, z]
        group_mu_invvar = onehot.T @ (mu * jnp.exp(loginvvar))  # [C, z]
        mu_g = group_mu_invvar * jnp.exp(-group_loginvvar)
        logvar_g = -group_loginvvar
    elif mode == "GVAE":
        safe_counts = jnp.maximum(counts, 1.0)
        mu_g = (onehot.T @ mu) / safe_counts[:, None]
        logvar_g = class_lse(logvar) - jnp.log(safe_counts)[:, None]
    else:
        raise NotImplementedError("only support using MLVAE or GVAE")

    mu_g = jnp.where(present[:, None], mu_g, 0.0)
    logvar_g = jnp.where(present[:, None], logvar_g, 0.0)
    return mu_g, logvar_g, present


def group_reparam(mu_g: Array, logvar_g: Array, label: Array, rng) -> Array:
    """Per-sample reparameterized draw from its group's accumulated Gaussian
    (reference: vae.py:193-223, which also draws one eps per sample)."""
    mu_b = mu_g[label]          # [B, z]
    std_b = jnp.exp(0.5 * logvar_g[label])
    eps = jax.random.normal(rng, mu_b.shape, dtype=mu_b.dtype)
    return mu_b + eps * std_b


def grouped_kl(mu_g: Array, logvar_g: Array, present: Array) -> Array:
    """KL over the accumulated group params, mean over present groups
    (matches vae_loss applied to [n_groups, z] tensors, trainer.py:344)."""
    kl_rows = -0.5 * jnp.sum(1 + logvar_g - mu_g**2 - jnp.exp(logvar_g), axis=-1)
    kl_rows = jnp.where(present, kl_rows, 0.0)
    m = jnp.maximum(jnp.sum(present), 1)
    return jnp.sum(kl_rows) / m
