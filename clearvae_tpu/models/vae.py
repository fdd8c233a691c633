"""Style–content VAE models (TPU-native rebuild of reference code/src/models/vae.py).

Architecture parity with the reference:
  - ``VAE`` (28×28): conv trunk in→32→64→128 (3×3, stride 2, pad 1, BN+ReLU),
    flatten 2048, four Dense heads (mu_c, logvar_c, mu_s, logvar_s), decoder
    Dense(2z→2048)+BN+ReLU → (4,4,128) → ConvT(64,3,s2,p1,op0)→7² →
    ConvT(32,3,s2,p1,op1)→14² → ConvT(in,3,s2,p1,op1)→28², BN after every
    ConvT *including over the output channel before the final sigmoid*
    (reference: vae.py:44 — an odd but load-bearing detail we keep).
  - ``VAE64`` (64×64): 5 conv / 5 convT stages with 4×4 kernels
    (reference: vae.py:105-156).

Group-evidence accumulation (GVAE/ML-VAE) lives in
``clearvae_tpu.ops.group`` with static shapes; ``__call__(x, label=...)``
wires it in like reference vae.py:81-102.

Layout is NHWC; reparameterization noise comes from the 'reparam' RNG stream.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from clearvae_tpu.models.layers import (
    ConvBNReluStack,
    ConvTransposeTorch,
    DenseTorch,
    batch_norm,
)
from clearvae_tpu.ops.group import accumulate_group_evidence, group_reparam

Array = jax.Array


class _Decoder(nn.Module):
    """Dense → BN → ReLU → reshape → [ConvT → BN → ReLU]* → ConvT → BN → sigmoid."""

    spatial: int          # initial spatial size after unflatten (4 or 2)
    channels: Sequence[int]  # unflatten channel, then ConvT feature counts; last = in_channel
    kernel: int
    output_paddings: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        c0 = self.channels[0]
        h = DenseTorch(self.spatial * self.spatial * c0, dtype=self.dtype)(z)
        h = batch_norm(train, dtype=self.dtype)(h)
        h = nn.relu(h)
        x = h.reshape((h.shape[0], self.spatial, self.spatial, c0))
        *mid, last = self.channels[1:]
        for ch, op in zip(mid, self.output_paddings[:-1]):
            x = ConvTransposeTorch(ch, self.kernel, 2, 1, op, dtype=self.dtype)(x)
            x = batch_norm(train, dtype=self.dtype)(x)
            x = nn.relu(x)
        x = ConvTransposeTorch(last, self.kernel, 2, 1,
                               self.output_paddings[-1], dtype=self.dtype)(x)
        x = batch_norm(train, dtype=self.dtype)(x)  # BN over output channel before sigmoid (vae.py:44)
        return nn.sigmoid(x).astype(jnp.float32)


class VAE(nn.Module):
    """28×28 style–content VAE (reference: code/src/models/vae.py:7-102)."""

    total_z_dim: int
    in_channel: int = 1
    image_size: int = 28  # input spatial size (trainers init dummy shapes from it)
    group_mode: Optional[str] = None
    n_classes: int = 10  # static class count for group evidence (GVAE/MLVAE)
    # compute dtype for the conv stacks (params + heads + losses stay f32);
    # jnp.bfloat16 roughly doubles training throughput on TPU
    dtype: Any = jnp.float32
    # perf-mode option: emit all four latent heads from ONE [flat, 2·z] Dense
    # (one MXU matmul instead of four small ones) and split. Identical math
    # and init distribution (DenseTorch init depends only on fan_in), but a
    # different param tree — NOT checkpoint-compatible with the default.
    fused_heads: bool = False
    # perf experiment: first encoder conv as the 2×2-block im2col matmul
    # (layers.Conv1MXUPack — identical numerics, better MXU fill on paper;
    # bench.py `clear_28_convpack` measures whether it wins in practice)
    first_conv_pack: bool = False

    # architecture hooks overridden by VAE64
    enc_channels: Sequence[int] = (32, 64, 128)
    enc_kernel: int = 3
    dec_spatial: int = 4
    dec_kernel: int = 3
    dec_output_paddings: Sequence[int] = (0, 1, 1)

    @property
    def z_dim(self) -> int:
        return self.total_z_dim // 2

    def setup(self):
        self.encoder = ConvBNReluStack(self.enc_channels, self.enc_kernel, 2, 1,
                                       dtype=self.dtype,
                                       first_conv_pack=self.first_conv_pack)
        if self.fused_heads:
            self.latent_heads = DenseTorch(4 * self.z_dim)
        else:
            self.mu_c_head = DenseTorch(self.z_dim)
            self.logvar_c_head = DenseTorch(self.z_dim)
            self.mu_s_head = DenseTorch(self.z_dim)
            self.logvar_s_head = DenseTorch(self.z_dim)
        dec_channels = (self.enc_channels[-1],) + tuple(
            reversed(self.enc_channels[:-1])
        ) + (self.in_channel,)
        self.decoder = _Decoder(self.dec_spatial, dec_channels, self.dec_kernel,
                                self.dec_output_paddings, dtype=self.dtype)

    def encode(self, x: Array, train: bool = False):
        """(mu_c, logvar_c, mu_s, logvar_s) — reference vae.py:48-50."""
        h = self.encoder(x, train).astype(jnp.float32)
        if self.fused_heads:
            out = self.latent_heads(h)
            return tuple(jnp.split(out, 4, axis=-1))
        return (self.mu_c_head(h), self.logvar_c_head(h),
                self.mu_s_head(h), self.logvar_s_head(h))

    def decode(self, z: Array, train: bool = False) -> Array:
        return self.decoder(z, train)

    def sample(self, mu: Array, logvar: Array) -> Array:
        """Reparameterization (reference vae.py:56-60)."""
        eps = jax.random.normal(self.make_rng("reparam"), mu.shape, mu.dtype)
        return mu + eps * jnp.exp(0.5 * logvar)

    def __call__(self, x: Array, label: Optional[Array] = None,
                 explicit: bool = False, train: bool = True):
        """Forward pass (reference vae.py:81-102).

        With ``label`` given (GVAE/MLVAE), the content posterior is replaced by
        per-group accumulated evidence and z_c is drawn group-wise; the
        returned latent_params then carry [n_classes, z] group params plus a
        presence mask.
        """
        mu_c, logvar_c, mu_s, logvar_s = self.encode(x, train)

        if label is not None:
            if self.group_mode is None:
                raise ValueError("label given but group_mode is None")
            mu_g, logvar_g, present = accumulate_group_evidence(
                mu_c, logvar_c, label, self.n_classes, self.group_mode
            )
            z_c = group_reparam(mu_g, logvar_g, label, self.make_rng("reparam"))
            latent_params = {"mu_c": mu_g, "logvar_c": logvar_g,
                             "mu_s": mu_s, "logvar_s": logvar_s,
                             "present": present}
        else:
            z_c = self.sample(mu_c, logvar_c)
            latent_params = {"mu_c": mu_c, "logvar_c": logvar_c,
                             "mu_s": mu_s, "logvar_s": logvar_s}

        z_s = self.sample(mu_s, logvar_s)
        z = jnp.concatenate([z_c, z_s], axis=-1)
        x_hat = self.decode(z, train)
        if explicit:
            return x_hat, latent_params, z
        return x_hat, latent_params


class VAE64(VAE):
    """64×64 RGB variant (reference: code/src/models/vae.py:105-156)."""

    in_channel: int = 3
    image_size: int = 64
    enc_channels: Sequence[int] = (32, 64, 128, 256, 512)
    enc_kernel: int = 4
    dec_spatial: int = 2
    dec_kernel: int = 4
    dec_output_paddings: Sequence[int] = (0, 0, 0, 0, 0)
