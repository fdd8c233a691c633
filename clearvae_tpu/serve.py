"""Inference/serving API: a frozen, jitted session over a trained model.

The reference has no inference path beyond notebook cells calling
``vae.decode`` under ``torch.no_grad()`` (reference: code/expr/visual_utils.py,
display_utils.py). This session object packages the deployment surface:
encode (posterior heads), deterministic or sampled reconstruction, decode,
and the style/content manipulation primitives (swap, interpolate) — every
entry point jit-compiled once and reusable for batch serving.

    sess = InferenceSession.from_checkpoint(VAE(total_z_dim=16), ckpt_dir)
    mu_c, logvar_c, mu_s, logvar_s = sess.encode(x)
    x_hat = sess.reconstruct(x)                 # deterministic (mu)
    swapped = sess.swap(x_content, x_style)     # z_c from A, z_s from B
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class InferenceSession:
    def __init__(self, model, params, batch_stats):
        self.model = model
        self._vars = {"params": params, "batch_stats": batch_stats}
        self.z_dim = model.total_z_dim // 2

        @jax.jit
        def _encode(x):
            return model.apply(self._vars, x, train=False, method="encode")

        @jax.jit
        def _decode(z):
            return model.apply(self._vars, z, train=False, method="decode")

        @jax.jit
        def _sample_forward(x, rng):
            (x_hat, lp, z), _ = model.apply(
                self._vars, x, explicit=True, train=False,
                rngs={"reparam": rng}, mutable=[])
            return x_hat, z

        self._encode, self._decode = _encode, _decode
        self._sample_forward = _sample_forward

    @classmethod
    def from_checkpoint(cls, model, directory_or_path: str,
                        tx=None) -> "InferenceSession":
        """Restore the latest Orbax checkpoint saved by a trainer."""
        import optax

        from clearvae_tpu.train.steps import init_vae_state
        from clearvae_tpu.utils.checkpoint import (latest_checkpoint,
                                                   restore_checkpoint)
        import os

        path = directory_or_path
        if os.path.isdir(path) and not os.path.basename(path).startswith("step_"):
            path = latest_checkpoint(path)
        template = init_vae_state(model, tx or optax.adam(1e-3),
                                  jax.random.key(0), model.image_size,
                                  model.in_channel)
        state = restore_checkpoint(path, template)
        return cls(model, state.params, state.batch_stats)

    @classmethod
    def from_trainer(cls, trainer) -> "InferenceSession":
        return cls(trainer.model, trainer.state.params,
                   trainer.state.batch_stats)

    # ------------------------------------------------------------------

    def _canon(self, x):
        """Canonicalize image input to NHWC [B, H, W, C].

        Accepts [B,H,W,C]; [B,H,W] (grayscale batch, channel axis appended);
        [H,W,C] (single image, batch axis prepended); [H,W] (single
        grayscale). Disambiguates [X,H,W] -vs- [H,W,C] by the model's
        ``in_channel``. Anything else (e.g. torch-style NCHW) raises rather
        than silently encoding garbage."""
        x = jnp.asarray(x)
        c = self.model.in_channel
        if x.ndim == 2:
            x = x[None, :, :, None]
        elif x.ndim == 3:
            x = x[None] if x.shape[-1] == c else x[..., None]
        if x.ndim != 4 or x.shape[-1] != c:
            raise ValueError(
                f"expected NHWC images with {c} channel(s), got {x.shape} "
                "(torch-style NCHW input must be transposed)")
        return x

    def encode(self, x):
        """(mu_c, logvar_c, mu_s, logvar_s)."""
        return self._encode(self._canon(x))

    def decode(self, z):
        return self._decode(jnp.asarray(z))

    def reconstruct(self, x, sample: bool = False, seed: int = 0):
        """Deterministic (z = mu) or sampled reconstruction."""
        if sample:
            x_hat, _ = self._sample_forward(self._canon(x), jax.random.key(seed))
            return x_hat
        mu_c, _, mu_s, _ = self.encode(x)
        return self.decode(jnp.concatenate([mu_c, mu_s], axis=-1))

    def swap(self, x_content, x_style):
        """Decode (z_c from x_content, z_s from x_style) — the feature-swap
        operation behind the reference's swapping grids."""
        mu_c, _, _, _ = self.encode(x_content)
        _, _, mu_s, _ = self.encode(x_style)
        return self.decode(jnp.concatenate([mu_c, mu_s], axis=-1))

    def interpolate(self, x1, x2, num_steps: int = 11, what: str = "style"):
        """Interpolation strip between two images in one latent half."""
        from clearvae_tpu.utils.visual import interpolate_latent

        mu_c1, _, mu_s1, _ = self.encode(x1)
        mu_c2, _, mu_s2, _ = self.encode(x2)
        if what == "style":
            zi = interpolate_latent(mu_s1[0], mu_s2[0], num_steps)
            z = jnp.concatenate([jnp.repeat(mu_c1, num_steps, 0), zi], axis=-1)
        else:
            zi = interpolate_latent(mu_c1[0], mu_c2[0], num_steps)
            z = jnp.concatenate([zi, jnp.repeat(mu_s1, num_steps, 0)], axis=-1)
        return self.decode(z)
