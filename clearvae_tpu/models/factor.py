"""Density-ratio factor classifier for CLEAR-TC-VAE
(reference: code/src/utils/trainer_utils.py:133-138 —
Linear(z, z) → ReLU → Linear(z, 1) → Sigmoid)."""

from __future__ import annotations

from flax import linen as nn

from clearvae_tpu.models.layers import DenseTorch


class FactorCls(nn.Module):
    z_dim: int  # total z dim (content + style)

    @nn.compact
    def __call__(self, z, return_logits: bool = False):
        """Density d = sigmoid(logit). ``return_logits=True`` exposes the
        pre-sigmoid logit: the reference's TC penalty log(d/(1−d))
        (trainer.py:664-673) equals the logit EXACTLY, and computing it there
        avoids the 1/(1−d) gradient blow-up once the discriminator saturates
        (observed NaN at d→1 in f32 on the 64×64 pipeline)."""
        h = nn.relu(DenseTorch(self.z_dim)(z))
        logit = DenseTorch(1)(h)
        return logit if return_logits else nn.sigmoid(logit)
