"""Density-ratio factor classifier for CLEAR-TC-VAE
(reference: code/src/utils/trainer_utils.py:133-138 —
Linear(z, z) → ReLU → Linear(z, 1) → Sigmoid)."""

from __future__ import annotations

from flax import linen as nn

from clearvae_tpu.models.layers import DenseTorch


class FactorCls(nn.Module):
    z_dim: int  # total z dim (content + style)

    @nn.compact
    def __call__(self, z):
        h = nn.relu(DenseTorch(self.z_dim)(z))
        return nn.sigmoid(DenseTorch(1)(h))
