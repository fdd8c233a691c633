"""Downstream probe MLP (reference: run_styledmnist_downstream_expr.py:110-115).

Trained on the frozen VAE's ``mu_c`` only (reference trainer.py:126-127)."""

from __future__ import annotations

from flax import linen as nn

from clearvae_tpu.models.layers import DenseTorch


class ProbeMLP(nn.Module):
    n_class: int = 10
    hidden: int = 256

    @nn.compact
    def __call__(self, z, train: bool = True):
        h = DenseTorch(self.hidden)(z)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(h)
        h = nn.relu(h)
        return DenseTorch(self.n_class)(h)
