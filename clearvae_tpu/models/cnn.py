"""CNN classifier baselines (reference: code/src/models/cnn.py).

``SimpleCNN`` / ``SimpleCNN64``: the VAE encoder trunk + a
Dense(2048→256)+BN+ReLU+Dense(256→n_class) head.
``LAMCNN`` / ``LAMCNN64``: same trunks with a *linear* head so the LAM loss
can read the head weight (reference cnn.py:57-66).

Each module exposes ``features(x)`` (the flattened trunk output — the
reference's ``cnn.net(x)``) and ``head_kernel`` access for
``clearvae_tpu.ops.losses.lam_loss``.
"""

from __future__ import annotations

from typing import Sequence

import jax
from flax import linen as nn

from clearvae_tpu.models.layers import ConvBNReluStack, DenseTorch

Array = jax.Array


class SimpleCNN(nn.Module):
    """28×28 classifier (reference: cnn.py:7-31)."""

    n_class: int = 10
    in_channel: int = 1
    image_size: int = 28
    enc_channels: Sequence[int] = (32, 64, 128)
    enc_kernel: int = 3
    linear_head: bool = False

    def setup(self):
        self.net = ConvBNReluStack(self.enc_channels, self.enc_kernel, 2, 1)
        if self.linear_head:
            self.cls_head = DenseTorch(self.n_class)
        else:
            self.hidden = DenseTorch(256)
            self.hidden_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
            self.out = DenseTorch(self.n_class)

    def features(self, x: Array, train: bool = True) -> Array:
        return self.net(x, train)

    def head(self, h: Array, train: bool = True) -> Array:
        if self.linear_head:
            return self.cls_head(h)
        h = self.hidden(h)
        h = self.hidden_bn(h, use_running_average=not train)
        h = nn.relu(h)
        return self.out(h)

    def __call__(self, x: Array, train: bool = True) -> Array:
        return self.head(self.features(x, train), train)


class SimpleCNN64(SimpleCNN):
    """64×64 classifier (reference: cnn.py:34-54)."""

    n_class: int = 4
    in_channel: int = 3
    image_size: int = 64
    enc_channels: Sequence[int] = (32, 64, 128, 256, 512)
    enc_kernel: int = 4


class LAMCNN(SimpleCNN):
    """28×28 LAM classifier: linear head (reference: cnn.py:57-60)."""

    linear_head: bool = True


class LAMCNN64(SimpleCNN64):
    """64×64 LAM classifier: linear head (reference: cnn.py:63-66)."""

    linear_head: bool = True


def lam_head_weight(params) -> Array:
    """Extract the linear head weight in torch layout [n_class, feat] for
    ``lam_loss`` (reference reads ``cnn.cls_head.weight``, trainer.py:281)."""
    return params["cls_head"]["Dense_0"]["kernel"].T
