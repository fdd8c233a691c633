"""Building-block layers with torch-compatible shape semantics.

The reference nets are plain torch Conv/ConvTranspose/BatchNorm stacks
(reference: code/src/models/vae.py:15-46, code/src/models/cnn.py:10-27).
Flax's ConvTranspose padding semantics differ from torch's
(padding/output_padding), so ``ConvTransposeTorch`` implements the
fractionally-strided convolution directly with ``lax.conv_general_dilated``
(lhs_dilation) and the exact torch output-size formula
out = (in-1)*stride - 2*pad + kernel + output_padding.

Everything is NHWC (TPU-native layout); convolutions hit the MXU.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch's default kaiming_uniform(a=sqrt(5)) for conv/linear kernels is a
# uniform draw with variance 1/(3*fan_in):
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class ConvTorch(nn.Module):
    """Conv2d(features, kernel, stride, padding) with torch shape semantics."""

    features: int
    kernel: int
    stride: int
    padding: int
    dtype: Dtype = jnp.float32  # compute dtype (params stay float32)

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            kernel_init=torch_kernel_init,
            dtype=self.dtype,
        )(x)


class ConvTransposeTorch(nn.Module):
    """ConvTranspose2d with torch (padding, output_padding) semantics.

    Implemented as a dilated (fractionally-strided) convolution:
    insert (stride-1) zeros between inputs, pad (kernel-1-padding) low and
    (kernel-1-padding+output_padding) high, then a stride-1 convolution.
    """

    features: int
    kernel: int
    stride: int
    padding: int
    output_padding: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s, p, op = self.kernel, self.stride, self.padding, self.output_padding
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", torch_kernel_init, (k, k, in_features, self.features),
            jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        pad_lo, pad_hi = k - 1 - p, k - 1 - p + op
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class DenseTorch(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features, kernel_init=torch_kernel_init,
                        dtype=self.dtype)(x)


def batch_norm(train: bool, name: str | None = None,
               dtype: Dtype = jnp.float32) -> nn.BatchNorm:
    """BatchNorm with torch defaults (momentum 0.1 torch == 0.9 flax, eps 1e-5).

    Under jit-with-sharding data parallelism the batch axis is logically
    global, so batch statistics are global means — XLA inserts the collective
    (this is the 'synced BN' resolution of SURVEY §2.2, exactly matching
    single-device numerics).
    """
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name, dtype=dtype)


class ConvBNReluStack(nn.Module):
    """[Conv -> BN -> ReLU]* trunk + flatten, the shared encoder/classifier
    trunk shape (reference: vae.py:15-26, cnn.py:10-21)."""

    channels: Sequence[int]
    kernel: int
    stride: int
    padding: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        for ch in self.channels:
            x = ConvTorch(ch, self.kernel, self.stride, self.padding,
                          dtype=self.dtype)(x)
            x = batch_norm(train, dtype=self.dtype)(x)
            x = nn.relu(x)
        return x.reshape((x.shape[0], -1))
