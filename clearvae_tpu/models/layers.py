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
    # perf-mode option: compute the first (most MXU-underfilled) conv as the
    # 2×2-block im2col matmul (Conv1MXUPack). Only valid for the 3×3/s2/p1
    # trunk shape; numerically identical, different param tree path name.
    first_conv_pack: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i, ch in enumerate(self.channels):
            if (self.first_conv_pack and i == 0 and self.kernel == 3
                    and self.stride == 2 and self.padding == 1):
                x = Conv1MXUPack(ch, dtype=self.dtype)(x)
            else:
                x = ConvTorch(ch, self.kernel, self.stride, self.padding,
                              dtype=self.dtype)(x)
            x = batch_norm(train, dtype=self.dtype)(x)
            x = nn.relu(x)
        return x.reshape((x.shape[0], -1))


class Conv1MXUPack(nn.Module):
    """The stride-2 3×3 first conv computed as a 2×2-output-block im2col
    matmul (VERDICT r4 weak #1: the 28×28×`cin` first conv is a
    [B·196, 9·cin]×[9·cin, 32] matmul that fills the 128×128 MXU K-dim
    9/128 and N-dim 32/128). Computing a 2×2 block of outputs jointly from
    its shared 5×5 input patch turns it into [B·49, 25·cin]×[25·cin, 128]:
    K 9→25 (×2.8) and N 32→128 (full), at 2.8× the FLOPs — a net MXU-fill
    win iff the systolic array was the bottleneck (measured in bench.py's
    `clear_28_convpack` row; see BASELINE.md for the A/B verdict). The
    backward pass shapes improve too: dW is [25·cin, B·49]-reduced (K huge)
    and dX is [B·49,128]×[128,25·cin].

    Numerically identical to ConvTorch(features, 3, 2, 1) with the same
    kernel (up to float summation order); param shapes match ConvTorch's
    nn.Conv ({kernel [3,3,cin,F], bias [F]}) so weights are transferable.
    Requires H == W, H even, H/2 even (28 and 64 qualify)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        assert h == w and h % 4 == 0, (h, w)
        out_h = h // 2
        nb = out_h // 2
        kernel = self.param("kernel", torch_kernel_init,
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        # 5×5-patch tensor per 2×2 output block: [B, nb, nb, 5, 5, cin]
        rows = []
        for pr in range(5):
            cols = []
            for pc in range(5):
                cols.append(xp[:, pr:pr + 4 * nb - 3:4,
                               pc:pc + 4 * nb - 3:4, :])
            rows.append(jnp.stack(cols, axis=-2))
        patches = jnp.stack(rows, axis=-3).reshape(b, nb, nb, 25 * cin)
        # packed weight: W2[(pr,pc,cin), (dy,dx,F)] = K[ky,kx,cin,F] at
        # pr = 2·dy+ky, pc = 2·dx+kx (zeros elsewhere) — built from the
        # same logical kernel param, so gradients flow through it
        W2 = jnp.zeros((5, 5, cin, 2, 2, self.features), kernel.dtype)
        for dy in range(2):
            for dx in range(2):
                W2 = W2.at[2 * dy:2 * dy + 3, 2 * dx:2 * dx + 3, :,
                           dy, dx, :].set(kernel)
        W2 = W2.reshape(25 * cin, 4 * self.features)
        outb = patches.astype(self.dtype) @ W2.astype(self.dtype)
        outb = outb.reshape(b, nb, nb, 2, 2, self.features)
        out = outb.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, out_h, out_h, self.features)
        return out + bias.astype(self.dtype)
