"""Fused Pallas styling kernel for the deterministic Styled-MNIST styles.

One kernel pass styles a whole [B, 28, 28] batch in VMEM, selecting per
sample between identity / stripe / brightness / contrast / inverse /
quantize / scale. ``scale`` (center-preserving zoom-out with bilinear
interpolation, reference corruptions.py:602-622) is expressed as two static
interpolation matmuls ``A @ x @ Aᵀ`` so it runs on the MXU instead of
per-pixel gathers.

This is the Pallas counterpart of :func:`clearvae_tpu.ops.corruptions`'s XLA
kernels for the deterministic subset (the stochastic styles — zigzag, canny —
keep their XLA implementations); A/B parity is tested in tests/test_pallas.py.
Style codes follow clearvae_tpu.native.bindings.NATIVE_STYLES.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STYLE_CODES = {"identity": 0, "stripe": 1, "brightness": 2, "inverse": 3,
               "quantize": 4, "contrast": 5, "scale": 6}

_BRIGHT = (0.1, 0.2, 0.3, 0.4, 0.5)
_QBITS = (5, 4, 3, 2, 1)
_CONTR = (0.4, 0.3, 0.2, 0.1, 0.05)
_SCALE = (1 / 0.9, 1 / 0.8, 1 / 0.7, 1 / 0.6, 1 / 0.5)


@functools.lru_cache(maxsize=None)
def _interp_matrix(size: int, factor: float, center: float) -> np.ndarray:
    """A[i, j] = bilinear weight of source pixel j for output pixel i along
    one axis of the center-preserving zoom (out-of-range rows → 0, skimage
    constant mode)."""
    a = np.zeros((size, size), np.float32)
    for i in range(size):
        src = factor * i + center * (1 - factor)
        j0 = int(np.floor(src))
        f = src - j0
        if 0 <= j0 < size:
            a[i, j0] += 1 - f
        if 0 <= j0 + 1 < size:
            a[i, j0 + 1] += f
    return a


def _style_kernel(x_ref, code_ref, a_ref, out_ref, *, severity: int):
    x = x_ref[:]                      # [B, H, W] float32 0..255
    code = code_ref[:]                # [B, 1] int32
    a = a_ref[:]                      # [H, H] interpolation matrix
    b, h, w = x.shape
    sev = severity - 1

    x01 = x / 255.0
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)

    stripe = jnp.where((cols < 7) | (cols >= 21), 255.0 - x, x)
    bright = jnp.clip(x01 + _BRIGHT[sev], 0.0, 1.0) * 255.0
    inverse = 255.0 - x
    levels = float((1 << _QBITS[sev]) - 1)
    quant = jnp.round(x * (levels / 255.0)) * (255.0 / levels)
    mean = jnp.mean(x01, axis=(1, 2), keepdims=True)
    contrast = jnp.clip((x01 - mean) * _CONTR[sev] + mean, 0.0, 1.0) * 255.0
    # scale: rows then columns via the static interpolation matrix (MXU)
    tmp = jax.lax.dot_general(a, x01, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [H, B, W]
    tmp = tmp.transpose(1, 0, 2)                                    # [B, H, W]
    scaled = jnp.clip(jnp.dot(tmp, a.T, preferred_element_type=jnp.float32),
                      0.0, 1.0) * 255.0

    c = code[:, :, None]  # [B,1,1]
    out = x
    for val, styled in ((1, stripe), (2, bright), (3, inverse), (4, quant),
                        (5, contrast), (6, scaled)):
        out = jnp.where(c == val, styled, out)
    out_ref[:] = out


def pallas_style_batch(x: jax.Array, style_code: jax.Array,
                       severity: int = 5) -> jax.Array:
    """Style a [B, H, W] float32 (0..255) batch in one fused Pallas kernel.

    ``style_code``: [B] int32 with values from STYLE_CODES.
    """
    b, h, w = x.shape
    a = jnp.asarray(_interp_matrix(h, _SCALE[severity - 1], (h - 1) / 2))
    code = style_code.astype(jnp.int32).reshape(b, 1)
    return pl.pallas_call(
        functools.partial(_style_kernel, severity=severity),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(x, jnp.float32), code, a)
