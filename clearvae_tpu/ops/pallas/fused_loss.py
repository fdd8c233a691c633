"""Fused Pallas kernel for the CLEAR contrastive (SNN / PS-SNN) loss.

One TPU kernel computes, entirely in VMEM: row-normalization of mu, the
[B, B] cosine similarity on the MXU, the masked positive/denominator
logsumexps, per-row soft-nearest-neighbour losses, the finite-row mean —
and, in the backward kernel, the hand-derived gradient (softmax difference
→ (G + Gᵀ) @ mu_n → normalization projection). This fuses what the
reference computes as a chain of torch ops over HBM-materialized [B, B]
matrices (reference: code/src/losses.py:54-137).

Semantics match :func:`clearvae_tpu.ops.losses.contrastive_loss` with
``sim_fn='cosine', loss_name='snn'`` (the configuration every reference
experiment uses, trainer_utils.py:104) bit-closely; A/B parity including
gradients is tested in tests/test_pallas.py. ``fused_contrastive_loss``
falls back to the jnp implementation for other similarity/loss choices.

Shapes: B and z are padded to TPU tiles (8×128) inside the wrapper; the
kernel masks padded rows/columns out of every reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clearvae_tpu.ops import losses as L

Array = jax.Array

_EPS = 1e-8  # torch cosine_similarity norm clamp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _masks(label_col, n: int, b: int, ps: bool):
    """valid-pair and positive-pair masks, padded rows/cols excluded."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    in_range = (rows < b) & (cols < b)
    not_diag = rows != cols
    li = label_col  # [n, 1]
    same = li == li.reshape(1, n)
    pos = (~same) if ps else same
    valid = in_range & not_diag
    return valid, pos & valid


def _row_lse(s, mask):
    """Masked logsumexp per row; empty rows → (0 count, anything)."""
    neg = jnp.float32(-1e30)
    sm = jnp.where(mask, s, neg)
    m = jnp.max(sm, axis=1, keepdims=True)
    m_safe = jnp.maximum(m, -1e29)  # zero-ish shift for empty rows
    e = jnp.where(mask, jnp.exp(sm - m_safe), 0.0)
    ssum = jnp.sum(e, axis=1, keepdims=True)
    lse = jnp.log(jnp.maximum(ssum, 1e-37)) + m_safe
    return lse, ssum


def _fwd_kernel(mu_ref, label_ref, out_ref, *, b: int, temperature: float,
                ps: bool):
    mu = mu_ref[:]                      # [n, zp]
    n = mu.shape[0]
    label = label_ref[:]                # [n, 1] int32

    r = jnp.sqrt(jnp.sum(mu * mu, axis=1, keepdims=True))
    mu_n = mu / jnp.maximum(r, _EPS)
    sim = jnp.dot(mu_n, mu_n.T, preferred_element_type=jnp.float32)
    s = sim / temperature

    valid, pos = _masks(label, n, b, ps)
    lse_all, _ = _row_lse(s, valid)
    lse_pos, pos_sum = _row_lse(s, pos)

    has_pos = jnp.sum(pos.astype(jnp.float32), axis=1, keepdims=True) > 0
    row_loss = jnp.where(has_pos, -lse_pos + lse_all, 0.0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    row_ok = has_pos & (rows < b)
    n_finite = jnp.maximum(jnp.sum(row_ok.astype(jnp.float32)), 1.0)
    out_ref[0, 0] = jnp.sum(jnp.where(row_ok, row_loss, 0.0)) / n_finite


def _bwd_kernel(mu_ref, label_ref, g_ref, dmu_ref, *, b: int,
                temperature: float, ps: bool):
    mu = mu_ref[:]
    n = mu.shape[0]
    label = label_ref[:]
    g = g_ref[0, 0]

    r = jnp.sqrt(jnp.sum(mu * mu, axis=1, keepdims=True))
    r_c = jnp.maximum(r, _EPS)
    mu_n = mu / r_c
    sim = jnp.dot(mu_n, mu_n.T, preferred_element_type=jnp.float32)
    s = sim / temperature

    valid, pos = _masks(label, n, b, ps)
    neg = jnp.float32(-1e30)

    def softmax(mask):
        sm = jnp.where(mask, s, neg)
        m = jnp.maximum(jnp.max(sm, axis=1, keepdims=True), -1e29)
        e = jnp.where(mask, jnp.exp(sm - m), 0.0)
        return e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-37)

    p_all = softmax(valid)
    p_pos = softmax(pos)

    has_pos = jnp.sum(pos.astype(jnp.float32), axis=1, keepdims=True) > 0
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    row_ok = (has_pos & (rows < b)).astype(jnp.float32)
    n_finite = jnp.maximum(jnp.sum(row_ok), 1.0)

    # dL/dsim per row i: (p_all - p_pos)/T, scaled by row weight/n_finite
    G = row_ok * (p_all - p_pos) / (temperature * n_finite)
    dmu_n = jnp.dot(G + G.T, mu_n, preferred_element_type=jnp.float32)
    # through row normalization: d mu = (dmu_n - (dmu_n·mu_n) mu_n · [r>eps]) / r_c
    inner = jnp.sum(dmu_n * mu_n, axis=1, keepdims=True)
    proj = jnp.where(r > _EPS, inner, 0.0)
    dmu_ref[:] = g * (dmu_n - proj * mu_n) / r_c


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_snn(mu: Array, label: Array, temperature: float, ps: bool):
    return _fused_snn_fwd(mu, label, temperature, ps)[0]


def _pad(mu, label):
    b, z = mu.shape
    n = _round_up(b, 8)
    zp = _round_up(z, 128)
    mu_p = jnp.zeros((n, zp), jnp.float32).at[:b, :z].set(mu)
    # padded labels = -1: never equal to a real label, and for ps=True the
    # pair mask is range-filtered anyway
    lbl = jnp.full((n, 1), -1, jnp.int32).at[:b, 0].set(label.astype(jnp.int32))
    return mu_p, lbl, n, zp


def _interpret() -> bool:
    # compile to Mosaic on TPU; interpreter elsewhere (CPU test runs)
    return jax.default_backend() != "tpu"


def _fused_snn_fwd(mu, label, temperature, ps):
    b, z = mu.shape
    mu_p, lbl, n, zp = _pad(mu, label)
    loss = pl.pallas_call(
        functools.partial(_fwd_kernel, b=b, temperature=float(temperature),
                          ps=bool(ps)),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=_interpret(),
    )(mu_p, lbl)[0, 0]
    return loss, (mu, label)


def _fused_snn_bwd(temperature, ps, res, g):
    mu, label = res
    b, z = mu.shape
    mu_p, lbl, n, zp = _pad(mu, label)
    g_arr = jnp.full((1, 1), g, jnp.float32)
    dmu = pl.pallas_call(
        functools.partial(_bwd_kernel, b=b, temperature=float(temperature),
                          ps=bool(ps)),
        out_shape=jax.ShapeDtypeStruct((n, zp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(mu_p, lbl, g_arr)
    return dmu[:b, :z], None


_fused_snn.defvjp(_fused_snn_fwd, _fused_snn_bwd)


def fused_contrastive_loss(mu: Array, logvar: Array, label: Array, *,
                           sim_fn: str = "cosine", temperature: float = 0.1,
                           loss_name: str = "snn", ps: bool = False) -> Array:
    """Drop-in for :func:`clearvae_tpu.ops.losses.contrastive_loss`; uses the
    fused Pallas kernel for the cosine/snn configuration, jnp otherwise."""
    if sim_fn == "cosine" and loss_name == "snn":
        return _fused_snn(mu, label, float(temperature), bool(ps))
    return L.contrastive_loss(mu, logvar, label, sim_fn=sim_fn,
                              temperature=temperature, loss_name=loss_name,
                              ps=ps)
