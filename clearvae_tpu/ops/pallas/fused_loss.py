"""Fused Pallas kernel for the CLEAR contrastive (SNN / PS-SNN) loss.

One TPU kernel computes, entirely in VMEM: row-normalization of mu, the
[B, B] cosine similarity on the MXU, the masked positive/denominator
logsumexps, per-row soft-nearest-neighbour losses, the finite-row mean —
and the hand-derived gradient (softmax difference → (G + Gᵀ) @ mu_n →
normalization projection). The CLEAR-latent variant emits the loss terms
AND the unit-cotangent SNN grads from a single forward kernel (the masked
softmaxes reuse the logsumexps' exp/sum work), so backward is just an
elementwise XLA combine. This fuses what the reference computes as a chain
of torch ops over HBM-materialized [B, B] matrices (reference:
code/src/losses.py:54-137).

Measured on v5e (scripts/bench_fused_loss.py): parity with XLA at the
reference size in the scanned-epoch regime, ~10% slower at B≥512 — XLA
overlaps the jnp latent loss with the conv backward, which a custom-call
kernel cannot, so ``ContrastiveConfig.fused`` stays False by default and
this kernel remains the explicit opt-in path (numbers in BASELINE.md).

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


# The whole-array kernels hold a few [n, n] f32 intermediates in VMEM; at
# n=1024 the backward pass needs ~19MB+, above Mosaic's 16MB default scoped
# limit (v5e has 128MB VMEM). Raise the cap — it is a limit, not a
# reservation, so small batches are unaffected.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


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
        compiler_params=_COMPILER_PARAMS,
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
        compiler_params=_COMPILER_PARAMS,
    )(mu_p, lbl, g_arr)
    return dmu[:b, :z], None


_fused_snn.defvjp(_fused_snn_fwd, _fused_snn_bwd)


# ---------------------------------------------------------------------------
# Fully fused CLEAR latent loss: KL(c) + KL(s) + SNN(mu_c) + (PS-)SNN(mu_s)
# in ONE kernel (forward and backward). This is the SURVEY §7 fusion target:
# the four latent heads are read from HBM exactly once; both [B, B] cosine
# matrices live only in VMEM; the reference computes the same four terms as
# ~30 separate torch ops (losses.py:41-50, 98-137).
# ---------------------------------------------------------------------------


def _snn_lossgrad(mu, label, n, b, temperature, ps):
    """SNN loss AND its unit-cotangent gradient in one pass: the masked
    softmaxes reuse the exp/sum work of the logsumexps, so emitting the
    gradient here costs only the (G + Gᵀ) @ mu_n matmul — vs a separate
    backward kernel re-doing the similarity matmul and both softmaxes."""
    r = jnp.sqrt(jnp.sum(mu * mu, axis=1, keepdims=True))
    r_c = jnp.maximum(r, _EPS)
    mu_n = mu / r_c
    s = jnp.dot(mu_n, mu_n.T, preferred_element_type=jnp.float32) / temperature
    valid, pos = _masks(label, n, b, ps)
    neg = jnp.float32(-1e30)

    def lse_softmax(mask):
        sm = jnp.where(mask, s, neg)
        m = jnp.maximum(jnp.max(sm, axis=1, keepdims=True), -1e29)
        e = jnp.where(mask, jnp.exp(sm - m), 0.0)
        ssum = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-37)
        return jnp.log(ssum) + m, e / ssum

    lse_all, p_all = lse_softmax(valid)
    lse_pos, p_pos = lse_softmax(pos)

    has_pos = jnp.sum(pos.astype(jnp.float32), axis=1, keepdims=True) > 0
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    row_ok = has_pos & (rows < b)
    n_finite = jnp.maximum(jnp.sum(row_ok.astype(jnp.float32)), 1.0)
    loss = jnp.sum(jnp.where(row_ok, -lse_pos + lse_all, 0.0)) / n_finite

    G = row_ok.astype(jnp.float32) * (p_all - p_pos) / (temperature * n_finite)
    dmu_n = jnp.dot(G + G.T, mu_n, preferred_element_type=jnp.float32)
    inner = jnp.sum(dmu_n * mu_n, axis=1, keepdims=True)
    proj = jnp.where(r > _EPS, inner, 0.0)
    dmu = (dmu_n - proj * mu_n) / r_c
    return loss, dmu


def _clear_fwdgrad_kernel(mu_c_ref, lv_c_ref, mu_s_ref, lv_s_ref, label_ref,
                          out_ref, dsnn_c_ref, dsnn_s_ref, *, b: int,
                          temperature: float, ps: bool):
    """Loss terms + unit-cotangent SNN grads in ONE kernel (the KL grads
    are trivial elementwise expressions left to the XLA bwd combiner)."""
    mu_c, lv_c = mu_c_ref[:], lv_c_ref[:]
    mu_s, lv_s = mu_s_ref[:], lv_s_ref[:]
    label = label_ref[:]
    n = mu_c.shape[0]

    # KL halves: padded entries (mu=0, lv=0) contribute 1+0-0-1 = 0, so a
    # plain full-array sum is exact
    kl_c = -0.5 * jnp.sum(1 + lv_c - mu_c * mu_c - jnp.exp(lv_c)) / b
    kl_s = -0.5 * jnp.sum(1 + lv_s - mu_s * mu_s - jnp.exp(lv_s)) / b

    c_loss, dsnn_c = _snn_lossgrad(mu_c, label, n, b, temperature, False)
    s_loss, dsnn_s = _snn_lossgrad(mu_s, label, n, b, temperature, ps)

    out_ref[0, 0] = kl_c
    out_ref[0, 1] = kl_s
    out_ref[0, 2] = c_loss
    out_ref[0, 3] = s_loss
    dsnn_c_ref[:] = dsnn_c
    dsnn_s_ref[:] = dsnn_s


def _pad4(mu_c, lv_c, mu_s, lv_s, label):
    b, z = mu_c.shape
    n = _round_up(b, 8)
    zp = _round_up(z, 128)

    def pad(a):
        return jnp.zeros((n, zp), jnp.float32).at[:b, :z].set(a)

    lbl = jnp.full((n, 1), -1, jnp.int32).at[:b, 0].set(label.astype(jnp.int32))
    return pad(mu_c), pad(lv_c), pad(mu_s), pad(lv_s), lbl, n, zp


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_clear(mu_c, lv_c, mu_s, lv_s, label, temperature, ps):
    return _fused_clear_fwd(mu_c, lv_c, mu_s, lv_s, label, temperature, ps)[0]


def _fused_clear_fwd(mu_c, lv_c, mu_s, lv_s, label, temperature, ps):
    args = _pad4(mu_c, lv_c, mu_s, lv_s, label)
    b, z = mu_c.shape
    n, zp = args[5], args[6]
    out, dsnn_c, dsnn_s = pl.pallas_call(
        functools.partial(_clear_fwdgrad_kernel, b=b,
                          temperature=float(temperature), ps=bool(ps)),
        out_shape=[jax.ShapeDtypeStruct((1, 4), jnp.float32),
                   jax.ShapeDtypeStruct((n, zp), jnp.float32),
                   jax.ShapeDtypeStruct((n, zp), jnp.float32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(*args[:5])
    terms = (out[0, 0], out[0, 1], out[0, 2], out[0, 3])
    res = (mu_c, lv_c, mu_s, lv_s, dsnn_c[:b, :z], dsnn_s[:b, :z])
    return terms, res


def _fused_clear_bwd(temperature, ps, res, g):
    """Combine the kernel-computed unit-cotangent SNN grads with the
    closed-form KL grads (elementwise; XLA fuses this into the surrounding
    backward graph, so no second Pallas kernel is needed)."""
    mu_c, lv_c, mu_s, lv_s, dsnn_c, dsnn_s = res
    b = mu_c.shape[0]
    g_klc, g_kls, g_c, g_s = g
    dmu_c = g_klc * mu_c / b + g_c * dsnn_c
    dlv_c = g_klc * (-0.5) * (1.0 - jnp.exp(lv_c)) / b
    dmu_s = g_kls * mu_s / b + g_s * dsnn_s
    dlv_s = g_kls * (-0.5) * (1.0 - jnp.exp(lv_s)) / b
    return (dmu_c, dlv_c, dmu_s, dlv_s, None)


_fused_clear.defvjp(_fused_clear_fwd, _fused_clear_bwd)


def fused_clear_latent_loss(mu_c: Array, logvar_c: Array, mu_s: Array,
                            logvar_s: Array, label: Array, *,
                            temperature: float = 0.1, ps: bool = True):
    """(kl_c, kl_s, snn(mu_c), snn/ps-snn(mu_s)) from ONE Pallas kernel.

    Semantics identical to ``vae_loss``'s KL halves +
    ``contrastive_loss(sim_fn='cosine', loss_name='snn')`` on both latent
    halves (the configuration of every reference experiment). The caller
    negates the style term when ``ps=False`` (reference trainer.py:463-472).

    Custom VJP with a forward-emits-grads design: the forward kernel also
    writes the unit-cotangent SNN gradients w.r.t. both mu halves, and the
    backward pass is a cheap elementwise XLA combine of those with the
    closed-form KL grads (see ``_fused_clear_bwd``). Consequence: every
    call pays the (G+G^T)@mu gradient matmuls even if never differentiated —
    a forward-only caller (e.g. a fused eval path) should use the loss-only
    kernels (``fused_contrastive_loss``) instead.
    """
    return _fused_clear(mu_c, logvar_c, mu_s, logvar_s, label,
                        float(temperature), bool(ps))


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
