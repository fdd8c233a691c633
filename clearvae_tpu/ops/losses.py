"""Loss functions and pairwise similarity kernels — pure jnp, fixed shapes.

Functional rebuild of the reference loss layer (reference: code/src/losses.py).
Every function is jit/vmap/grad-safe: masking is done with the double-`where`
trick instead of in-place -inf writes (the reference mutates its ``sim`` input
in place, losses.py:131), so gradients are NaN-free even for rows whose
positive set is empty.

All-pairs [B, B] similarity matrices are built with matmuls/broadcasts so XLA
maps them onto the MXU; see ``clearvae_tpu.ops.pallas.fused_loss`` for the
fused Pallas version behind the same signature.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG_INF = -jnp.inf


# ---------------------------------------------------------------------------
# masked logsumexp
# ---------------------------------------------------------------------------


def masked_logsumexp(x: Array, mask: Array, axis: int = -1) -> Array:
    """logsumexp over entries where ``mask`` is True.

    Rows with an empty mask return -inf, like the reference's stable
    ``logsumexp`` applied to all-(-inf) rows (reference: code/src/losses.py:87-95),
    but with NaN-free gradients (double-where trick).
    """
    neg_big = jnp.finfo(x.dtype).min
    any_valid = jnp.any(mask, axis=axis, keepdims=True)
    x_masked = jnp.where(mask, x, neg_big)
    m = jnp.max(x_masked, axis=axis, keepdims=True)
    # rows with no valid entry get m = finfo.min; zero it so exp() below stays
    # finite (an inf in the unselected where-branch would NaN the gradient)
    m_safe = jnp.where(any_valid & jnp.isfinite(m), m, 0.0)
    e = jnp.where(mask, jnp.exp(x_masked - m_safe), 0.0)
    s = jnp.sum(e, axis=axis)
    out = jnp.log(jnp.where(s > 0, s, 1.0)) + jnp.squeeze(m_safe, axis=axis)
    return jnp.where(jnp.squeeze(any_valid, axis=axis), out, _NEG_INF)


# ---------------------------------------------------------------------------
# ELBO pieces
# ---------------------------------------------------------------------------


def sample_level_reduction(t: Array) -> Array:
    """Sum over non-batch dims, mean over batch (reference: losses.py:36-38)."""
    axes = tuple(range(1, t.ndim))
    return jnp.mean(jnp.sum(t, axis=axes))


def vae_loss(x_hat: Array, x: Array, mu_c: Array, logvar_c: Array,
             mu_s: Array, logvar_s: Array) -> tuple[Array, Array, Array]:
    """Per-sample-summed MSE reconstruction + analytic Gaussian KL split into
    content/style halves (reference: code/src/losses.py:41-50)."""
    recon = sample_level_reduction((x_hat - x) ** 2)
    kl_c = -0.5 * sample_level_reduction(1 + logvar_c - mu_c**2 - jnp.exp(logvar_c))
    kl_s = -0.5 * sample_level_reduction(1 + logvar_s - mu_s**2 - jnp.exp(logvar_s))
    return recon, kl_c, kl_s


# ---------------------------------------------------------------------------
# Pairwise similarity kernels (all [B, B])
# ---------------------------------------------------------------------------


def pairwise_cosine(mu: Array, logvar: Array | None = None) -> Array:
    """sim[i, j] = cos(mu_j, mu_i) (reference: losses.py:54-55).

    Row-normalize then a single [B,z]@[z,B] matmul → MXU, instead of the
    reference's broadcasted [B,B,z] intermediate.
    """
    # torch F.cosine_similarity clamps each norm at eps=1e-8
    norm = jnp.maximum(jnp.linalg.norm(mu, axis=-1, keepdims=True), 1e-8)
    mu_n = mu / norm
    return mu_n @ mu_n.T


def pairwise_l2(mu: Array, logvar: Array | None = None) -> Array:
    """-||mu_i - mu_j||² (reference: losses.py:58-59)."""
    sq = jnp.sum(mu**2, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (mu @ mu.T)
    return -jnp.maximum(d2, 0.0)


def pairwise_jeffrey(mu: Array, logvar: Array) -> Array:
    """-symmetric KL between diagonal Gaussians (reference: losses.py:62-72).

    The reference's asymmetric building block divides term2 by ``logvar.exp()``
    which torch right-align-broadcasts to the *column* index j (losses.py:66),
    while term3 is var_j / var_i (+1e-8). We replicate that exact indexing and
    symmetrize.
    """
    k = mu.shape[1]
    var = jnp.exp(logvar)
    lv_sum = jnp.sum(logvar, axis=-1)
    term1 = lv_sum[None, :] - lv_sum[:, None] - k
    term2 = jnp.sum((mu[None, :, :] - mu[:, None, :]) ** 2 / var[None, :, :], axis=-1)
    term3 = jnp.sum(var[None, :, :] / (var[:, None, :] + 1e-8), axis=-1)
    pkl = 0.5 * (term1 + term2 + term3)
    return -0.5 * (pkl + pkl.T)


def pairwise_mahalanobis(mu: Array, logvar: Array) -> Array:
    """-Mahalanobis distance with averaged variances (reference: losses.py:75-78)."""
    var = 0.5 * (jnp.exp(logvar)[None, :, :] + jnp.exp(logvar)[:, None, :])
    d = jnp.sum((mu[None, :, :] - mu[:, None, :]) ** 2 / var, axis=-1)
    return -d


def pairwise_modified_l2(mu: Array, logvar: Array) -> Array:
    """-L2 scaled by geometric-mean variance (reference: losses.py:81-84)."""
    var = jnp.exp(0.5 * (logvar[None, :, :] + logvar[:, None, :]))
    d = jnp.sum((mu[None, :, :] - mu[:, None, :]) ** 2 / var, axis=-1)
    return -d


SIM_FNS = {
    "cosine": pairwise_cosine,
    "l2": pairwise_l2,
    "modified_l2": pairwise_modified_l2,
    "jeffrey": pairwise_jeffrey,
    "mahalanobis": pairwise_mahalanobis,
}


# ---------------------------------------------------------------------------
# Contrastive losses over a [B, B] similarity matrix
# ---------------------------------------------------------------------------


def snn_loss(sim: Array, pair_mat: Array, temperature: float) -> Array:
    """Per-row soft-nearest-neighbour loss (reference: losses.py:129-137).

    Diagonal excluded from both numerator and denominator. Rows with no
    positive pair yield +inf (filtered by the caller's finite mask), matching
    the reference exactly.
    """
    n = sim.shape[0]
    not_diag = ~jnp.eye(n, dtype=bool)
    pos_mask = (pair_mat > 0) & not_diag
    s = sim / temperature
    num = masked_logsumexp(s, pos_mask, axis=1)
    den = masked_logsumexp(s, not_diag, axis=1)
    return -num + den


def supcon_in_loss(sim: Array, pair_mat: Array, temperature: float) -> Array:
    """SupCon L_in (reference: losses.py:140-153): snn + log(n_k)."""
    n_k = jnp.sum(pair_mat, axis=1) - 1.0
    return jnp.log(n_k) + snn_loss(sim, pair_mat, temperature)


def supcon_out_loss(sim: Array, pair_mat: Array, temperature: float) -> Array:
    """SupCon L_out (reference: losses.py:156-170).

    The reference sets the diagonal to -999 (not -inf) and keeps it inside the
    denominator logsumexp; rows without positives are dropped — here they
    return +inf so the caller's finite mask drops them identically.
    """
    n = sim.shape[0]
    eye = jnp.eye(n, dtype=sim.dtype)
    sim_d = jnp.where(eye.astype(bool), -999.0, sim)
    pos_mask = pair_mat * (1.0 - eye)
    masked_sim = sim_d * pos_mask
    n_k = jnp.sum(pos_mask, axis=1)
    den = masked_logsumexp(sim_d / temperature, jnp.ones_like(sim_d, dtype=bool), axis=1)
    loss = -jnp.sum(masked_sim, axis=1) / jnp.where(n_k > 0, n_k, 1.0) + den
    return jnp.where(n_k > 0, loss, jnp.inf)


CONTRASTIVE_LOSSES = {
    "snn": snn_loss,
    "supcon_in": supcon_in_loss,
    "supcon_out": supcon_out_loss,
}


def contrastive_loss(mu: Array, logvar: Array, label: Array, *,
                     sim_fn: str = "cosine", temperature: float = 0.1,
                     loss_name: str = "snn", ps: bool = False) -> Array:
    """Mean over finite per-row losses (reference: code/src/losses.py:98-126).

    ``ps=True`` flips the pair matrix: different-label pairs are 'positives'
    (the PS-SNN anti-contrastive mode used on the style latent).
    """
    if ps:
        pair_mat = (label[None, :] != label[:, None]).astype(mu.dtype)
    else:
        pair_mat = (label[None, :] == label[:, None]).astype(mu.dtype)
    sim = SIM_FNS[sim_fn](mu, logvar)
    losses = CONTRASTIVE_LOSSES[loss_name](sim, pair_mat, temperature)
    finite = jnp.isfinite(losses)
    n_finite = jnp.sum(finite)
    total = jnp.sum(jnp.where(finite, losses, 0.0))
    return total / jnp.maximum(n_finite, 1)


# ---------------------------------------------------------------------------
# LAM loss (reference: code/src/losses.py:173-187)
# ---------------------------------------------------------------------------


def lam_loss(feature_x: Array, feature_x_tilde: Array, y: Array,
             linear_w: Array) -> Array:
    """Mean squared difference of class-weighted feature contributions
    between an image and its stratified-shuffle partner.

    ``linear_w``: the linear classification head weight, shape [n_class, feat]
    (torch layout; reference reads ``cls_head.weight``).
    """
    w_y = linear_w[y]  # [B, feat]
    diff = (feature_x - feature_x_tilde) * w_y
    return jnp.mean(jnp.sum(diff**2, axis=1))
