"""Evaluation metrics: MIG (KSG kNN MI), accuracy, per-class AUPR/AUROC.

The reference delegates to sklearn (reference: code/src/losses.py:10-33):
``mutual_info_classif`` (the Ross 2014 continuous-feature / discrete-target
KSG-style kNN estimator, n_neighbors=3) for MIG, and
``average_precision_score`` / ``roc_auc_score`` for the downstream metrics.

Here the kNN MI estimator is re-implemented twice behind one API:
  - a float64 numpy path (exact sklearn parity, used for reported numbers),
  - a jittable jnp path (chunked O(N²) pairwise distances — fine on TPU at
    N≈10k) for on-device evaluation.

Both follow sklearn's ``_estimate_mi`` preprocessing: per-column std scaling
(no centering) plus 1e-10-scale tie-breaking noise, then per-column
``_compute_mi_cd``: radius = distance to the k-th same-class neighbour
(k = min(n_neighbors, class_count-1)), shrunk by one ulp; m_i = number of
points (any class, self included) within that radius; samples in singleton
classes dropped; MI = ψ(N) + mean ψ(k) − mean ψ(class_count) − mean ψ(m).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import digamma as np_digamma

Array = jax.Array


# ---------------------------------------------------------------------------
# KSG continuous-discrete MI (numpy float64, sklearn-parity path)
# ---------------------------------------------------------------------------


def _mi_cd_numpy(c: np.ndarray, d: np.ndarray, n_neighbors: int) -> float:
    """Single continuous feature vs discrete labels (sklearn _compute_mi_cd)."""
    n = c.shape[0]
    radius = np.zeros(n)
    label_counts = np.zeros(n)
    k_all = np.zeros(n)
    for label in np.unique(d):
        mask = d == label
        count = int(mask.sum())
        if count > 1:
            k = min(n_neighbors, count - 1)
            cc = c[mask]
            dist = np.abs(cc[:, None] - cc[None, :])
            np.fill_diagonal(dist, np.inf)
            kth = np.partition(dist, k - 1, axis=1)[:, k - 1]
            radius[mask] = np.nextafter(kth, 0)
            k_all[mask] = k
        label_counts[mask] = count

    mask = label_counts > 1
    n_eff = int(mask.sum())
    if n_eff == 0:
        return 0.0
    c_m, radius_m = c[mask], radius[mask]
    label_counts_m, k_all_m = label_counts[mask], k_all[mask]

    # m_i = #points (self included) within radius_i, over the masked set
    m_all = np.empty(n_eff)
    chunk = 2048
    for s in range(0, n_eff, chunk):
        e = min(s + chunk, n_eff)
        dist = np.abs(c_m[s:e, None] - c_m[None, :])
        m_all[s:e] = (dist <= radius_m[s:e, None]).sum(axis=1)

    mi = (np_digamma(n_eff) + np.mean(np_digamma(k_all_m))
          - np.mean(np_digamma(label_counts_m)) - np.mean(np_digamma(m_all)))
    return max(0.0, float(mi))


def mutual_info_classif_np(x: np.ndarray, y: np.ndarray, *,
                           n_neighbors: int = 3, seed: int = 0) -> np.ndarray:
    """Per-feature MI(x_col; y) with sklearn _estimate_mi preprocessing."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    y = np.asarray(y).ravel()
    std = x.std(axis=0)
    x = x / np.where(std > 0, std, 1.0)
    rng = np.random.RandomState(seed)
    means = np.maximum(1, np.mean(np.abs(x), axis=0))
    x = x + 1e-10 * means * rng.standard_normal(size=x.shape)
    return np.array([_mi_cd_numpy(x[:, j], y, n_neighbors)
                     for j in range(x.shape[1])])


# ---------------------------------------------------------------------------
# KSG continuous-discrete MI (jnp, jittable, f32)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_neighbors", "n_classes"))
def _mi_cd_jnp(x: Array, y: Array, n_neighbors: int, n_classes: int) -> Array:
    """All features at once: x [N, F] (already preprocessed), y [N] int."""
    n = x.shape[0]
    onehot = jax.nn.one_hot(y, n_classes)               # [N, C]
    counts = onehot.sum(0)                              # [C]
    label_counts = counts[y]                            # [N]
    k_all = jnp.minimum(n_neighbors, label_counts - 1)  # [N]
    valid = label_counts > 1

    same = (y[:, None] == y[None, :]) & ~jnp.eye(n, dtype=bool)

    def per_feature(col):
        dist = jnp.abs(col[:, None] - col[None, :])     # [N, N]
        dist_same = jnp.where(same, dist, jnp.inf)
        # k smallest same-class distances; pick the (k_i-1)-th
        neg_topk, _ = jax.lax.top_k(-dist_same, n_neighbors)  # [N, k]
        kth = -jnp.take_along_axis(
            neg_topk, jnp.maximum(k_all - 1, 0).astype(jnp.int32)[:, None], axis=1
        )[:, 0]
        radius = jnp.where(jnp.isfinite(kth),
                           jnp.nextafter(kth, jnp.float32(0)), 0.0)
        # count within radius over valid points only (self included)
        within = (dist <= radius[:, None]) & valid[None, :]
        return jnp.sum(within, axis=1).astype(jnp.float32)

    # sequential over features: vmap would materialize [F, N, N] distance
    # intermediates (51 GB at the experiments' N=10k, F=8 — exceeds v5e
    # HBM); lax.map keeps the peak at one [N, N] matrix per feature
    m_all = jax.lax.map(per_feature, x.T).T                  # [N, F]

    n_eff = jnp.maximum(jnp.sum(valid), 1)
    dg = jax.scipy.special.digamma
    vmask = valid.astype(jnp.float32)
    mean_dg_k = jnp.sum(dg(jnp.maximum(k_all, 1.0)) * vmask) / n_eff
    mean_dg_cnt = jnp.sum(dg(jnp.maximum(label_counts, 1.0)) * vmask) / n_eff
    mean_dg_m = jnp.sum(dg(jnp.maximum(m_all, 1.0)) * vmask[:, None], axis=0) / n_eff
    mi = dg(n_eff.astype(jnp.float32)) + mean_dg_k - mean_dg_cnt - mean_dg_m
    return jnp.maximum(mi, 0.0)


def mutual_info_classif_jnp(x, y, *, n_neighbors: int = 3,
                            n_classes: int = 10, seed: int = 0) -> Array:
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 1:
        x = x[:, None]
    y = jnp.asarray(y, jnp.int32).ravel()
    std = jnp.std(x, axis=0)
    x = x / jnp.where(std > 0, std, 1.0)
    means = jnp.maximum(1.0, jnp.mean(jnp.abs(x), axis=0))
    noise = jax.random.normal(jax.random.key(seed), x.shape, x.dtype)
    x = x + 1e-10 * means * noise
    return _mi_cd_jnp(x, y, n_neighbors, n_classes)


# ---------------------------------------------------------------------------
# MIG (reference: code/src/losses.py:10-16)
# ---------------------------------------------------------------------------


def mutual_info_gap(label, latent_c, latent_s, *, backend: str = "numpy",
                    n_classes: int | None = None) -> float:
    """(mean MI(z_c, y) − mean MI(z_s, y)) / H(y)."""
    label = np.asarray(label).ravel().astype(np.int64)
    p = np.bincount(label) / len(label)
    p = p[p > 0]
    h = float(-(p * np.log(p)).sum())
    if backend == "native":
        from clearvae_tpu.native.bindings import mutual_info_classif_native

        mi_c = mutual_info_classif_native(np.asarray(latent_c), label)
        mi_s = mutual_info_classif_native(np.asarray(latent_s), label)
    elif backend == "numpy":
        mi_c = mutual_info_classif_np(np.asarray(latent_c), label)
        mi_s = mutual_info_classif_np(np.asarray(latent_s), label)
    else:
        nc = n_classes or int(label.max()) + 1
        mi_c = np.asarray(mutual_info_classif_jnp(latent_c, label, n_classes=nc))
        mi_s = np.asarray(mutual_info_classif_jnp(latent_s, label, n_classes=nc))
    return float((mi_c.mean() - mi_s.mean()) / h)


# ---------------------------------------------------------------------------
# Classification metrics (reference: code/src/losses.py:19-33)
# ---------------------------------------------------------------------------


def accuracy(logits, y) -> float:
    yh = np.asarray(logits).argmax(axis=1).ravel()
    return float((yh == np.asarray(y).ravel()).mean())


# drop-in alias with the reference's spelling (reference losses.py:19)
accurary = accuracy


def _binary_average_precision(y_true: np.ndarray, score: np.ndarray) -> float:
    """sklearn average_precision_score (step interpolation, tie-grouped)."""
    order = np.argsort(-score, kind="mergesort")
    y_true, score = y_true[order], score[order]
    distinct = np.where(np.diff(score))[0]
    idx = np.r_[distinct, y_true.size - 1]
    tp = np.cumsum(y_true)[idx]
    fp = (idx + 1) - tp
    precision = tp / (tp + fp)
    n_pos = tp[-1]
    if n_pos == 0:
        return 0.0
    recall = tp / n_pos
    return float(np.sum(np.diff(np.r_[0.0, recall]) * precision))


def _binary_roc_auc(y_true: np.ndarray, score: np.ndarray) -> float:
    """Mann–Whitney U with average ranks for ties (== sklearn trapezoid)."""
    n_pos = int(y_true.sum())
    n_neg = y_true.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(score, kind="mergesort")
    s_sorted = score[order]
    ranks = np.empty_like(s_sorted)
    # average ranks over tie groups
    i = 0
    r = np.arange(1, s_sorted.size + 1, dtype=np.float64)
    boundaries = np.r_[0, np.where(np.diff(s_sorted))[0] + 1, s_sorted.size]
    for a, b in zip(boundaries[:-1], boundaries[1:]):
        ranks[a:b] = r[a:b].mean()
    rank_of = np.empty_like(ranks)
    rank_of[order] = ranks
    u = rank_of[y_true == 1].sum() - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def _softmax_np(logits: np.ndarray) -> np.ndarray:
    z = logits - logits.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def auc(logits, y) -> tuple[dict, dict]:
    """Per-class one-vs-rest AUPR/AUROC dicts, rounded to 3 (losses.py:24-33)."""
    logits = np.asarray(logits)
    y = np.asarray(y).ravel().astype(np.int64)
    num_classes = int(y.max()) + 1
    ph = _softmax_np(logits)
    aupr, auroc = {}, {}
    for i in range(num_classes):
        yt = (y == i).astype(np.float64)
        aupr[i] = round(_binary_average_precision(yt, ph[:, i]), 3)
        auroc[i] = round(_binary_roc_auc(yt, ph[:, i]), 3)
    return aupr, auroc
