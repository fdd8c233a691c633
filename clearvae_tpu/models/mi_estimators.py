"""Variational MI estimators (rebuild of reference code/src/models/mi_estimator.py,
itself adapted from the public CLUB repo, arXiv:2006.12013).

Each estimator is a linen module with two entry points mirroring the
reference API:
  - ``__call__(x, y)``      → the MI estimate used as a penalty (ref ``forward``)
  - ``learning_loss(x, y)`` → −loglikelihood for training the estimator

``CLUBSample.__call__`` draws its shuffled negatives from the 'shuffle' RNG
stream (reference uses ``torch.randperm``, mi_estimator.py:138).

Parity note on ``L1OutUB``: the reference's diag mask is shaped [B,B,1] and
torch right-align-broadcasts it against the [B,B] log-density matrix into a
[B,B,B] tensor before the logsumexp over dim 0 (mi_estimator.py:185-189).
The net effect (verified numerically against torch) is

    mean(positive) - mean(all_probs) - log(B-1+e^-20) + log(B-1),

NOT the paper's leave-one-out bound. We replicate that exact computation by
default (``reference_broadcast=True``) because training dynamics depend on
it; set ``reference_broadcast=False`` for the intended leave-one-out bound.
The reference's hard-coded ``.cuda()`` (mi_estimator.py:185) is a device bug
we do not replicate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from clearvae_tpu.models.layers import DenseTorch

Array = jax.Array


class _MuLogvarNet(nn.Module):
    """Two MLPs: p_mu and p_logvar (tanh-squashed), as in the reference."""

    y_dim: int
    hidden_size: int

    def setup(self):
        h = self.hidden_size // 2
        self.mu_l1 = DenseTorch(h)
        self.mu_l2 = DenseTorch(self.y_dim)
        self.lv_l1 = DenseTorch(h)
        self.lv_l2 = DenseTorch(self.y_dim)

    def __call__(self, x):
        mu = self.mu_l2(nn.relu(self.mu_l1(x)))
        logvar = jnp.tanh(self.lv_l2(nn.relu(self.lv_l1(x))))
        return mu, logvar


def _gaussian_loglikeli(mu, logvar, y):
    """(-(mu-y)²/exp(lv) - lv).sum(1).mean(0) — the shared learning objective
    (reference mi_estimator.py:57-59 etc.)."""
    return jnp.mean(jnp.sum(-((mu - y) ** 2) / jnp.exp(logvar) - logvar, axis=1))


# Pure math for each bound given the critic outputs (mu, logvar) — kept
# separate from the linen modules so they can be golden-tested directly.


def club_bound(mu, logvar, y):
    positive = -((mu - y) ** 2) / 2.0 / jnp.exp(logvar)
    negative = -jnp.mean((y[None, :, :] - mu[:, None, :]) ** 2, axis=1) / 2.0 / jnp.exp(logvar)
    return jnp.mean(jnp.sum(positive, -1) - jnp.sum(negative, -1))


def club_mean_bound(mu, y):
    positive = -((mu - y) ** 2) / 2.0
    negative = -jnp.mean((y[None, :, :] - mu[:, None, :]) ** 2, axis=1) / 2.0
    return jnp.mean(jnp.sum(positive, -1) - jnp.sum(negative, -1))


def club_sample_bound(mu, logvar, y, perm):
    positive = -((mu - y) ** 2) / jnp.exp(logvar)
    negative = -((mu - y[perm]) ** 2) / jnp.exp(logvar)
    return jnp.mean(jnp.sum(positive, -1) - jnp.sum(negative, -1)) / 2.0


def l1out_bound(mu, logvar, y, reference_broadcast: bool = True):
    b = y.shape[0]
    positive = jnp.sum(-((mu - y) ** 2) / 2.0 / jnp.exp(logvar) - logvar / 2.0, -1)
    all_probs = jnp.sum(
        -((y[None, :, :] - mu[:, None, :]) ** 2) / 2.0 / jnp.exp(logvar[:, None, :])
        - logvar[:, None, :] / 2.0,
        axis=-1,
    )
    if reference_broadcast:
        negative = all_probs + jnp.log(b - 1.0 + jnp.exp(-20.0)) - jnp.log(b - 1.0)
        return jnp.mean(positive[None, :] - negative)
    diag = jnp.eye(b) * (-20.0)
    negative = jax.nn.logsumexp(all_probs + diag, axis=0) - jnp.log(b - 1.0)
    return jnp.mean(positive - negative)


def var_ub_bound(mu, logvar):
    return 0.5 * jnp.mean(mu**2 + jnp.exp(logvar) - 1.0 - logvar)


class CLUB(nn.Module):
    """CLUB upper bound (reference mi_estimator.py:9-62)."""

    x_dim: int
    y_dim: int
    hidden_size: int

    def setup(self):
        self.net = _MuLogvarNet(self.y_dim, self.hidden_size)

    def __call__(self, x, y):
        mu, logvar = self.net(x)
        return club_bound(mu, logvar, y)

    def learning_loss(self, x, y):
        mu, logvar = self.net(x)
        return -_gaussian_loglikeli(mu, logvar, y)


class CLUBMean(nn.Module):
    """CLUB with unit variance (reference mi_estimator.py:65-105)."""

    x_dim: int
    y_dim: int
    hidden_size: int | None = None

    def setup(self):
        if self.hidden_size is None:
            self.mu_l1 = None
            self.mu_out = DenseTorch(self.y_dim)
        else:
            self.mu_l1 = DenseTorch(int(self.hidden_size))
            self.mu_out = DenseTorch(self.y_dim)

    def _mu(self, x):
        if self.mu_l1 is None:
            return self.mu_out(x)
        return self.mu_out(nn.relu(self.mu_l1(x)))

    def __call__(self, x, y):
        return club_mean_bound(self._mu(x), y)

    def learning_loss(self, x, y):
        mu = self._mu(x)
        return -jnp.mean(jnp.sum(-((mu - y) ** 2), axis=1))


class CLUBSample(nn.Module):
    """Sampled CLUB ('CLUB-S', used in the experiments;
    reference mi_estimator.py:108-146)."""

    x_dim: int
    y_dim: int
    hidden_size: int

    def setup(self):
        self.net = _MuLogvarNet(self.y_dim, self.hidden_size)

    def __call__(self, x, y):
        mu, logvar = self.net(x)
        perm = jax.random.permutation(self.make_rng("shuffle"), y.shape[0])
        return club_sample_bound(mu, logvar, y, perm)

    def learning_loss(self, x, y):
        mu, logvar = self.net(x)
        return -_gaussian_loglikeli(mu, logvar, y)


class L1OutUB(nn.Module):
    """Leave-one-out upper bound (reference mi_estimator.py:149-198).

    See module docstring: by default replicates the reference's broadcast
    behavior exactly.
    """

    x_dim: int
    y_dim: int
    hidden_size: int
    reference_broadcast: bool = True

    def setup(self):
        self.net = _MuLogvarNet(self.y_dim, self.hidden_size)

    def __call__(self, x, y):
        mu, logvar = self.net(x)
        return l1out_bound(mu, logvar, y, self.reference_broadcast)

    def learning_loss(self, x, y):
        mu, logvar = self.net(x)
        return -_gaussian_loglikeli(mu, logvar, y)


class VarUB(nn.Module):
    """Variational upper bound (reference mi_estimator.py:201-231, unused by runners)."""

    x_dim: int
    y_dim: int
    hidden_size: int

    def setup(self):
        self.net = _MuLogvarNet(self.y_dim, self.hidden_size)

    def __call__(self, x, y):
        mu, logvar = self.net(x)
        return var_ub_bound(mu, logvar)

    def learning_loss(self, x, y):
        mu, logvar = self.net(x)
        return -_gaussian_loglikeli(mu, logvar, y)


class InfoNCE(nn.Module):
    """InfoNCE lower bound (reference mi_estimator.py:245-273, unused by runners)."""

    x_dim: int
    y_dim: int
    hidden_size: int

    def setup(self):
        self.f_l1 = DenseTorch(self.hidden_size)
        self.f_l2 = DenseTorch(1)

    def _f(self, xy):
        return jax.nn.softplus(self.f_l2(nn.relu(self.f_l1(xy))))

    def __call__(self, x, y):
        b = y.shape[0]
        t0 = self._f(jnp.concatenate([x, y], axis=-1))  # [B, 1]
        x_tile = jnp.broadcast_to(x[None, :, :], (b, b, x.shape[-1]))
        y_tile = jnp.broadcast_to(y[:, None, :], (b, b, y.shape[-1]))
        t1 = self._f(jnp.concatenate([x_tile, y_tile], axis=-1))  # [B, B, 1]
        return jnp.mean(t0) - (jnp.mean(jax.nn.logsumexp(t1, axis=1)) - jnp.log(b))

    def learning_loss(self, x, y):
        return -self(x, y)


MI_ESTIMATORS = {
    "club": CLUB,
    "club_mean": CLUBMean,
    "club_sample": CLUBSample,
    "l1out": L1OutUB,
    "var_ub": VarUB,
    "infonce": InfoNCE,
}

# reference-spelling aliases (trainer factory strings, trainer_utils.py:175)
MI_ESTIMATORS.update({
    "CLUB": CLUB, "CLUBMean": CLUBMean, "CLUBSample": CLUBSample,
    "L1OutUB": L1OutUB, "VarUB": VarUB, "InfoNCE": InfoNCE,
})
