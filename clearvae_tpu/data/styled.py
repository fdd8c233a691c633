"""Styled-MNIST datasets and the k-style OOD protocol.

Rebuild of the reference data layer (reference: code/src/utils/data_utils.py:29-77,
code/expr/expr_utils.py:7-57) with a TPU-native twist: instead of
materializing 60k corrupted images on the host up front
(reference data_utils.py:62-65), the style assignment is fixed per sample at
construction (reference semantics: each image keeps one style for the whole
run) but the styling itself runs **on device** — either once per dataset
(HBM-resident materialization) or per batch inside the jitted train step.
Corruption randomness is keyed by (dataset seed, sample index) so the styled
data is bit-reproducible without storage.

Images flow as [N, H, W] float32 in [0, 1] (the reference's
ToTensor + /255 transform: corruptions output 0..255, the dataset divides by
255 — reference run_styledmnist_downstream_expr.py:80).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from clearvae_tpu.ops.corruptions import EXPERIMENT_STYLES


import functools


def style_batch(style_fn, x, style_idx, sample_ids, base):
    """THE corruption-key protocol, single source of truth: per-sample key =
    fold_in(base, absolute sample id), then the style kernel, then the
    reference's /255 normalization (run_styledmnist_downstream_expr.py:80).

    Every on-device styling path composes this same traced function —
    ``StyledDataset.materialize``, the scanned styled train step
    (``train.steps.make_styled_epoch_fn``), and the probe's fused
    style+encode pass — which is what makes their pixels bit-identical.
    """
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(sample_ids)
    return jax.vmap(style_fn)(x, style_idx, keys) / 255.0


@functools.lru_cache(maxsize=None)
def _styling_program(styles: tuple):
    """One jitted styling program per style set — traced once per process,
    reused across datasets/seeds (the base key is an argument)."""
    from clearvae_tpu.ops.corruptions import make_style_fn

    style_fn = make_style_fn(styles)
    return jax.jit(functools.partial(style_batch, style_fn))


def random_style_distribution(styles: Sequence[str], seed: int | None = None) -> dict:
    """Dirichlet(10,...) style probabilities (reference data_utils.py:14-26)."""
    rng = np.random.RandomState(seed)
    probs = rng.dirichlet([10] * len(styles))
    return {s: p for s, p in zip(styles, probs)}


def generate_style_dict(classes: Sequence[int], styles: Sequence[int], k: int,
                        rng: np.random.RandomState) -> dict:
    """k random train styles per class, complement as test styles
    (reference expr_utils.py:7-15)."""
    if k < 1 or k >= len(styles):
        raise ValueError("k must be in [1, len(styles) - 1]")
    style_dict = {}
    for c in classes:
        train_styles = rng.choice(styles, k, replace=False)
        test_styles = np.setdiff1d(styles, train_styles)
        style_dict[c] = {"train": train_styles, "test": test_styles}
    return style_dict


@dataclasses.dataclass
class StyledDataset:
    """Images + labels + fixed per-sample style indices.

    ``images``: [N, H, W] float32 0..255 raw (unstyled);
    ``styled`` : [N, H, W] float32 in [0, 1] after on-device styling.
    """

    images: np.ndarray
    labels: np.ndarray
    style_idx: np.ndarray
    styles: tuple = EXPERIMENT_STYLES
    seed: int = 0
    sample_ids: np.ndarray | None = None  # absolute ids keying corruption RNG
    _styled_cache: np.ndarray | None = dataclasses.field(default=None, repr=False)

    def __post_init__(self):
        if self.sample_ids is None:
            self.sample_ids = np.arange(len(self.labels), dtype=np.int32)

    def __len__(self):
        return len(self.labels)

    def chunked_apply(self, fn, device_batch: int = 512) -> np.ndarray:
        """Run a jitted ``fn(raw, style_idx, sample_ids, base_key)`` over the
        dataset in fixed-size zero-padded chunks (one trace) and concatenate
        the unpadded results host-side. The chunk protocol every on-device
        styling consumer shares (materialize, the probe's fused
        style+encode)."""
        base = jax.random.key(self.seed)
        outs = []
        for s in range(0, len(self), device_batch):
            e = min(s + device_batch, len(self))
            pad = device_batch - (e - s)
            xs = np.pad(self.images[s:e], ((0, pad), (0, 0), (0, 0)))
            ix = np.pad(self.style_idx[s:e], (0, pad))
            si = np.pad(self.sample_ids[s:e], (0, pad))
            out = np.asarray(fn(jnp.asarray(xs), jnp.asarray(ix),
                                jnp.asarray(si), base))
            outs.append(out[: e - s])
        return np.concatenate(outs, axis=0)

    def materialize(self, device_batch: int = 512) -> np.ndarray:
        """Style the whole dataset on device once (chunked), cache host-side.

        Equivalent of the reference's up-front host materialization, but the
        kernels run on TPU. Corruption randomness is keyed by
        fold_in(seed, absolute sample id) — chunking-invariant.
        """
        if self._styled_cache is None:
            self._styled_cache = self.chunked_apply(
                _styling_program(self.styles), device_batch)
        return self._styled_cache

    def batches(self, batch_size: int, *, shuffle: bool, seed: int = 0,
                drop_last: bool | None = None,
                include_style: bool = True) -> Iterator[tuple]:
        """Yield (x [B,H,W,1] float32 in [0,1], label [B], style [B]) numpy
        batches from the materialized styled data.

        drop_last defaults to ``shuffle`` (train drops the ragged tail for a
        single jit shape; eval keeps it).
        """
        styled = self.materialize()
        n = len(self)
        if drop_last is None:
            drop_last = shuffle
        idx = np.arange(n)
        if shuffle:
            np.random.RandomState(seed).shuffle(idx)
        stop = (n // batch_size) * batch_size if drop_last else n
        for s in range(0, stop, batch_size):
            sel = idx[s:s + batch_size]
            x = styled[sel][..., None]
            if include_style:
                yield x, self.labels[sel], self.style_idx[sel]
            else:
                yield x, self.labels[sel]


def make_styled_mnist(images: np.ndarray, labels: np.ndarray,
                      style_probs: dict[str, float] | None = None,
                      styles: tuple = EXPERIMENT_STYLES,
                      seed: int = 0) -> StyledDataset:
    """Random style per image by categorical draw (reference
    StyledMNISTGenerator, data_utils.py:29-53)."""
    rng = np.random.RandomState(seed)
    names = [n for n, _ in styles]
    if style_probs is None:
        p = np.full(len(names), 1.0 / len(names))
    else:
        p = np.asarray([style_probs[n] for n in names])
        p = p / p.sum()
    style_idx = rng.choice(len(names), size=len(labels), p=p).astype(np.int32)
    return StyledDataset(np.asarray(images, np.float32), labels, style_idx,
                         styles, seed)


def make_k_styled_mnist(images: np.ndarray, labels: np.ndarray,
                        style_dict: dict, split: str,
                        styles: tuple = EXPERIMENT_STYLES,
                        seed: int = 0) -> StyledDataset:
    """Per-class k-style split assignment (reference KStyledMNISTGenerator,
    expr_utils.py:18-36)."""
    rng = np.random.RandomState(seed)
    style_idx = np.empty(len(labels), np.int32)
    for i, y in enumerate(labels):
        style_idx[i] = rng.choice(style_dict[int(y)][split])
    return StyledDataset(np.asarray(images, np.float32), labels, style_idx,
                         styles, seed)


def train_valid_split(ds: StyledDataset, train_frac: float = 0.85,
                      seed: int = 0) -> tuple[StyledDataset, StyledDataset]:
    """85/15 random split (reference run_styledmnist_downstream_expr.py:87-88)."""
    n = len(ds)
    idx = np.arange(n)
    np.random.RandomState(seed).shuffle(idx)
    cut = int(train_frac * n)
    def sub(sel):
        d = StyledDataset(ds.images[sel], ds.labels[sel], ds.style_idx[sel],
                          ds.styles, ds.seed, ds.sample_ids[sel])
        if ds._styled_cache is not None:
            d._styled_cache = ds._styled_cache[sel]
        return d
    return sub(idx[:cut]), sub(idx[cut:])
