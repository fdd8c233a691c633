"""Shared dataset container + the k-style subset protocol for labeled-style
datasets (CelebA/PACS/Camelyon17), generalizing the reference's
``kceleba_train_test_split`` (reference: code/expr/expr_utils.py:60-93)."""

from __future__ import annotations

import dataclasses
from typing import Iterator

import numpy as np

from clearvae_tpu.data.styled import generate_style_dict


@dataclasses.dataclass
class ArrayDataset:
    """Images already in final form: [N, H, W, C] float32 in [0, 1],
    content labels and style labels. Same ``batches`` interface as
    StyledDataset."""

    images: np.ndarray
    labels: np.ndarray
    style_idx: np.ndarray

    def __len__(self):
        return len(self.labels)

    def subset(self, sel) -> "ArrayDataset":
        return ArrayDataset(self.images[sel], self.labels[sel],
                            self.style_idx[sel])

    def batches(self, batch_size: int, *, shuffle: bool, seed: int = 0,
                drop_last: bool | None = None,
                include_style: bool = True) -> Iterator[tuple]:
        n = len(self)
        if drop_last is None:
            drop_last = shuffle
        idx = np.arange(n)
        if shuffle:
            np.random.RandomState(seed).shuffle(idx)
        stop = (n // batch_size) * batch_size if drop_last else n
        for s in range(0, stop, batch_size):
            sel = idx[s:s + batch_size]
            if include_style:
                yield self.images[sel], self.labels[sel], self.style_idx[sel]
            else:
                yield self.images[sel], self.labels[sel]


def kstyle_train_test_split(ds: ArrayDataset, classes, styles, k: int,
                            seed: int):
    """Per-class k train styles / complement test styles, subsetting by
    (content, style) membership (reference expr_utils.py:76-93)."""
    rng = np.random.RandomState(seed)
    style_dict = generate_style_dict(list(classes), list(styles), k, rng)
    train_mask = np.zeros(len(ds), bool)
    test_mask = np.zeros(len(ds), bool)
    for c in classes:
        in_c = ds.labels == c
        train_mask |= in_c & np.isin(ds.style_idx, style_dict[c]["train"])
        test_mask |= in_c & np.isin(ds.style_idx, style_dict[c]["test"])
    return ds.subset(train_mask), ds.subset(test_mask), style_dict


def train_valid_split_array(ds: ArrayDataset, frac: float = 0.85,
                            seed: int = 0):
    idx = np.random.RandomState(seed).permutation(len(ds))
    cut = int(frac * len(ds))
    return ds.subset(idx[:cut]), ds.subset(idx[cut:])
