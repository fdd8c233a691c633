"""Styled-MNIST data-illustration grids.

Reproduces the reference's qualitative dataset figures
(code/expr_output/styled-mnist/img/{example-data,illustrate_content,
illustrate_styles}.png — produced ad hoc in its notebooks) as a scripted,
reproducible runner:

- ``example-data.png``       8x8 grid of random digits under the experiment
                             style distribution (what the training data looks
                             like);
- ``illustrate_content.png`` one digit per row, rendered under every
                             experiment style (content fixed, style varies);
- ``illustrate_styles.png``  one style per row applied to ten digits
                             (style fixed, content varies).

All styling goes through the single corruption-key protocol
(`data.styled.style_batch` via `StyledDataset.materialize`), so the pixels
here are bit-identical to what the training pipeline feeds the models.
Runs on any backend (CPU is fine; the grids are tiny).

Usage::

    python -m clearvae_tpu.experiments.illustrate [--data_root_path DIR]
        [--n_synthetic N] [--seed S] [--out DIR]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from clearvae_tpu.data.mnist import get_mnist
from clearvae_tpu.data.styled import (StyledDataset,
                                      random_style_distribution,
                                      make_styled_mnist)
from clearvae_tpu.ops.corruptions import EXPERIMENT_STYLES
from clearvae_tpu.utils.visual import make_grid, _save


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_root_path", type=str, default=None)
    p.add_argument("--n_synthetic", type=int, default=4096)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="./expr_output/styled-mnist/img")
    return p.parse_args(argv)


def example_data_grid(images, labels, seed: int) -> np.ndarray:
    """8x8 random digits under the Dirichlet style distribution the
    downstream experiments train on (reference data_utils.py:14-26)."""
    probs = random_style_distribution(
        [s for s, _ in EXPERIMENT_STYLES], seed=seed)
    ds = make_styled_mnist(images, labels, style_probs=probs, seed=seed)
    sel = np.random.RandomState(seed).choice(len(ds), 64, replace=False)
    styled = ds.materialize()[sel]
    return make_grid(styled, nrow=8)


def content_grid(images, labels, seed: int) -> np.ndarray:
    """Rows = one exemplar of each digit 0..9; columns = every style."""
    n_styles = len(EXPERIMENT_STYLES)
    rng = np.random.RandomState(seed)
    rows = []
    for digit in range(10):
        cand = np.flatnonzero(labels == digit)
        if len(cand) == 0:  # tiny synthetic sets may miss a class
            continue
        rows.append(rng.choice(cand))
    picks = np.asarray(rows)
    # repeat each picked image once per style; distinct sample ids keep the
    # per-sample corruption keys independent, like the real pipeline
    imgs = np.repeat(images[picks], n_styles, axis=0)
    lbls = np.repeat(labels[picks], n_styles, axis=0)
    style_idx = np.tile(np.arange(n_styles, dtype=np.int32), len(picks))
    ds = StyledDataset(images=imgs, labels=lbls, style_idx=style_idx,
                       seed=seed)
    return make_grid(ds.materialize(), nrow=n_styles)


def styles_grid(images, labels, seed: int, n_digits: int = 10) -> np.ndarray:
    """Rows = one experiment style applied to ``n_digits`` digits."""
    n_styles = len(EXPERIMENT_STYLES)
    rng = np.random.RandomState(seed + 1)
    picks = rng.choice(len(images), n_digits, replace=False)
    imgs = np.tile(images[picks], (n_styles, 1, 1))
    lbls = np.tile(labels[picks], n_styles)
    style_idx = np.repeat(np.arange(n_styles, dtype=np.int32), n_digits)
    ds = StyledDataset(images=imgs, labels=lbls, style_idx=style_idx,
                       seed=seed)
    return make_grid(ds.materialize(), nrow=n_digits)


def main(argv=None):
    args = get_args(argv)
    os.makedirs(args.out, exist_ok=True)
    images, labels = get_mnist(args.data_root_path, "train",
                               n_synthetic=args.n_synthetic, seed=args.seed)
    images = np.asarray(images, np.float32)
    for name, fn in [("example-data", example_data_grid),
                     ("illustrate_content", content_grid),
                     ("illustrate_styles", styles_grid)]:
        path = os.path.join(args.out, f"{name}.png")
        _save(fn(images, labels, args.seed), path)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
