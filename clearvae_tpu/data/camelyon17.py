"""Camelyon17 (WILDS) adapter: tumor/normal content × hospital-as-style
(reference: code/run_camelyon17_downstream_expr.ipynb cells 4-6 — WILDS
camelyon17, resize-64, metadata column 0 = hospital id as style).

The wilds package is not installed here; we read the WILDS on-disk layout
(patches/ + metadata.csv) directly when present, else a synthetic fallback.
"""

from __future__ import annotations

import os

import numpy as np

from clearvae_tpu.data.common import ArrayDataset, kstyle_train_test_split


def load_camelyon17(root: str, image_size: int = 64,
                    max_images: int | None = None) -> ArrayDataset:
    """WILDS camelyon17_v1.0 layout: metadata.csv with columns incl.
    patient/node/x/y/tumor/center; patches under patches/…"""
    import pandas as pd
    from PIL import Image

    for base in (root, os.path.join(root, "camelyon17_v1.0")):
        meta = os.path.join(base, "metadata.csv")
        if os.path.exists(meta):
            break
    else:
        raise FileNotFoundError(f"camelyon17 metadata.csv not found in {root}")

    df = pd.read_csv(meta, index_col=0, dtype={"patient": str})
    images, labels, styles = [], [], []
    for _, row in df.iterrows():
        fname = (f"patches/patient_{row['patient']}_node_{row['node']}/"
                 f"patch_patient_{row['patient']}_node_{row['node']}"
                 f"_x_{row['x_coord']}_y_{row['y_coord']}.png")
        path = os.path.join(base, fname)
        if not os.path.exists(path):
            continue
        img = Image.open(path).convert("RGB").resize(
            (image_size, image_size), Image.BILINEAR)
        images.append(np.asarray(img, np.float32) / 255.0)
        labels.append(int(row["tumor"]))
        styles.append(int(row["center"]))
        if max_images and len(images) >= max_images:
            break
    return ArrayDataset(np.stack(images), np.asarray(labels, np.int64),
                        np.asarray(styles, np.int64))


def synthetic_camelyon17(n: int, seed: int = 0,
                         image_size: int = 64) -> ArrayDataset:
    """Binary 'tumor' blob content × 5 hospital-like stain tints."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, 2, n)
    styles = rng.randint(0, 5, n)
    tints = np.asarray([[0.9, 0.6, 0.8], [0.8, 0.5, 0.7], [0.95, 0.7, 0.75],
                        [0.7, 0.55, 0.85], [0.85, 0.65, 0.65]])
    yy, xx = np.mgrid[0:image_size, 0:image_size] / image_size
    imgs = np.empty((n, image_size, image_size, 3), np.float32)
    for i in range(n):
        base = 0.7 + 0.2 * rng.rand(image_size, image_size)
        if labels[i]:
            cx, cy = rng.rand(2) * 0.6 + 0.2
            blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / 0.02))
            base = base - 0.5 * blob
        imgs[i] = np.clip(base[..., None] * tints[styles[i]], 0, 1)
    return ArrayDataset(imgs, labels, styles)


def kcamelyon_train_test_split(ds: ArrayDataset, k: int, seed: int):
    """classes {0,1} × hospitals 0..4."""
    return kstyle_train_test_split(ds, range(2), range(5), k, seed)


def get_camelyon17(root: str | None, n_synthetic: int = 2048, seed: int = 0,
                   max_images: int | None = None) -> ArrayDataset:
    if root is not None:
        try:
            return load_camelyon17(root, max_images=max_images)
        except FileNotFoundError:
            pass
    return synthetic_camelyon17(n_synthetic, seed)
