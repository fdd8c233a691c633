"""Latent-space visualization: swapping grids, interpolation strips, t-SNE.

Rebuild of the reference visualization layer
(reference: code/src/utils/display_utils.py, code/expr/visual_utils.py) on
numpy/matplotlib — torchvision's ``make_grid`` is re-implemented in numpy.
Functions return image arrays (and save PNGs when ``save`` is given) instead
of calling ``plt.show()``, so they work headless; the reference's hard-coded
``.cuda()`` (visual_utils.py:47) is not replicated.

Images are NHWC in [0, 1].
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def interpolate_latent(latent1, latent2, num_steps: int):
    """Linear interpolation matrix [num_steps, z]
    (reference display_utils.py:11-21: p runs 1→0 so row 0 is latent1)."""
    p = jnp.linspace(1.0, 0.0, num_steps)[:, None]
    return p * latent1[None, :] + (1 - p) * latent2[None, :]


def make_grid(imgs: np.ndarray, nrow: int, padding: int = 2,
              pad_value: float = 0.0) -> np.ndarray:
    """torchvision.utils.make_grid for NHWC numpy arrays → [H', W', 3]."""
    imgs = np.asarray(imgs)
    if imgs.ndim == 3:
        imgs = imgs[..., None]
    n, h, w, c = imgs.shape
    if c == 1:
        imgs = np.repeat(imgs, 3, axis=-1)
        c = 3
    ncol = nrow  # torchvision's nrow = images per row
    nrows_ = int(np.ceil(n / ncol))
    H = nrows_ * (h + padding) + padding
    W = ncol * (w + padding) + padding
    grid = np.full((H, W, c), pad_value, np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y:y + h, x:x + w] = imgs[i]
    return grid


def make_colored_grid(imgs: np.ndarray, nrow: int, color: str) -> np.ndarray:
    """Grid with colored padding (reference visual_utils.py:13-26: padding
    value 0.25 recolored to pure red/blue)."""
    grid = make_grid(imgs, nrow=nrow, pad_value=0.25)
    mask = np.isclose(grid[..., 0], 0.25) & np.isclose(grid[..., 1], 0.25) \
        & np.isclose(grid[..., 2], 0.25)
    if color == "red":
        grid[mask] = [1.0, 0.0, 0.0]
    elif color == "blue":
        grid[mask] = [0.0, 0.0, 1.0]
    else:
        raise ValueError("other color not implemented yet")
    return grid


def _save(img: np.ndarray, save: str | None):
    if save:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(img.shape[1] / 50, img.shape[0] / 50))
        plt.imshow(np.clip(img, 0, 1))
        plt.axis("off")
        plt.savefig(save, bbox_inches="tight", dpi=150)
        plt.close()


def feature_swapping_plot(z_c, z_s, X, decode_fn, save: str | None = None):
    """n×n swap grid: every (z_c_i, z_s_j) pair decoded; source row/col images
    framed blue/red (reference visual_utils.py:29-58)."""
    z_c, z_s = jnp.asarray(z_c), jnp.asarray(z_s)
    n = z_c.shape[0]
    paired = jnp.concatenate([
        jnp.repeat(z_c[:, None, :], n, axis=1),
        jnp.repeat(z_s[None, :, :], n, axis=0),
    ], axis=-1).reshape(n * n, -1)
    x_inter = np.asarray(decode_fn(paired))  # [n*n, H, W, C]
    X = np.asarray(X)

    hgrid = make_colored_grid(X, nrow=n, color="blue")
    vgrid = make_colored_grid(X, nrow=1, color="red")
    maingrid = make_grid(x_inter, nrow=n)
    h, w = X.shape[1], X.shape[2]
    corner = np.ones((h + 4, w + 4, 3), np.float32)
    left = np.concatenate([corner, vgrid], axis=0)
    right = np.concatenate([hgrid, maingrid], axis=0)
    final = np.concatenate([left, right], axis=1)
    _save(final, save)
    return final


def interpolation_plot(X, z, decode_fn, z_dim: int, sample_size: int = 10,
                       inter_steps: int = 11, seed: int = 0,
                       save_prefix: str | None = None):
    """Style- and content-interpolation strips between random source/target
    pairs (reference visual_utils.py:61-128). Returns (style_grid,
    content_grid)."""
    z = jnp.asarray(z)
    rs = np.random.RandomState(seed)
    src_ids = rs.permutation(z.shape[0])[:sample_size]
    tgt_ids = rs.permutation(z.shape[0])[:sample_size]
    X = np.asarray(X)
    src_grid = make_colored_grid(X[src_ids], nrow=1, color="red")
    tgt_grid = make_colored_grid(X[tgt_ids], nrow=1, color="blue")
    space = np.ones((src_grid.shape[0], 8, 3), np.float32)
    src_grid = np.concatenate([src_grid, space], axis=1)
    tgt_grid = np.concatenate([space, tgt_grid], axis=1)

    style_rows, content_rows = [], []
    for i in range(sample_size):
        z1, z2 = z[src_ids[i]], z[tgt_ids[i]]
        zi = interpolate_latent(z1[z_dim:], z2[z_dim:], inter_steps)
        zc = jnp.concatenate([jnp.repeat(z1[:z_dim][None], inter_steps, 0), zi], 1)
        style_rows.append(np.asarray(decode_fn(zc)))
        zi = interpolate_latent(z1[:z_dim], z2[:z_dim], inter_steps)
        zc = jnp.concatenate([zi, jnp.repeat(z1[z_dim:][None], inter_steps, 0)], 1)
        content_rows.append(np.asarray(decode_fn(zc)))

    style_grid = make_grid(np.concatenate(style_rows), nrow=inter_steps)
    content_grid = make_grid(np.concatenate(content_rows), nrow=inter_steps)
    style_grid = np.concatenate([src_grid, style_grid, tgt_grid], axis=1)
    content_grid = np.concatenate([src_grid, content_grid, tgt_grid], axis=1)
    if save_prefix:
        _save(style_grid, save_prefix + "-style.png")
        _save(content_grid, save_prefix + "-content.png")
    return style_grid, content_grid


def display_util(idx1: int, idx2: int, z, decode_fn, z_dim: int,
                 save_prefix: str | None = None):
    """Two-image style/content interpolation strips
    (reference display_utils.py:24-51)."""
    z = jnp.asarray(z)
    z1, z2 = z[idx1], z[idx2]
    zi = interpolate_latent(z1[z_dim:], z2[z_dim:], 11)
    zc = jnp.concatenate([jnp.repeat(z1[:z_dim][None], 11, 0), zi], 1)
    style = make_grid(np.asarray(decode_fn(zc)), nrow=11)
    zi = interpolate_latent(z1[:z_dim], z2[:z_dim], 11)
    zc = jnp.concatenate([zi, jnp.repeat(z1[z_dim:][None], 11, 0)], 1)
    content = make_grid(np.asarray(decode_fn(zc)), nrow=11)
    if save_prefix:
        _save(style, save_prefix + "-style.png")
        _save(content, save_prefix + "-content.png")
    return style, content


def tsne_plot(mu_c, mu_s, labels, styles, content_labels=None,
              style_labels=None, save_prefix: str | None = None):
    """Four t-SNE scatter plots: mu_c by class & by style, mu_s by style &
    by class (reference visual_utils.py:144-183; embedding on host via
    sklearn, identical hyperparameters)."""
    from sklearn.manifold import TSNE
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mu_c, mu_s = np.asarray(mu_c), np.asarray(mu_s)
    labels, styles = np.asarray(labels), np.asarray(styles)
    if content_labels is None:
        content_labels = list(range(int(labels.max()) + 1))
    if style_labels is None:
        style_labels = list(range(int(styles.max()) + 1))

    def scatter(emb, groups, names, path):
        cmap = plt.get_cmap("viridis")
        colors = [cmap(i) for i in np.linspace(0, 1, len(names))]
        fig, ax = plt.subplots()
        for g in range(len(names)):
            i = np.where(groups == g)[0]
            ax.scatter(emb[i, 0], emb[i, 1], alpha=0.2, c=[colors[g]],
                       label=names[g])
        ax.legend()
        if path:
            fig.savefig(path, bbox_inches="tight", dpi=120)
        plt.close(fig)

    # reference uses perplexity=30 (visual_utils.py:173); sklearn requires
    # perplexity < n_samples, so clamp for tiny smoke inputs
    perp = min(30, max(2, len(mu_c) - 1))
    kw = dict(n_components=2, perplexity=perp, learning_rate=200, init="pca")
    emb_c = TSNE(**kw).fit_transform(mu_c)
    emb_s = TSNE(**kw).fit_transform(mu_s)
    p = save_prefix
    scatter(emb_c, labels, content_labels, p and p + "-muc-by-class.png")
    scatter(emb_c, styles, style_labels, p and p + "-muc-by-style.png")
    scatter(emb_s, styles, style_labels, p and p + "-mus-by-style.png")
    scatter(emb_s, labels, content_labels, p and p + "-mus-by-class.png")
    return emb_c, emb_s


def make_decode_fn(model, state):
    """Decode closure over frozen params (eval mode)."""

    @jax.jit
    def decode(z):
        return model.apply({"params": state.params,
                            "batch_stats": state.batch_stats}, z,
                           train=False, method="decode")

    return decode
