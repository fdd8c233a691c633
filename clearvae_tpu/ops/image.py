"""Image-processing primitives shared by the corruption kernels.

Pure-jnp building blocks replacing the reference's scikit-image / OpenCV /
scipy native calls (reference: code/corruption_utils/corruptions.py:21-33):
separable Gaussian filtering, generic 2-D convolution with border modes,
bilinear sampling / inverse affine warps (skimage ``transform.warp``
semantics), area-average resize (PIL BOX), and the diamond-square plasma
fractal used by ``fog``.

Everything is static-shape and jit/vmap-safe; convolutions map onto
XLA conv ops.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# padding / convolution
# ---------------------------------------------------------------------------

# scipy/skimage border-mode names mapped to index rules:
#   'nearest'     -> edge replicate            (skimage gaussian default)
#   'reflect'     -> symmetric (edge included) (scipy 'reflect')
#   'reflect_101' -> mirror (edge excluded)    (cv2 BORDER_REFLECT_101 / scipy 'mirror')


def _border_idx(n: int, pad: int, mode: str) -> np.ndarray:
    i = np.arange(-pad, n + pad)
    if mode in ("nearest", "edge"):
        return np.clip(i, 0, n - 1)
    if mode == "reflect":  # symmetric, supports pad >= n
        period = 2 * n
        j = np.mod(i, period)
        return np.where(j >= n, period - 1 - j, j)
    if mode == "reflect_101":  # mirror
        if n == 1:
            return np.zeros_like(i)
        period = 2 * (n - 1)
        j = np.mod(i, period)
        return np.where(j >= n, period - j, j)
    raise ValueError(mode)


def _pad2d(x: Array, ph: int, pw: int, mode: str) -> Array:
    if mode == "constant":
        return jnp.pad(x, ((ph, ph), (pw, pw)), mode="constant")
    h, w = x.shape
    return x[np.asarray(_border_idx(h, ph, mode))][:, np.asarray(_border_idx(w, pw, mode))]


def conv2d_same(x: Array, kernel: Array, mode: str = "reflect_101") -> Array:
    """2-D correlation with 'same' output, choice of border mode.

    Default reflect_101 matches cv2.filter2D's BORDER_REFLECT_101
    (used by defocus_blur, reference corruptions.py:309).
    """
    kh, kw = kernel.shape
    xp = _pad2d(x, kh // 2, kw // 2, mode)
    out = jax.lax.conv_general_dilated(
        xp[None, :, :, None], kernel[:, :, None, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out[0, :, :, 0]


def gaussian_kernel_1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage-compatible 1-D Gaussian (radius = int(truncate*sigma+0.5))."""
    radius = int(truncate * sigma + 0.5)
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_filter(x: Array, sigma: float, mode: str = "nearest",
                    truncate: float = 4.0) -> Array:
    """Separable Gaussian blur; skimage.filters.gaussian defaults
    (mode='nearest', truncate=4)."""
    if sigma <= 0:
        return x
    k = jnp.asarray(gaussian_kernel_1d(sigma, truncate))
    r = (k.shape[0]) // 2
    xp = _pad2d(x, r, r, mode)
    out = jax.lax.conv_general_dilated(
        xp[None, :, :, None], k[:, None, None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        out, k[None, :, None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[0, :, :, 0]


# ---------------------------------------------------------------------------
# sampling / warps
# ---------------------------------------------------------------------------


def bilinear_sample(img: Array, rr: Array, cc: Array, cval: float = 0.0,
                    mode: str = "constant") -> Array:
    """Sample ``img`` at float coordinates (rr, cc) with bilinear weights.

    mode='constant': out-of-bounds corners contribute ``cval`` (skimage
    warp order=1 semantics). mode='edge': clamp.
    """
    h, w = img.shape
    r0 = jnp.floor(rr)
    c0 = jnp.floor(cc)
    dr = rr - r0
    dc = cc - c0
    out = jnp.zeros_like(rr)
    for (ri, ci, wgt) in [
        (r0, c0, (1 - dr) * (1 - dc)),
        (r0, c0 + 1, (1 - dr) * dc),
        (r0 + 1, c0, dr * (1 - dc)),
        (r0 + 1, c0 + 1, dr * dc),
    ]:
        ric = jnp.clip(ri, 0, h - 1).astype(jnp.int32)
        cic = jnp.clip(ci, 0, w - 1).astype(jnp.int32)
        vals = img[ric, cic]
        if mode == "constant":
            inb = (ri >= 0) & (ri <= h - 1) & (ci >= 0) & (ci <= w - 1)
            vals = jnp.where(inb, vals, cval)
        out = out + wgt * vals
    return out


def affine_warp(img: Array, matrix: Array, cval: float = 0.0) -> Array:
    """skimage ``transform.warp(img, inverse_map=AffineTransform(matrix))``.

    ``matrix`` is 3×3 homogeneous acting on (col, row) coordinates: the output
    pixel at (r, c) samples the input at (col', row') = M @ (c, r, 1)
    (reference corruptions.py:561-635 center-preserving affines).
    """
    h, w = img.shape
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    src_c = matrix[0, 0] * cols + matrix[0, 1] * rows + matrix[0, 2]
    src_r = matrix[1, 0] * cols + matrix[1, 1] * rows + matrix[1, 2]
    return bilinear_sample(img, src_r, src_c, cval=cval, mode="constant")


def center_affine(a1: float, a2: float, b1: float, b2: float,
                  center: float = 13.5):
    """Build the center-preserving 3×3 (col,row) matrix the reference uses:
    translation chosen so the image center stays fixed
    (reference corruptions.py:569-574)."""
    a3 = center * (1.0 - a1 - a2)
    b3 = center * (1.0 - b1 - b2)
    return jnp.asarray([[a1, a2, a3], [b1, b2, b3], [0.0, 0.0, 1.0]],
                       jnp.float32)


def resize_bilinear(img: Array, out_h: int, out_w: int) -> Array:
    """scipy.ndimage.zoom(order=1)-equivalent bilinear resize (used by
    clipped_zoom → zoom_blur). scipy's zoom maps output index i to input
    coordinate i·(in−1)/(out−1) — the align-corners convention (verified
    against scipy 1.x numerically; jax.image.resize 'linear' uses the
    half-pixel convention instead and differs by up to 0.08 at zoom 1.3)."""
    h, w = img.shape
    rr = (jnp.arange(out_h, dtype=jnp.float32)[:, None]
          * ((h - 1) / max(out_h - 1, 1))) * jnp.ones((1, out_w), jnp.float32)
    cc = (jnp.arange(out_w, dtype=jnp.float32)[None, :]
          * ((w - 1) / max(out_w - 1, 1))) * jnp.ones((out_h, 1), jnp.float32)
    return bilinear_sample(img, rr, cc, mode="edge")


def resize_area(img: Array, out_h: int, out_w: int) -> Array:
    """PIL BOX-filter resize (area averaging), used by ``pixelate``."""
    h, w = img.shape
    # map each output pixel to its box [i*h/out_h, (i+1)*h/out_h)
    rows = jnp.arange(h, dtype=jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)
    # weight matrix W_out[i, j] = overlap of out-row i with in-row j
    def overlap(n_out, n_in, idx_in):
        scale = n_in / n_out
        i = jnp.arange(n_out, dtype=jnp.float32)[:, None]
        lo, hi = i * scale, (i + 1) * scale
        j = idx_in[None, :]
        ov = jnp.clip(jnp.minimum(hi, j + 1) - jnp.maximum(lo, j), 0.0, 1.0)
        return ov / scale
    wr = overlap(out_h, h, rows)   # [out_h, h]
    wc = overlap(out_w, w, cols)   # [out_w, w]
    return wr @ img @ wc.T


def clipped_zoom(img: Array, zoom_factor: float) -> Array:
    """Center-crop then bilinear zoom back to the original size
    (reference corruptions.py:187-199). ``zoom_factor`` must be static."""
    h = img.shape[0]
    ch = int(math.ceil(h / float(zoom_factor)))
    top = (h - ch) // 2
    crop = img[top:top + ch, top:top + ch]
    zh = int(round(ch * zoom_factor))
    zoomed = resize_bilinear(crop, zh, zh)
    trim = (zh - h) // 2
    return jax.lax.dynamic_slice(zoomed, (trim, trim), (h, h))


# ---------------------------------------------------------------------------
# plasma fractal (diamond-square) for fog
# ---------------------------------------------------------------------------


def plasma_fractal(key, mapsize: int = 256, wibbledecay: float = 3.0) -> Array:
    """Diamond-square heightmap in [0, 1] (reference corruptions.py:131-184).

    Same recursion and wibble schedule; randomness from jax.random instead of
    np.random, vectorized per scale with static shapes.
    """
    assert mapsize & (mapsize - 1) == 0
    maparray = jnp.zeros((mapsize, mapsize), jnp.float32)
    stepsize = mapsize
    wibble = 100.0

    def wibbled_mean(array, key, wibble):
        u = jax.random.uniform(key, array.shape, jnp.float32,
                               minval=-wibble, maxval=wibble)
        return array / 4.0 + wibble * u

    while stepsize >= 2:
        key, k1, k2, k3 = jax.random.split(key, 4)
        half = stepsize // 2
        # fillsquares
        corner = maparray[0::stepsize, 0::stepsize]
        sq = corner + jnp.roll(corner, -1, axis=0)
        sq = sq + jnp.roll(sq, -1, axis=1)
        maparray = maparray.at[half::stepsize, half::stepsize].set(
            wibbled_mean(sq, k1, wibble))
        # filldiamonds
        dr = maparray[half::stepsize, half::stepsize]
        ul = maparray[0::stepsize, 0::stepsize]
        ldr = dr + jnp.roll(dr, 1, axis=0)
        lul = ul + jnp.roll(ul, -1, axis=1)
        maparray = maparray.at[0::stepsize, half::stepsize].set(
            wibbled_mean(ldr + lul, k2, wibble))
        tdr = dr + jnp.roll(dr, 1, axis=1)
        tul = ul + jnp.roll(ul, -1, axis=0)
        maparray = maparray.at[half::stepsize, 0::stepsize].set(
            wibbled_mean(tdr + tul, k3, wibble))
        stepsize //= 2
        wibble /= wibbledecay

    maparray = maparray - maparray.min()
    return maparray / maparray.max()


# ---------------------------------------------------------------------------
# line rendering (reference corruptions.py:202-221)
# ---------------------------------------------------------------------------


def line_from_points(c0, r0, c1, r1, size: int = 28) -> Array:
    """Soft anti-aliased line between (c0, r0) and (c1, r1); all coordinates
    may be traced scalars. Returns zeros when c1 == c0 like the reference."""
    cc = jnp.arange(size, dtype=jnp.float32)[None, :]
    rr = jnp.arange(size, dtype=jnp.float32)[:, None]
    c0 = jnp.asarray(c0, jnp.float32)
    c1 = jnp.asarray(c1, jnp.float32)
    r0 = jnp.asarray(r0, jnp.float32)
    r1 = jnp.asarray(r1, jnp.float32)
    denom = jnp.where(c1 == c0, 1.0, c1 - c0)
    m = (r1 - r0) / denom
    dist = jnp.clip(jnp.abs(rr - (m * (cc - c0) + r0)), 0.0, 2.3 - 1e-10)
    # clamp the log argument: XLA fusion can round dist/2.3 marginally above 1
    corr = jnp.clip(jnp.log(jnp.maximum(1.0 - dist / 2.3, 1e-30)) + 1.0, 0.0, 1.0)
    l = jnp.floor(c0)
    r = jnp.ceil(c1)
    colmask = (cc >= l) & (cc < r)
    corr = jnp.where(colmask, corr, 0.0)
    return jnp.where(c1 == c0, jnp.zeros_like(corr), jnp.clip(corr, 0.0, 1.0))


# ---------------------------------------------------------------------------
# colorspace (for brightness / saturate parity; skimage formulas)
# ---------------------------------------------------------------------------


def hsv_to_rgb(h: Array, s: Array, v: Array):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return r, g, b


def rgb_to_gray(r: Array, g: Array, b: Array) -> Array:
    """skimage rgb2gray luma weights."""
    return 0.2125 * r + 0.7154 * g + 0.0721 * b
