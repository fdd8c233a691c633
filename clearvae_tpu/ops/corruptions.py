"""MNIST-C corruption library as pure JAX kernels — the on-device styling
pipeline (rebuild of reference code/corruption_utils/corruptions.py, itself
derived from the public MNIST-C / google-research corruptions, Apache-2.0).

Design differences from the reference (which runs on host via scikit-image /
OpenCV / ImageMagick-ctypes, materializing whole datasets up front,
reference data_utils.py:62-65):

  - every corruption is a pure function ``fn(x, key, severity)`` with
    x: [28, 28] float32 in [0, 255], key: jax PRNG key, severity: static int.
    Deterministic corruptions ignore ``key``.
  - all shapes are static; everything jits, vmaps over the batch, and
    dispatches by per-sample style index via ``lax.switch``
    (see :func:`make_style_fn`), so styling runs inside the training step on
    TPU with the batch HBM-resident.
  - randomness is keyed (seed, sample index) → reproducible and regenerable,
    replacing the reference's global np.random state.
  - ``motion_blur`` / ``snow`` replace the ImageMagick C motion-blur call
    (reference corruptions.py:116-127) with a directional Gaussian
    line-sampling kernel.
  - ``frost`` uses a procedural texture: the reference's frost PNGs are not
    shipped in its repo (its ``frost`` crashes; SURVEY §2.1).
  - ``canny_edges`` is a full Canny (Gaussian, Sobel, interpolated NMS,
    hysteresis by iterated dilation) following skimage defaults
    (sigma=1, low=0.1, high=0.2).

Severity defaults match the reference signatures exactly.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from clearvae_tpu.ops.image import (
    affine_warp,
    bilinear_sample,
    center_affine,
    clipped_zoom,
    conv2d_same,
    gaussian_filter,
    hsv_to_rgb,
    line_from_points,
    plasma_fractal,
    resize_area,
    rgb_to_gray,
)

Array = jax.Array

# Names in reference order (corruptions.py:40-92)
CORRUPTIONS = [
    "identity", "shot_noise", "impulse_noise", "glass_blur", "motion_blur",
    "shear", "scale", "rotate", "brightness", "translate", "stripe", "fog",
    "spatter", "dotted_line", "zigzag", "canny_edges",
]

ALL_CORRUPTIONS = [
    "identity", "gaussian_noise", "shot_noise", "impulse_noise",
    "speckle_noise", "pessimal_noise", "gaussian_blur", "glass_blur",
    "defocus_blur", "motion_blur", "zoom_blur", "fog", "frost", "snow",
    "spatter", "contrast", "brightness", "saturate", "jpeg_compression",
    "pixelate", "elastic_transform", "quantize", "shear", "rotate", "scale",
    "translate", "line", "dotted_line", "zigzag", "inverse", "stripe",
    "canny_edges",
]

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "data_assets")


@functools.lru_cache(maxsize=1)
def _pessimal_matrix() -> np.ndarray:
    return np.load(os.path.join(_ASSET_DIR, "pessimal_noise_matrix.npy"))


def _as01(x: Array) -> Array:
    return jnp.asarray(x, jnp.float32) / 255.0


def _to255(x: Array) -> Array:
    return (jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.float32)


# ---------------------------------------------------------------------------
# noises
# ---------------------------------------------------------------------------


def identity(x, key=None, severity=None):
    return jnp.asarray(x, jnp.float32)


def gaussian_noise(x, key, severity=5):
    c = [0.08, 0.12, 0.18, 0.26, 0.38][severity - 1]
    x = _as01(x)
    n = jax.random.normal(key, x.shape) * c
    return _to255(x + n)


def shot_noise(x, key, severity=5):
    c = [60, 25, 12, 5, 3][severity - 1]
    x = _as01(x)
    return _to255(jax.random.poisson(key, x * c).astype(jnp.float32) / float(c))


def impulse_noise(x, key, severity=4):
    """Salt & pepper on fraction c of pixels (sk.util.random_noise 's&p')."""
    c = [0.03, 0.06, 0.09, 0.17, 0.27][severity - 1]
    x = _as01(x)
    u = jax.random.uniform(key, x.shape)
    x = jnp.where(u < c / 2, 1.0, x)          # salt
    x = jnp.where((u >= c / 2) & (u < c), 0.0, x)  # pepper
    return _to255(x)


def speckle_noise(x, key, severity=5):
    c = [0.15, 0.2, 0.35, 0.45, 0.6][severity - 1]
    x = _as01(x)
    return _to255(x + x * jax.random.normal(key, x.shape) * c)


def pessimal_noise(x, key, severity=1):
    """Adversarially-correlated tiled noise (reference corruptions.py:266-273,
    matrix shipped as a data asset)."""
    c = 10.63
    x = _as01(x)
    mat = jnp.asarray(_pessimal_matrix())
    noise = jax.random.normal(key, (196,)) @ mat
    scaled = noise / jnp.linalg.norm(noise) * c / 4.0
    tiled = jnp.tile(scaled.reshape(14, 14), (2, 2))
    return _to255(x + tiled)


# ---------------------------------------------------------------------------
# blurs
# ---------------------------------------------------------------------------


def gaussian_blur(x, key=None, severity=2):
    c = [1, 2, 3, 4, 6][severity - 1]
    return _to255(gaussian_filter(_as01(x), float(c)))


def _glass_swap_coords(max_delta: int, iterations: int, size: int = 28):
    coords = []
    for _ in range(iterations):
        for h in range(size - max_delta, max_delta, -1):
            for w in range(size - max_delta, max_delta, -1):
                coords.append((h, w))
    return np.asarray(coords, np.int32)


def glass_blur(x, key, severity=1):
    """Gaussian blur + local random pixel swaps + blur
    (reference corruptions.py:284-301); the raster-order swap sequence runs
    as one lax.scan."""
    sigma, max_delta, iterations = \
        [(0.7, 1, 2), (0.9, 2, 1), (1, 2, 3), (1.1, 3, 2), (1.5, 4, 2)][severity - 1]
    x = gaussian_filter(_as01(x), float(sigma))
    x = jnp.asarray(jnp.clip(x * 255.0, 0, 255).astype(jnp.uint8), jnp.float32)

    coords = jnp.asarray(_glass_swap_coords(max_delta, iterations))
    n = coords.shape[0]
    k1, k2 = jax.random.split(key)
    do_swap = jax.random.bernoulli(k1, 0.5, (n,))
    deltas = jax.random.randint(k2, (n, 2), -max_delta, max_delta)

    def body(img, inp):
        (h, w), swap, (dx, dy) = inp
        hp, wp = h + dy, w + dx
        a, b = img[h, w], img[hp, wp]
        img = img.at[h, w].set(jnp.where(swap, b, a))
        img = img.at[hp, wp].set(jnp.where(swap, a, b))
        return img, None

    x, _ = jax.lax.scan(body, x, (coords, do_swap, deltas))
    return _to255(gaussian_filter(x / 255.0, float(sigma)))


@functools.lru_cache(maxsize=None)
def _disk_kernel(radius: int, alias_blur: float) -> np.ndarray:
    """Anti-aliased disk kernel, a static trace-time constant
    (reference corruptions.py:100-112)."""
    import cv2  # host-side only; kernel is baked into the compiled program

    if radius <= 8:
        L = np.arange(-8, 8 + 1)
        ksize = (3, 3)
    else:
        L = np.arange(-radius, radius + 1)
        ksize = (5, 5)
    X, Y = np.meshgrid(L, L)
    disk = np.asarray((X**2 + Y**2) <= radius**2, np.float32)
    disk /= disk.sum()
    return cv2.GaussianBlur(disk, ksize=ksize, sigmaX=alias_blur)


def defocus_blur(x, key=None, severity=1):
    c = [(3, 0.1), (4, 0.5), (6, 0.5), (8, 0.5), (10, 0.5)][severity - 1]
    kernel = jnp.asarray(_disk_kernel(c[0], c[1]))
    return _to255(conv2d_same(_as01(x), kernel, mode="reflect_101"))


def _directional_blur(x01: Array, radius: float, sigma: float, angle_deg: Array) -> Array:
    """Directional (motion) blur: one-sided Gaussian line sampling — the
    TPU-native replacement for ImageMagick MotionBlurImage
    (reference corruptions.py:116-127, 315-326)."""
    n = int(math.ceil(radius)) + 1
    i = jnp.arange(n, dtype=jnp.float32)
    w = jnp.exp(-(i**2) / (2.0 * sigma**2))
    w = w / jnp.sum(w)
    theta = angle_deg * (math.pi / 180.0)
    dx = jnp.cos(theta)
    dy = jnp.sin(theta)
    h, wid = x01.shape
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, wid), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, wid), 1)

    def tap(carry, iw):
        ii, wi = iw
        rr = rows - ii * dy
        cc = cols + ii * dx
        return carry + wi * bilinear_sample(x01, rr, cc, mode="edge"), None

    out, _ = jax.lax.scan(tap, jnp.zeros_like(x01), (i, w))
    return out


def motion_blur(x, key, severity=1):
    c = [(10, 3), (15, 5), (15, 8), (15, 12), (20, 15)][severity - 1]
    angle = jax.random.uniform(key, (), minval=-45.0, maxval=45.0)
    x = _as01(x)
    return _to255(_directional_blur(x, float(c[0]), float(c[1]), angle))


def zoom_blur(x, key=None, severity=5):
    cs = [np.arange(1, 1.11, 0.01), np.arange(1, 1.16, 0.01),
          np.arange(1, 1.21, 0.02), np.arange(1, 1.26, 0.02),
          np.arange(1, 1.31, 0.03)][severity - 1]
    x = _as01(x)
    out = jnp.zeros_like(x)
    for z in cs:  # static unrolled zoom factors
        out = out + clipped_zoom(x, float(z))
    return _to255((x + out) / (len(cs) + 1))


# ---------------------------------------------------------------------------
# weather
# ---------------------------------------------------------------------------


def fog(x, key, severity=5):
    c = [(1.5, 2), (2.0, 2), (2.5, 1.7), (2.5, 1.5), (3.0, 1.4)][severity - 1]
    x = _as01(x)
    max_val = jnp.max(x)
    fog_map = plasma_fractal(key, mapsize=256, wibbledecay=c[1])[:28, :28]
    x = x + c[0] * fog_map
    return _to255(x * max_val / (max_val + c[0]))


def frost(x, key, severity=5):
    """Procedural frost overlay. DEVIATION: the reference samples crops from
    frost PNGs it does not ship (corruptions.py:357-378 crashes); we
    synthesize a frost-like texture from band-passed noise instead, keeping
    the same blend weights."""
    c = [(1, 0.4), (0.8, 0.6), (0.7, 0.7), (0.65, 0.7), (0.6, 0.75)][severity - 1]
    k1, k2 = jax.random.split(key)
    noise = jax.random.uniform(k1, (28, 28))
    tex = gaussian_filter(noise, 1.5, mode="reflect")
    tex = (tex - tex.min()) / (tex.max() - tex.min() + 1e-8)
    crystals = jnp.where(tex > 0.55, tex, 0.3 * tex)
    frost_img = 255.0 * crystals
    x = jnp.asarray(x, jnp.float32)
    return jnp.clip(c[0] * x + c[1] * frost_img, 0, 255).astype(jnp.float32)


def snow(x, key, severity=5):
    c = [(0.1, 0.3, 3, 0.5, 10, 4, 0.8), (0.2, 0.3, 2, 0.5, 12, 4, 0.7),
         (0.55, 0.3, 4, 0.9, 12, 8, 0.7), (0.55, 0.3, 4.5, 0.85, 12, 8, 0.65),
         (0.55, 0.3, 2.5, 0.85, 12, 12, 0.55)][severity - 1]
    k1, k2 = jax.random.split(key)
    x = _as01(x)
    layer = jax.random.normal(k1, x.shape) * c[1] + c[0]
    layer = clipped_zoom(layer, float(c[2]))
    layer = jnp.where(layer < c[3], 0.0, layer)
    layer = jnp.clip(layer, 0.0, 1.0)
    # uint8 PNG round-trip in the reference quantizes the layer
    layer = jnp.round(layer * 255.0) / 255.0
    angle = jax.random.uniform(k2, (), minval=-135.0, maxval=-45.0)
    layer = _directional_blur(layer, float(c[4]), float(c[5]), angle)
    x = c[6] * x + (1 - c[6]) * jnp.maximum(x, x * 1.5 + 0.5)
    return _to255(x + layer + jnp.rot90(layer, k=2))


def spatter(x, key, severity=4):
    c = [(0.65, 0.3, 4, 0.69, 0.6, 0), (0.65, 0.3, 3, 0.68, 0.6, 0),
         (0.65, 0.3, 2, 0.68, 0.5, 0), (0.65, 0.3, 1, 0.65, 1.5, 1),
         (0.67, 0.4, 1, 0.65, 1.5, 1)][severity - 1]
    x = _as01(x)
    liquid = jax.random.normal(key, x.shape) * c[1] + c[0]
    liquid = gaussian_filter(liquid, float(c[2]))
    liquid = jnp.where(liquid < c[3], 0.0, liquid)
    m = jnp.where(liquid > c[3], 1.0, 0.0)
    m = gaussian_filter(m, float(c[4]))
    m = jnp.where(m < 0.8, 0.0, m)
    color = 63.0 / 255.0 * jnp.ones_like(x) * m
    x = x * (1 - m)
    return _to255(x + color)


# ---------------------------------------------------------------------------
# photometric
# ---------------------------------------------------------------------------


def contrast(x, key=None, severity=4):
    c = [0.4, 0.3, 0.2, 0.1, 0.05][severity - 1]
    x = _as01(x)
    means = jnp.mean(x)
    return _to255((x - means) * c + means)


def brightness(x, key=None, severity=5):
    """For grayscale input the reference's gray→HSV→(v+c)→gray round-trip is
    exactly clip(x + c) (r=g=b=v cancels the luma weights)."""
    c = [0.1, 0.2, 0.3, 0.4, 0.5][severity - 1]
    x = _as01(x)
    return _to255(x + c)


def saturate(x, key=None, severity=5):
    """Grayscale HSV round-trip with the clip applied to ALL hsv channels
    (reference corruptions.py:469-480: h'=clip(0*c0+c1), s'=clip(c1),
    v'=clip(v*c0+c1)) then luma-weighted gray."""
    c = [(0.3, 0), (0.1, 0), (2, 0), (5, 0.1), (20, 0.2)][severity - 1]
    x = _as01(x)
    h = jnp.clip(jnp.zeros_like(x) * c[0] + c[1], 0, 1)
    s = jnp.clip(jnp.zeros_like(x) * c[0] + c[1], 0, 1)
    v = jnp.clip(x * c[0] + c[1], 0, 1)
    r, g, b = hsv_to_rgb(h, s, v)
    return _to255(rgb_to_gray(r, g, b))


# ---------------------------------------------------------------------------
# digital
# ---------------------------------------------------------------------------

_JPEG_LUMA_Q = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61], [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56], [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77], [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101], [72, 92, 95, 98, 112, 100, 103, 99],
], np.float32)


def _dct_matrix(n: int = 8) -> np.ndarray:
    m = np.zeros((n, n), np.float32)
    for k in range(n):
        for i in range(n):
            m[k, i] = math.cos(math.pi * k * (2 * i + 1) / (2 * n))
    m *= math.sqrt(2.0 / n)
    m[0] /= math.sqrt(2.0)
    return m


def jpeg_compression(x, key=None, severity=5):
    """8×8 DCT quantization round-trip with the libjpeg quality→table scaling
    — an on-device stand-in for PIL's JPEG encode (corruptions.py:483-490)."""
    q = [25, 18, 15, 10, 7][severity - 1]
    scale = 5000 / q if q < 50 else 200 - 2 * q
    table = np.clip(np.floor((_JPEG_LUMA_Q * scale + 50) / 100), 1, 255)
    d = jnp.asarray(_dct_matrix())
    t = jnp.asarray(table)
    x = jnp.asarray(x, jnp.float32)
    xp = jnp.pad(x, ((0, 4), (0, 4)), mode="edge") - 128.0  # 28 -> 32
    blocks = xp.reshape(4, 8, 4, 8).transpose(0, 2, 1, 3)    # [4,4,8,8]
    coef = jnp.einsum("ki,bcij,lj->bckl", d, blocks, d)
    coef = jnp.round(coef / t) * t
    rec = jnp.einsum("ki,bckl,lj->bcij", d, coef, d)
    out = rec.transpose(0, 2, 1, 3).reshape(32, 32) + 128.0
    return jnp.clip(out[:28, :28], 0, 255).astype(jnp.float32)


def pixelate(x, key=None, severity=3):
    c = [0.6, 0.5, 0.4, 0.3, 0.25][severity - 1]
    x = jnp.asarray(x, jnp.float32)
    small = resize_area(x, int(28 * c), int(28 * c))
    return resize_area(small, 28, 28).astype(jnp.float32)


def elastic_transform(x, key, severity=1):
    c = [(28 * 2, 28 * 0.7, 28 * 0.1), (28 * 2, 28 * 0.08, 28 * 0.2),
         (28 * 0.05, 28 * 0.01, 28 * 0.02), (28 * 0.07, 28 * 0.01, 28 * 0.02),
         (28 * 0.12, 28 * 0.01, 28 * 0.02)][severity - 1]
    k1, k2, k3 = jax.random.split(key, 3)
    img = _as01(x)
    h, w = img.shape

    # random affine from 3 point correspondences (cv2.getAffineTransform +
    # warpAffine, reference corruptions.py:516-527)
    center = np.float32([h, w]) // 2
    sq = float(min(h, w) // 3)
    pts1 = jnp.asarray([
        [center[0] + sq, center[1] + sq],
        [center[0] + sq, center[1] - sq],
        [center[0] - sq, center[1] - sq],
    ], jnp.float32)
    pts2 = pts1 + jax.random.uniform(k1, (3, 2), minval=-c[2], maxval=c[2])
    a = jnp.concatenate([pts1, jnp.ones((3, 1))], axis=1)  # [3,3]
    # forward map M: pts1 -> pts2 (x' = M @ [x, y, 1]); invert for sampling
    mx = jnp.linalg.solve(a, pts2[:, 0])
    my = jnp.linalg.solve(a, pts2[:, 1])
    fwd = jnp.stack([mx, my, jnp.asarray([0.0, 0.0, 1.0])])
    inv = jnp.linalg.inv(fwd)
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    src_c = inv[0, 0] * cols + inv[0, 1] * rows + inv[0, 2]
    src_r = inv[1, 0] * cols + inv[1, 1] * rows + inv[1, 2]
    img = bilinear_sample(img, src_r, src_c, cval=0.0, mode="constant")

    dx = gaussian_filter(jax.random.uniform(k2, (h, w), minval=-1, maxval=1),
                         c[1], mode="reflect", truncate=3.0) * c[0]
    dy = gaussian_filter(jax.random.uniform(k3, (h, w), minval=-1, maxval=1),
                         c[1], mode="reflect", truncate=3.0) * c[0]
    out = bilinear_sample(img, rows + dy, cols + dx, cval=0.0, mode="constant")
    return _to255(out)


def quantize(x, key=None, severity=5):
    bits = [5, 4, 3, 2, 1][severity - 1]
    x = jnp.asarray(x, jnp.float32)
    x = x * ((2**bits - 1) / 255.0)
    x = jnp.round(x)
    return (x * (255.0 / (2**bits - 1))).astype(jnp.float32)


# ---------------------------------------------------------------------------
# affine family (center-preserving, reference corruptions.py:561-635)
# ---------------------------------------------------------------------------


def shear(x, key, severity=2):
    c = [0.2, 0.4, 0.6, 0.8, 1.0][severity - 1]
    bit = jnp.where(jax.random.bernoulli(key, 0.5), 1.0, -1.0)
    cc = c * bit
    # skimage AffineTransform(shear=c): [[1, -sin(c)], [0, cos(c)]]
    m = center_affine(1.0, -jnp.sin(cc), 0.0, jnp.cos(cc))
    return _to255(affine_warp(_as01(x), m))


def rotate(x, key, severity=2):
    c = [0.2, 0.4, 0.6, 0.8, 1.0][severity - 1]
    bit = jnp.where(jax.random.bernoulli(key, 0.5), 1.0, -1.0)
    cc = c * bit
    m = center_affine(jnp.cos(cc), -jnp.sin(cc), jnp.sin(cc), jnp.cos(cc))
    return _to255(affine_warp(_as01(x), m))


def scale(x, key=None, severity=3):
    c = [1 / 0.9, 1 / 0.8, 1 / 0.7, 1 / 0.6, 1 / 0.5][severity - 1]
    m = center_affine(c, 0.0, 0.0, c)
    return _to255(affine_warp(_as01(x), m))


def translate(x, key, severity=3):
    c = [1, 2, 3, 4, 5][severity - 1]
    bits = jnp.where(jax.random.bernoulli(key, 0.5, (2,)), 1.0, -1.0)
    m = jnp.asarray([[1.0, 0.0, c * bits[0]], [0.0, 1.0, c * bits[1]],
                     [0.0, 0.0, 1.0]], jnp.float32)
    return _to255(affine_warp(_as01(x), m))


# ---------------------------------------------------------------------------
# drawing (reference corruptions.py:638-722)
# ---------------------------------------------------------------------------


def line(x, key, severity=None):
    k1, k2, k3 = jax.random.split(key, 3)
    x = _as01(x)
    c0 = jax.random.randint(k1, (), 0, 5)
    c1 = jax.random.randint(k2, (), 22, 27)
    r = jax.random.randint(k3, (2,), 0, 27)
    corr = line_from_points(c0, r[0], c1, r[1])
    return _to255(x + corr)


def dotted_line(x, key, severity=None):
    x = _as01(x)
    r = jax.random.randint(key, (2,), 0, 27)
    corr = line_from_points(0, r[0], 27, r[1])
    # zero alternating 2-column bands starting at column 0 (reference :654-659)
    cols = np.arange(28)
    keep = (cols // 2) % 2 == 1
    corr = corr * jnp.asarray(keep, jnp.float32)[None, :]
    return _to255(x + corr)


def zigzag(x, key, severity=None):
    """Zigzag stroke (reference corruptions.py:665-704).

    With c0=2, c1=25 and |r1-r0|<=5 the reference's endpoint count is always
    8 (6 zigzag vertices + origin + tail), so the geometry unrolls statically.
    """
    x = _as01(x)
    k1, k2 = jax.random.split(key)
    a = b = 2.0
    c0, c1 = 2.0, 25.0
    r0 = jax.random.randint(k1, (), 0, 27).astype(jnp.float32)
    r1 = r0 + jax.random.randint(k2, (), -5, 5).astype(jnp.float32)
    theta = jnp.arctan((r1 - r0) / (c1 - c0))
    d = (c1 - c0) / jnp.cos(theta)

    # endpoints (before rotation): (0,0), then 6 vertices, then the tail
    cs = [jnp.asarray(0.0)]
    rs = [jnp.asarray(0.0)]
    r_i = jnp.asarray(0.0)
    for i in range(6):  # int((d - a)//(2a)) + 1 == 6 for all r0, r1 here
        c_i = (2 * i + 1) * a
        r_i = jnp.asarray((-1.0) ** i * b)
        cs.append(jnp.asarray(c_i))
        rs.append(r_i)
    max_c = (2 * a) * (d // (2 * a))
    cs.append(d)
    rs.append(r_i / (2 * (d - max_c)))
    cs = jnp.stack(cs)
    rs = jnp.stack(rs)

    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    cs_rot = cos_t * cs - sin_t * rs + c0
    rs_rot = sin_t * cs + cos_t * rs + r0

    for i in range(1, 8):
        x = jnp.clip(x + line_from_points(cs_rot[i - 1], rs_rot[i - 1],
                                          cs_rot[i], rs_rot[i]), 0.0, 1.0)
    return (x * 255.0).astype(jnp.float32)


def inverse(x, key=None, severity=None):
    return 255.0 - jnp.asarray(x, jnp.float32)


def stripe(x, key=None, severity=None):
    x = jnp.asarray(x, jnp.float32)
    cols = np.arange(x.shape[1])
    flip = jnp.asarray((cols < 7) | (cols >= 21), jnp.float32)[None, :]
    return flip * (255.0 - x) + (1 - flip) * x


# ---------------------------------------------------------------------------
# canny (reference uses skimage.feature.canny, corruptions.py:719-722)
# ---------------------------------------------------------------------------


def canny_edges(x, key=None, severity=None, sigma: float = 1.0,
                low_threshold: float = 0.1, high_threshold: float = 0.2):
    """Canny edges: Gaussian smooth, Sobel, interpolated non-maximum
    suppression, double threshold + hysteresis by iterated dilation
    (skimage defaults: sigma=1, low=0.1, high=0.2 of max for float images)."""
    img = _as01(x)
    h, w = img.shape

    # skimage smooths with a boundary mask: blur image and mask, divide
    mask = jnp.ones_like(img)
    smoothed = gaussian_filter(img, sigma, mode="constant")
    msum = gaussian_filter(mask, sigma, mode="constant")
    smoothed = smoothed / jnp.maximum(msum, 1e-12)
    # erode the valid mask by one pixel like skimage
    eroded = jnp.zeros_like(mask).at[1:-1, 1:-1].set(1.0)

    sob = jnp.asarray([[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]])
    gx = conv2d_same(smoothed, sob.T, mode="constant") / 4.0
    gy = conv2d_same(smoothed, sob, mode="constant") / 4.0
    mag = jnp.hypot(gx, gy)

    # interpolated NMS (skimage _get_local_maxima logic, vectorized)
    ax = jnp.abs(gx)
    ay = jnp.abs(gy)
    pad = jnp.pad(mag, 1)
    sl = lambda dr, dc: pad[1 + dr:1 + dr + h, 1 + dc:1 + dc + w]
    same_sign = (gx * gy) >= 0

    def interp_max(is_horizontal):
        # weight along the dominant axis
        wgt = jnp.where(is_horizontal, ay / jnp.maximum(ax, 1e-12),
                        ax / jnp.maximum(ay, 1e-12))
        def pair(d_main, d_diag):
            return (1 - wgt) * d_main + wgt * d_diag
        # horizontal-dominant: neighbors (0,±1) blended with diagonals
        diag1 = jnp.where(same_sign, sl(1, 1), sl(-1, 1))
        diag2 = jnp.where(same_sign, sl(-1, -1), sl(1, -1))
        n1h, n2h = pair(sl(0, 1), diag1), pair(sl(0, -1), diag2)
        # vertical-dominant: neighbors (±1,0) blended with diagonals
        diag1v = jnp.where(same_sign, sl(1, 1), sl(1, -1))
        diag2v = jnp.where(same_sign, sl(-1, -1), sl(-1, 1))
        n1v, n2v = pair(sl(1, 0), diag1v), pair(sl(-1, 0), diag2v)
        n1 = jnp.where(is_horizontal, n1h, n1v)
        n2 = jnp.where(is_horizontal, n2h, n2v)
        return (mag >= n1) & (mag >= n2)

    is_h = ax >= ay
    local_max = interp_max(is_h) & (mag > 0) & (eroded > 0)

    low = low_threshold
    high = high_threshold
    weak = local_max & (mag > low)
    strong = local_max & (mag > high)

    # hysteresis: propagate strong labels through weak pixels (8-connectivity)
    def dilate(m):
        mp = jnp.pad(m.astype(jnp.float32), 1)
        out = jnp.zeros_like(m, jnp.float32)
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                out = jnp.maximum(out, mp[1 + dr:1 + dr + h, 1 + dc:1 + dc + w])
        return out > 0

    def body(_, s):
        return dilate(s) & weak

    result = jax.lax.fori_loop(0, h + w, body, strong)
    return (result.astype(jnp.float32)) * 255.0


# ---------------------------------------------------------------------------
# Colored-MNIST (reference corruptions.py:725-742)
# ---------------------------------------------------------------------------

COLOR_DICT = {
    "red": [0], "green": [1], "blue": [2], "yellow": [0, 1],
    "cyan": [1, 2], "magenta": [0, 2], "white": [0, 1, 2],
}


def rgb_change(x, color: str):
    x = jnp.asarray(x, jnp.float32) / 255.0
    rgb = jnp.zeros((28, 28, 3), jnp.float32)
    for ch in COLOR_DICT[color]:
        rgb = rgb.at[:, :, ch].set(x)
    return rgb * 255.0


# ---------------------------------------------------------------------------
# registry + batched style dispatch
# ---------------------------------------------------------------------------

CORRUPTION_FNS = {
    "identity": identity, "gaussian_noise": gaussian_noise,
    "shot_noise": shot_noise, "impulse_noise": impulse_noise,
    "speckle_noise": speckle_noise, "pessimal_noise": pessimal_noise,
    "gaussian_blur": gaussian_blur, "glass_blur": glass_blur,
    "defocus_blur": defocus_blur, "motion_blur": motion_blur,
    "zoom_blur": zoom_blur, "fog": fog, "frost": frost, "snow": snow,
    "spatter": spatter, "contrast": contrast, "brightness": brightness,
    "saturate": saturate, "jpeg_compression": jpeg_compression,
    "pixelate": pixelate, "elastic_transform": elastic_transform,
    "quantize": quantize, "shear": shear, "rotate": rotate, "scale": scale,
    "translate": translate, "line": line, "dotted_line": dotted_line,
    "zigzag": zigzag, "inverse": inverse, "stripe": stripe,
    "canny_edges": canny_edges,
}

# The 6 styles used by the Styled-MNIST experiments
# (reference run_styledmnist_downstream_expr.py:22-29)
EXPERIMENT_STYLES = (
    ("identity", None),
    ("stripe", None),
    ("zigzag", None),
    ("canny_edges", None),
    ("scale", 5),
    ("brightness", None),
)


def make_style_fn(styles=EXPERIMENT_STYLES):
    """Build ``styled = f(x, style_idx, key)`` dispatching per-sample via
    lax.switch; vmap it over the batch for the on-device styling pipeline."""
    branches = []
    for name, severity in styles:
        fn = CORRUPTION_FNS[name]
        if severity is None:
            branches.append(lambda x, k, fn=fn: fn(x, k))
        else:
            branches.append(lambda x, k, fn=fn, s=severity: fn(x, k, s))

    def styled(x, style_idx, key):
        return jax.lax.switch(style_idx, branches, x, key)

    return styled


def batched_style(x_batch: Array, style_idx: Array, key: Array,
                  styles=EXPERIMENT_STYLES) -> Array:
    """Apply per-sample styles to a [B, H, W] batch on device."""
    fn = make_style_fn(styles)
    keys = jax.random.split(key, x_batch.shape[0])
    return jax.vmap(fn)(x_batch, style_idx, keys)
