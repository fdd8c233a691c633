"""Corruption kernel tests.

Deterministic corruptions are checked exactly against closed forms /
independent numpy implementations; stochastic ones statistically
(SURVEY §7 hard part 2: the reference's skimage/wand stack cannot run in this
environment, so parity oracles are derived from the reference formulas)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clearvae_tpu.ops import corruptions as C
from clearvae_tpu.ops.image import line_from_points

KEY = jax.random.key(7)
rs = np.random.RandomState(3)
IMG = (rs.rand(28, 28) * 255).astype(np.float32)


def _digit():
    """Synthetic digit-like image: bright ring on black."""
    r = np.hypot(*np.meshgrid(np.arange(28) - 13.5, np.arange(28) - 13.5))
    return (255.0 * ((r > 6) & (r < 10))).astype(np.float32)


def test_registry_complete():
    assert C.ALL_CORRUPTIONS == [
        "identity", "gaussian_noise", "shot_noise", "impulse_noise",
        "speckle_noise", "pessimal_noise", "gaussian_blur", "glass_blur",
        "defocus_blur", "motion_blur", "zoom_blur", "fog", "frost", "snow",
        "spatter", "contrast", "brightness", "saturate", "jpeg_compression",
        "pixelate", "elastic_transform", "quantize", "shear", "rotate",
        "scale", "translate", "line", "dotted_line", "zigzag", "inverse",
        "stripe", "canny_edges"]
    for n in C.ALL_CORRUPTIONS:
        assert n in C.CORRUPTION_FNS


@pytest.mark.parametrize("name", C.ALL_CORRUPTIONS)
def test_all_corruptions_jit_finite(name):
    fn = C.CORRUPTION_FNS[name]
    out = np.asarray(jax.jit(lambda a, k: fn(a, k))(jnp.asarray(IMG), KEY))
    assert out.shape == (28, 28)
    assert np.isfinite(out).all()
    assert out.min() >= -1e-3 and out.max() <= 255.001


def test_identity_exact():
    np.testing.assert_array_equal(np.asarray(C.identity(IMG)), IMG)


def test_stripe_exact():
    out = np.asarray(C.stripe(IMG))
    exp = IMG.copy()
    exp[:, :7] = 255.0 - exp[:, :7]
    exp[:, 21:] = 255.0 - exp[:, 21:]
    np.testing.assert_allclose(out, exp, atol=1e-4)


def test_inverse_exact():
    np.testing.assert_allclose(np.asarray(C.inverse(IMG)), 255.0 - IMG)


def test_quantize_exact():
    for sev in range(1, 6):
        bits = [5, 4, 3, 2, 1][sev - 1]
        exp = np.round(IMG * ((2**bits - 1) / 255.0)) * (255.0 / (2**bits - 1))
        np.testing.assert_allclose(np.asarray(C.quantize(IMG, severity=sev)),
                                   exp, atol=1e-3)


def test_brightness_exact():
    # grayscale HSV round-trip reduces to clip(x/255 + c) * 255
    for sev in range(1, 6):
        c = [0.1, 0.2, 0.3, 0.4, 0.5][sev - 1]
        exp = np.clip(IMG / 255.0 + c, 0, 1) * 255.0
        np.testing.assert_allclose(np.asarray(C.brightness(IMG, severity=sev)),
                                   exp, atol=1e-3)


def test_contrast_exact():
    c = 0.1  # severity 4
    m = (IMG / 255.0).mean()
    exp = np.clip((IMG / 255.0 - m) * c + m, 0, 1) * 255.0
    np.testing.assert_allclose(np.asarray(C.contrast(IMG, severity=4)), exp,
                               atol=1e-3)


def _np_bilinear_constant(img, rr, cc):
    h, w = img.shape
    out = np.zeros_like(rr, dtype=np.float64)
    r0, c0 = np.floor(rr), np.floor(cc)
    for ri, ci, wgt in [(r0, c0, (1 + r0 - rr) * (1 + c0 - cc)),
                        (r0, c0 + 1, (1 + r0 - rr) * (cc - c0)),
                        (r0 + 1, c0, (rr - r0) * (1 + c0 - cc)),
                        (r0 + 1, c0 + 1, (rr - r0) * (cc - c0))]:
        inb = (ri >= 0) & (ri <= h - 1) & (ci >= 0) & (ci <= w - 1)
        vals = np.where(inb, img[np.clip(ri, 0, h - 1).astype(int),
                                 np.clip(ci, 0, w - 1).astype(int)], 0.0)
        out += wgt * vals
    return out


def test_scale_matches_independent_affine():
    """scale severity 5 = zoom-out ×2 around center (13.5, 13.5), bilinear,
    constant cval=0 — the exact skimage warp semantics (corruptions.py:602-622)."""
    img = _digit() / 255.0
    rows, cols = np.meshgrid(np.arange(28.0), np.arange(28.0), indexing="ij")
    src_c = 2.0 * cols + 13.5 * (1 - 2.0)
    src_r = 2.0 * rows + 13.5 * (1 - 2.0)
    exp = np.clip(_np_bilinear_constant(img, src_r, src_c), 0, 1) * 255
    out = np.asarray(C.scale(_digit(), severity=5))
    np.testing.assert_allclose(out, exp, atol=0.5)


def test_translate_shifts_center_of_mass():
    img = _digit()
    out = np.asarray(C.translate(img, jax.random.key(0), severity=5))
    # translation by ±5 px: center of mass moves by about 5 in each axis
    def com(a):
        tot = a.sum()
        return (np.arange(28) @ a.sum(1) / tot, np.arange(28) @ a.sum(0) / tot)
    c_in, c_out = com(img), com(out)
    assert 3.0 < abs(c_in[0] - c_out[0]) < 7.0
    assert 3.0 < abs(c_in[1] - c_out[1]) < 7.0


def test_line_from_points_matches_numpy_formula():
    c0, r0, c1, r1 = 3.0, 5.0, 24.0, 20.0
    cc, rr = np.meshgrid(np.linspace(0, 27, 28), np.linspace(0, 27, 28),
                         sparse=True)
    m = (r1 - r0) / (c1 - c0)
    dist = np.clip(np.abs(rr - (m * (cc - c0) + r0)), 0, 2.3 - 1e-10)
    exp = np.clip(np.log(1 - dist / 2.3) + 1, 0, 1)
    exp[:, :int(np.floor(c0))] = 0
    exp[:, int(np.ceil(c1)):] = 0
    out = np.asarray(line_from_points(c0, r0, c1, r1))
    np.testing.assert_allclose(out, np.clip(exp, 0, 1), atol=1e-5)


def test_line_from_points_degenerate():
    assert float(jnp.sum(line_from_points(5.0, 1.0, 5.0, 20.0))) == 0.0


def test_dotted_line_band_structure():
    out = np.asarray(C.dotted_line(np.zeros((28, 28), np.float32),
                                   jax.random.key(1)))
    # zeroed bands: columns where (col//2) % 2 == 0
    cols_off = [c for c in range(28) if (c // 2) % 2 == 0]
    assert out[:, cols_off].sum() == 0.0
    assert out.sum() > 0.0


def test_zigzag_adds_ink_only():
    img = _digit()
    out = np.asarray(C.zigzag(img, jax.random.key(2)))
    assert (out >= img - 1e-3).all()
    assert out.sum() > img.sum()


def test_canny_binary_and_sane():
    out = np.asarray(C.canny_edges(_digit()))
    assert set(np.unique(out)).issubset({0.0, 255.0})
    assert out.sum() > 0  # the ring has edges
    # edges only near the ring boundary (radius 4.5..11.5)
    r = np.hypot(*np.meshgrid(np.arange(28) - 13.5, np.arange(28) - 13.5))
    assert out[(r < 4.0) | (r > 12.5)].sum() == 0.0
    # blank image: no edges
    assert np.asarray(C.canny_edges(np.zeros((28, 28), np.float32))).sum() == 0


def test_gaussian_noise_statistics():
    keys = jax.random.split(jax.random.key(3), 32)
    flat = jnp.full((28, 28), 128.0)
    outs = jax.vmap(lambda k: C.gaussian_noise(flat, k, 3))(keys)
    resid = (np.asarray(outs) - 128.0) / 255.0
    assert abs(resid.std() - 0.18) < 0.01


def test_impulse_noise_fraction():
    keys = jax.random.split(jax.random.key(4), 32)
    flat = jnp.full((28, 28), 128.0)
    outs = np.asarray(jax.vmap(lambda k: C.impulse_noise(flat, k, 4))(keys))
    frac = ((outs == 0.0) | (outs == 255.0)).mean()
    assert abs(frac - 0.17) < 0.02


def test_pixelate_constant_invariant():
    flat = np.full((28, 28), 77.0, np.float32)
    np.testing.assert_allclose(np.asarray(C.pixelate(flat)), flat, atol=1e-3)


def test_jpeg_correlated():
    img = np.asarray(C.gaussian_blur(_digit(), severity=2))
    out = np.asarray(C.jpeg_compression(img, severity=1))
    corr = np.corrcoef(img.ravel(), out.ravel())[0, 1]
    assert corr > 0.9


def test_rgb_change():
    out = np.asarray(C.rgb_change(IMG, "magenta"))
    assert out.shape == (28, 28, 3)
    np.testing.assert_allclose(out[:, :, 0], IMG, atol=1e-3)
    assert out[:, :, 1].sum() == 0.0
    np.testing.assert_allclose(out[:, :, 2], IMG, atol=1e-3)


def test_batched_style_dispatch():
    xb = jnp.asarray(rs.rand(12, 28, 28) * 255, jnp.float32)
    idx = jnp.asarray([0, 1, 2, 3, 4, 5] * 2)
    out = jax.jit(C.batched_style)(xb, idx, jax.random.key(5))
    assert out.shape == (12, 28, 28)
    assert bool(jnp.isfinite(out).all())
    # style 0 is identity
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(xb[0]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out[6]), np.asarray(xb[6]), atol=1e-3)
    # style 1 (stripe) actually applied per-sample
    exp = np.asarray(xb[1]).copy()
    exp[:, :7] = 255 - exp[:, :7]
    exp[:, 21:] = 255 - exp[:, 21:]
    np.testing.assert_allclose(np.asarray(out[1]), exp, atol=1e-3)


def test_style_keyed_reproducibility():
    xb = jnp.asarray(rs.rand(4, 28, 28) * 255, jnp.float32)
    idx = jnp.asarray([2, 2, 4, 5])
    a = C.batched_style(xb, idx, jax.random.key(9))
    b = C.batched_style(xb, idx, jax.random.key(9))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Real-library oracles (VERDICT r4 item 2): cv2, PIL and scipy ARE installed
# in this container, so the kernels the reference built on them are tested
# against the actual libraries, not just formula re-derivations. Only
# wand/ImageMagick (motion_blur, snow) and skimage itself are unavailable.
# ---------------------------------------------------------------------------


def _oracle_img():
    from clearvae_tpu.data.mnist import synthetic_mnist

    imgs, _ = synthetic_mnist(2, seed=0)
    return np.asarray(imgs[0], np.float32)  # [28, 28] in 0..255


def test_defocus_blur_vs_cv2_oracle():
    """defocus_blur == the reference's cv2 composition exactly: identical
    disk kernel (built via cv2.GaussianBlur, corruptions.py:100-112) and
    cv2.filter2D's default BORDER_REFLECT_101 (corruptions.py:304-312)."""
    import cv2

    x255 = _oracle_img()
    for sev in range(1, 6):
        radius, alias = [(3, 0.1), (4, 0.5), (6, 0.5), (8, 0.5),
                         (10, 0.5)][sev - 1]
        L = np.arange(-8, 9) if radius <= 8 else np.arange(-radius, radius + 1)
        ksize = (3, 3) if radius <= 8 else (5, 5)
        X, Y = np.meshgrid(L, L)
        disk = ((X ** 2 + Y ** 2) <= radius ** 2).astype(np.float32)
        disk /= disk.sum()
        kern = cv2.GaussianBlur(disk, ksize=ksize, sigmaX=alias)
        ref = np.clip(cv2.filter2D(x255 / 255.0, -1, kern), 0, 1) * 255
        ours = np.asarray(C.defocus_blur(x255, severity=sev))
        np.testing.assert_allclose(ours, ref, atol=1e-3,
                                   err_msg=f"severity {sev}")


def test_gaussian_blur_vs_scipy_oracle():
    """gaussian_blur == scipy.ndimage.gaussian_filter with skimage's
    defaults (mode='nearest', truncate=4.0 — skimage.filters.gaussian is a
    thin wrapper over this exact scipy call; reference corruptions.py:300)."""
    from scipy.ndimage import gaussian_filter as sgf

    x255 = _oracle_img()
    for sev in range(1, 6):
        c = [1, 2, 3, 4, 6][sev - 1]
        ref = np.clip(sgf(x255 / 255.0, sigma=c, mode="nearest",
                          truncate=4.0), 0, 1) * 255
        ours = np.asarray(C.gaussian_blur(x255, severity=sev))
        np.testing.assert_allclose(ours, ref, atol=1e-3,
                                   err_msg=f"severity {sev}")


def test_zoom_blur_vs_scipy_oracle():
    """zoom_blur == the reference composition over scipy.ndimage.zoom
    (order=1, align-corners convention — corruptions.py:187-199,519-530)."""
    from scipy.ndimage import zoom as scizoom

    def ref_clipped_zoom(img, zf):
        h = img.shape[0]
        ch = int(np.ceil(h / float(zf)))
        top = (h - ch) // 2
        img = scizoom(img[top:top + ch, top:top + ch], (zf, zf), order=1)
        trim = (img.shape[0] - h) // 2
        return img[trim:trim + h, trim:trim + h]

    x255 = _oracle_img()
    x01 = x255 / 255.0
    for sev in (1, 3, 5):
        cs = [np.arange(1, 1.11, 0.01), None, np.arange(1, 1.21, 0.02),
              None, np.arange(1, 1.31, 0.03)][sev - 1]
        acc = np.zeros_like(x01)
        for z in cs:
            acc += ref_clipped_zoom(x01, float(z))
        ref = np.clip((x01 + acc) / (len(cs) + 1), 0, 1) * 255
        ours = np.asarray(C.zoom_blur(x255, severity=sev))
        np.testing.assert_allclose(ours, ref, atol=1e-3,
                                   err_msg=f"severity {sev}")


def test_jpeg_vs_real_pil_codec():
    """jpeg_compression vs PIL's REAL JPEG encoder (the reference is a
    plain save-to-JPEG round-trip, corruptions.py:483-491). Our kernel is a
    single-pass 8×8 DCT quantization with the libjpeg quality→table scaling
    — not a bit-exact codec — so the oracle pins the measured gap: RMSE < 5
    (0..255 scale) and PSNR > 35 dB at every severity."""
    from io import BytesIO

    from PIL import Image

    x255 = _oracle_img()
    for sev, q in zip(range(1, 6), [25, 18, 15, 10, 7]):
        buf = BytesIO()
        Image.fromarray(x255.astype(np.uint8)).save(buf, "JPEG", quality=q)
        ref = np.asarray(Image.open(buf), np.float32)
        ours = np.asarray(C.jpeg_compression(x255, severity=sev))
        rmse = float(np.sqrt(np.mean((ours - ref) ** 2)))
        psnr = 10 * np.log10(255.0 ** 2 / max(np.mean((ours - ref) ** 2),
                                              1e-12))
        assert rmse < 5.0 and psnr > 35.0, (sev, q, rmse, psnr)


def test_elastic_components_vs_scipy_oracle():
    """elastic_transform's two numeric engines vs scipy on identical inputs:
    bilinear_sample == ndimage.map_coordinates(order=1, mode='constant')
    and the displacement smoothing == ndimage.gaussian_filter(mode='reflect',
    truncate=3) (reference corruptions.py:531-547; the random field itself
    is keyed jax.random and is covered statistically elsewhere)."""
    from scipy.ndimage import gaussian_filter as sgf
    from scipy.ndimage import map_coordinates

    from clearvae_tpu.ops.image import bilinear_sample, gaussian_filter

    x01 = _oracle_img() / 255.0
    rs_ = np.random.RandomState(0)
    field = rs_.uniform(-1, 1, (28, 28)).astype(np.float32)
    for sigma in (28 * 0.7, 28 * 0.08, 28 * 0.01):
        ref = sgf(field, sigma, mode="reflect", truncate=3.0)
        ours = np.asarray(gaussian_filter(jnp.asarray(field), float(sigma),
                                          mode="reflect", truncate=3.0))
        np.testing.assert_allclose(ours, ref, atol=1e-5, err_msg=str(sigma))

    dx = sgf(rs_.uniform(-1, 1, (28, 28)), 2.8, mode="reflect",
             truncate=3.0) * 5
    dy = sgf(rs_.uniform(-1, 1, (28, 28)), 2.8, mode="reflect",
             truncate=3.0) * 5
    yy, xx = np.meshgrid(np.arange(28), np.arange(28), indexing="ij")
    ref = map_coordinates(x01, (np.reshape(yy + dy, (-1, 1)),
                                np.reshape(xx + dx, (-1, 1))),
                          order=1, mode="constant").reshape(28, 28)
    ours = np.asarray(bilinear_sample(jnp.asarray(x01),
                                      jnp.asarray(yy + dy, jnp.float32),
                                      jnp.asarray(xx + dx, jnp.float32),
                                      cval=0.0, mode="constant"))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
