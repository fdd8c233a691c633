"""Native C++ host library: compiles, and matches the Python/JAX references."""

import numpy as np
import pytest

from clearvae_tpu.native import bindings as NB

pytestmark = pytest.mark.skipif(not NB.available(),
                                reason="no C++ toolchain available")


def test_native_mi_matches_sklearn():
    from sklearn.feature_selection import mutual_info_classif

    rs = np.random.RandomState(0)
    n, f, c = 400, 4, 4
    y = rs.randint(0, c, n)
    x = rs.randn(n, f) + 0.8 * y[:, None] * (np.arange(f) % 2)
    ours = NB.mutual_info_classif_native(x, y)
    theirs = mutual_info_classif(x, y, discrete_features=False, random_state=0)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_native_mi_singleton_classes():
    rs = np.random.RandomState(1)
    y = np.r_[np.zeros(50, int), np.ones(50, int), [2]]  # class 2 singleton
    x = rs.randn(101, 2) + y[:, None]
    out = NB.mutual_info_classif_native(x, y)
    assert np.isfinite(out).all() and (out >= 0).all()


def test_native_corruptions_match_jax():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from clearvae_tpu.ops import corruptions as C

    rs = np.random.RandomState(2)
    imgs = (rs.rand(6, 28, 28) * 255).astype(np.float32)
    names = ["identity", "stripe", "brightness", "inverse", "quantize",
             "contrast"]
    idx = np.arange(6).astype(np.int32)
    out = NB.corrupt_batch_native(imgs, names, idx, severity=5)
    for i, name in enumerate(names):
        fn = C.CORRUPTION_FNS[name]
        expected = np.asarray(fn(imgs[i], severity=5) if name in
                              ("brightness", "quantize", "contrast")
                              else fn(imgs[i]))
        np.testing.assert_allclose(out[i], expected, atol=0.01, err_msg=name)


def test_native_scale_matches_jax():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from clearvae_tpu.ops import corruptions as C

    rs = np.random.RandomState(3)
    imgs = (rs.rand(2, 28, 28) * 255).astype(np.float32)
    out = NB.corrupt_batch_native(imgs, ["scale"], np.zeros(2, np.int32),
                                  severity=5)
    for i in range(2):
        expected = np.asarray(C.scale(imgs[i], severity=5))
        np.testing.assert_allclose(out[i], expected, atol=0.05)


def test_native_unknown_style_rejected():
    imgs = np.zeros((1, 28, 28), np.float32)
    with pytest.raises(KeyError):
        NB.corrupt_batch_native(imgs, ["bogus"], np.zeros(1, np.int32))
