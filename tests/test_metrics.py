"""Metric parity vs sklearn (installed in the test environment).

MIG's kNN MI estimator is the top metric-parity risk (SURVEY §7 hard part 1):
the numpy path must match sklearn's mutual_info_classif tightly; the jnp
(TPU) path within a loose tolerance (f32 boundary effects)."""

import numpy as np
import pytest

from clearvae_tpu.ops import metrics as MT

sklearn = pytest.importorskip("sklearn")
from sklearn.feature_selection import mutual_info_classif  # noqa: E402
from sklearn.metrics import average_precision_score, roc_auc_score  # noqa: E402


def _data(n=400, f=4, c=4, seed=0):
    rs = np.random.RandomState(seed)
    y = rs.randint(0, c, size=n)
    x = rs.randn(n, f) + 0.8 * y[:, None] * (np.arange(f) % 2)
    return x, y


def test_mi_numpy_matches_sklearn():
    x, y = _data()
    ours = MT.mutual_info_classif_np(x, y)
    theirs = mutual_info_classif(x, y, discrete_features=False, random_state=0)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_mi_jnp_close_to_numpy():
    x, y = _data(n=300)
    ours_np = MT.mutual_info_classif_np(x, y)
    ours_jnp = np.asarray(MT.mutual_info_classif_jnp(x, y, n_classes=4))
    np.testing.assert_allclose(ours_jnp, ours_np, rtol=0.05, atol=0.02)


def test_mutual_info_gap_sign():
    """z_c informative about label, z_s pure noise → MIG > 0; swapped → < 0."""
    rs = np.random.RandomState(1)
    n = 500
    y = rs.randint(0, 4, size=n)
    zc = y[:, None] + 0.3 * rs.randn(n, 3)
    zs = rs.randn(n, 3)
    assert MT.mutual_info_gap(y, zc, zs) > 0.3
    assert MT.mutual_info_gap(y, zs, zc) < -0.3


def test_auc_matches_sklearn():
    rs = np.random.RandomState(2)
    n, c = 300, 4
    y = rs.randint(0, c, size=n)
    logits = rs.randn(n, c) + 1.5 * np.eye(c)[y]
    aupr, auroc = MT.auc(logits, y)
    z = logits - logits.max(axis=1, keepdims=True)
    ph = np.exp(z) / np.exp(z).sum(axis=1, keepdims=True)
    for i in range(c):
        yt = (y == i).astype(int)
        assert aupr[i] == round(float(average_precision_score(yt, ph[:, i])), 3)
        assert auroc[i] == round(float(roc_auc_score(yt, ph[:, i])), 3)


def test_accuracy():
    logits = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
    assert MT.accuracy(logits, np.array([0, 1, 1])) == pytest.approx(2 / 3)
