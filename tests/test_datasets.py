"""Dataset adapter tests: label protocols, k-style splits, runners on
synthetic 64×64 data, Colored-MNIST, CheXpert maps, MI simulation."""

import json
import os

import numpy as np
import pytest

from clearvae_tpu.data.camelyon17 import synthetic_camelyon17
from clearvae_tpu.data.celeba import (
    generate_celeba_labels,
    kceleba_train_test_split,
    synthetic_celeba,
)
from clearvae_tpu.data.chexpert import (
    CHEXPERT_ATTR2STYLES,
    generate_chexpert_labels,
    synthetic_chexpert,
)
from clearvae_tpu.data.colored_mnist import COLOR_NAMES, make_colored_mnist
from clearvae_tpu.data.common import ArrayDataset, kstyle_train_test_split
from clearvae_tpu.data.pacs import synthetic_pacs


def test_celeba_label_protocol():
    """(male, smiling) → 4 classes; hair = argmax of 4 hair columns
    (reference data_utils.py:95-117)."""
    attr = np.zeros(40, np.int64)
    attr[20] = 1  # male
    attr[31] = 1  # smiling
    attr[9] = 1   # blond
    gs, hair = generate_celeba_labels(attr)
    assert gs == 0 and hair == 1
    attr[20] = 0
    gs, hair = generate_celeba_labels(attr)
    assert gs == 2
    # tie broken in favor of the first hair column
    attr[8] = 1
    assert generate_celeba_labels(attr)[1] == 0


def test_kstyle_split_disjoint():
    ds = synthetic_celeba(400, seed=0)
    train, test, sd = kceleba_train_test_split(ds, k=2, seed=1)
    assert len(train) + len(test) == len(ds)
    for c in range(4):
        tr_styles = set(train.style_idx[train.labels == c].tolist())
        te_styles = set(test.style_idx[test.labels == c].tolist())
        assert not (tr_styles & te_styles)
        assert tr_styles <= set(int(s) for s in sd[c]["train"])


def test_synthetic_datasets_shapes():
    for ds, nc, ns, ch in [(synthetic_celeba(32), 4, 4, 3),
                           (synthetic_pacs(32), 7, 4, 3),
                           (synthetic_camelyon17(32), 2, 5, 3),
                           (synthetic_chexpert(32), 4, 6, 1)]:
        assert ds.images.shape == (32, 64, 64, ch)
        assert ds.images.min() >= 0 and ds.images.max() <= 1
        assert ds.labels.max() < nc and ds.style_idx.max() < ns
        batch = next(ds.batches(8, shuffle=True, seed=0))
        assert batch[0].shape[0] == 8 and len(batch) == 3


def test_chexpert_label_maps():
    assert CHEXPERT_ATTR2STYLES[(1, 2)] == 5
    row = {"Sex": 0, "Age": 1, "Pneumonia": 2}
    outcome, style = generate_chexpert_labels(row, "Pneumonia")
    assert outcome == 2 and style == 1


def test_colored_mnist():
    from clearvae_tpu.data.mnist import synthetic_mnist

    imgs, labels = synthetic_mnist(40, seed=0)
    ds = make_colored_mnist(imgs, labels, seed=0)
    assert ds.images.shape == (40, 28, 28, 3)
    assert len(COLOR_NAMES) == 7
    # a 'red' styled image must have zero green/blue channels
    red_idx = COLOR_NAMES.index("red")
    sel = np.where(ds.style_idx == red_idx)[0]
    if len(sel):
        assert ds.images[sel][..., 1].sum() == 0
        assert ds.images[sel][..., 2].sum() == 0


def test_mi_simulation_tracks_knn():
    """SNN/PS-SNN values must move with the kNN MI as cluster std grows
    (the reference's simulation-study oracle, mi_experiment.ipynb)."""
    from clearvae_tpu.experiments.mi_simulation import run

    traces = run(stds=[1.0, 4.0], n_samples=300, reps=3, seed=0, ps=True)
    knn = np.asarray(traces["knn_mi"]).reshape(2, 3).mean(1)
    ps = np.asarray(traces["tau_0.3"]).reshape(2, 3).mean(1)
    # both decrease as std grows (less separable → lower MI, lower PS-SNN)
    assert knn[0] > knn[1]
    assert ps[0] > ps[1]


def test_analyze_aggregation(tmp_path):
    from clearvae_tpu.experiments.analyze import (
        load_results, relative_to_baseline, boxplots)

    for k in (1, 2):
        for seed in (7, 8):
            res = {"baseline": {"acc": 0.5, "pr": {"overall": 0.5,
                                                   "stratified": {}},
                                "roc": {"overall": 0.5, "stratified": {}}},
                   "clear": {"acc": 0.6 + 0.1 * k,
                             "pr": {"overall": 0.6, "stratified": {}},
                             "roc": {"overall": 0.7, "stratified": {}}}}
            (tmp_path / f"styledmnist-k{k}-{seed}.json").write_text(
                json.dumps(res))
    df = load_results(str(tmp_path), "styledmnist")
    assert len(df) == 8
    rel = relative_to_baseline(df)
    clear_k1 = rel[(rel.model == "clear") & (rel.k == 1)].rel_acc.iloc[0]
    assert clear_k1 == pytest.approx(0.7 / 0.5)
    boxplots(rel, "rel_acc", str(tmp_path / "box.png"))
    assert (tmp_path / "box.png").exists()

    from clearvae_tpu.experiments.analyze import paired_deltas, paired_markdown
    d = paired_deltas(df)
    r = d[(d.model == "clear") & (d.k == 1)].iloc[0]
    assert r["mean"] == pytest.approx(0.2)   # 0.7 - 0.5, both seeds
    assert r["std"] == pytest.approx(0.0)
    assert int(r["wins"]) == 2 and int(r["n"]) == 2
    md = paired_markdown(df)
    assert "+0.200" in md and "(2/2)" in md
    assert "p=" not in md  # n=2 < 5 signed pairs: Wilcoxon undefined


def test_paired_wilcoxon():
    """One-sided Wilcoxon signed-rank on the paired deltas: all-positive
    deltas at n=9 hit the exact-test floor 1/2^9; all-negative ~1; matches
    scipy called directly."""
    from scipy import stats

    from clearvae_tpu.experiments.analyze import _wilcoxon_greater

    pos = [0.05, 0.08, 0.11, 0.02, 0.07, 0.04, 0.09, 0.03, 0.06]
    assert _wilcoxon_greater(pos) == pytest.approx(1 / 512)
    assert _wilcoxon_greater([-v for v in pos]) == pytest.approx(1.0)
    mixed = [0.05, -0.02, 0.08, 0.01, -0.03, 0.06, 0.04]
    assert _wilcoxon_greater(mixed) == pytest.approx(
        stats.wilcoxon(mixed, alternative="greater").pvalue)
    assert np.isnan(_wilcoxon_greater([0.0] * 9))  # zeros drop -> undefined


def test_run_model_zoo_resume(tmp_path):
    """The results JSON doubles as a manifest: finished models are skipped."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from clearvae_tpu.data.mnist import synthetic_mnist
    from clearvae_tpu.data.styled import make_styled_mnist
    from clearvae_tpu.experiments.common import run_model_zoo
    from clearvae_tpu.train.factories import get_cnn_trainer

    imgs, labels = synthetic_mnist(80, seed=9)
    ds = make_styled_mnist(imgs, labels, seed=9)
    fpath = str(tmp_path / "r.json")
    models = {"baseline": (get_cnn_trainer, {"n_class": 10, "seed": 9})}
    r1 = run_model_zoo(models, ds, None, ds, epochs=1, batch_size=20,
                       resume_path=fpath)
    assert "baseline" in r1 and os.path.exists(fpath)
    # second call with a poisoned factory must NOT retrain
    models2 = {"baseline": (None, {})}
    r2 = run_model_zoo(models2, ds, None, ds, epochs=1, batch_size=20,
                       resume_path=fpath)
    # compare after a JSON round-trip (int keys become strings on disk)
    assert r2["baseline"] == json.loads(json.dumps(r1["baseline"]))


def test_chexpert_runner_tiny(tmp_path):
    """CheXpert downstream (new capability: the reference ships the dataset
    class but no runner) end-to-end on tiny synthetic data."""
    from clearvae_tpu.experiments import chexpert_downstream as CD

    CD.main(["--epochs", "1", "--n_synthetic", "160", "--batch_size", "32",
             "--k_max", "1", "--seed", "5", "--out", str(tmp_path)])
    res = json.load(open(tmp_path / "chexpert-k1-5.json"))
    assert set(res) == {"baseline", "gvae", "mlvae", "clear", "clear-tc",
                        "clear-mim (L1OutUB)", "clear-mim (CLUB-S)"}
    for r in res.values():
        assert 0.0 <= r["acc"] <= 1.0


def test_mig_expr_runner_tiny(tmp_path):
    """MIG/ELBO sweep end-to-end on tiny data: 8 models, CSV schema."""
    import pandas as pd

    from clearvae_tpu.experiments import mig_expr as ME

    df = ME.main(["--epochs", "1", "--n_total", "120", "--batch_size", "24",
                  "--seed", "5", "--out", str(tmp_path)])
    assert list(df.columns) == ["model", "beta", "mig", "elbo"]
    assert set(df.model) == {"clear-ps", "clear-neg", "bvae", "clear-tc",
                             "clear-mim (L1OutUB)", "clear-mim (CLUB-S)",
                             "mlvae", "gvae"}
    assert df.mig.notna().all() and df.elbo.notna().all()
    import glob
    csvs = glob.glob(str(tmp_path / "mig_elbo_s5_*.csv"))
    assert csvs

    # the CSV is the resume manifest: drop one cell, re-run, only that cell
    # is recomputed and the rest come back cached (common.run_mig_sweep)
    full = pd.read_csv(csvs[0])
    full.iloc[:-1].to_csv(csvs[0], index=False)
    df2 = ME.main(["--epochs", "1", "--n_total", "120", "--batch_size", "24",
                   "--seed", "5", "--out", str(tmp_path)])
    assert len(df2) == len(full)
    pd.testing.assert_frame_equal(
        df2.iloc[:-1].reset_index(drop=True),
        full.iloc[:-1].reset_index(drop=True), check_dtype=False)
    assert set(df2.model) == set(full.model)


def test_synth64_determinism_and_style_separation():
    """The round-3 discriminative generators: deterministic in seed, style
    drastically shifts pixel statistics (the OOD axis), and content keeps a
    consistent luminance polarity across styles (what makes cross-style
    transfer possible at all — see synth64.style_sketch docstring)."""
    from clearvae_tpu.data.synth64 import (synthetic_celeba64,
                                           synthetic_pacs64,
                                           synthetic_camelyon64)

    for fn, n_styles in [(synthetic_celeba64, 4), (synthetic_pacs64, 4),
                         (synthetic_camelyon64, 5)]:
        a = fn(64, seed=3)
        b = fn(64, seed=3)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
        imgs, labels, styles = a
        # style shifts global statistics far more than class does
        style_means = np.asarray([imgs[styles == s].mean()
                                  for s in range(n_styles)])
        class_means = np.asarray([imgs[labels == c].mean()
                                  for c in np.unique(labels)])
        assert style_means.std() > 3 * class_means.std(), (
            style_means, class_means)


def test_synth64_content_polarity_consistent():
    """In every celeba/pacs style the content region is brighter than the
    ground (no polarity flips)."""
    from clearvae_tpu.data.synth64 import (render_face, _celeba_style,
                                           render_pacs_object, _pacs_style)

    rng = np.random.RandomState(0)
    for styler, renderer, args in [
            (_celeba_style, render_face, (1, 1)),
            (_pacs_style, render_pacs_object, (5,))]:
        for idx in range(4):
            g = renderer(np.random.RandomState(1), 64, *args)
            img = styler(idx, g, rng)
            lum = img.mean(-1)
            obj = lum[g > 0.3].mean()
            ground = lum[g <= 0.01].mean()
            assert obj > ground, (renderer.__name__, idx, obj, ground)


def test_illustrate_runner_tiny(tmp_path):
    """Data-illustration runner end-to-end: three deterministic grids."""
    import matplotlib.pyplot as plt

    from clearvae_tpu.experiments import illustrate as IL

    IL.main(["--n_synthetic", "256", "--seed", "3", "--out", str(tmp_path)])
    for name in ("example-data", "illustrate_content", "illustrate_styles"):
        img = plt.imread(tmp_path / f"{name}.png")
        assert img.ndim == 3 and img.shape[0] > 50, name
        assert img.std() > 0.02, name  # non-blank

    # deterministic: a second run writes identical pixels
    IL.main(["--n_synthetic", "256", "--seed", "3", "--out",
             str(tmp_path / "b")])
    a = plt.imread(tmp_path / "example-data.png")
    b = plt.imread(tmp_path / "b" / "example-data.png")
    assert a.shape == b.shape and (a == b).all()


def test_synthetic_chexpert_deterministic_in_seed():
    """The round-5 discriminative generator is bit-reproducible in seed
    (campaign resume/regeneration depends on it) and seed-sensitive."""
    a = synthetic_chexpert(48, seed=7)
    b = synthetic_chexpert(48, seed=7)
    c = synthetic_chexpert(48, seed=8)
    import numpy as _np

    _np.testing.assert_array_equal(a.images, b.images)
    _np.testing.assert_array_equal(a.labels, b.labels)
    _np.testing.assert_array_equal(a.style_idx, b.style_idx)
    assert _np.abs(a.images - c.images).max() > 0.1
