"""Real-data loader paths exercised with fabricated on-disk datasets
(CelebA attr file + JPEGs, CheXpert DataFrame + X-rays, Camelyon17 WILDS
layout, PACS HF save_to_disk)."""

import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image


def _img(path, size=(32, 40), mode="RGB"):
    rs = np.random.RandomState(hash(path) % 2**31)
    arr = (rs.rand(size[1], size[0], 3) * 255).astype(np.uint8)
    im = Image.fromarray(arr).convert(mode)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    im.save(path)


def test_load_celeba(tmp_path):
    from clearvae_tpu.data.celeba import load_celeba

    root = tmp_path / "celeba"
    names = [f"{i:06d}.jpg" for i in range(1, 5)]
    attrs = []
    for i, name in enumerate(names):
        _img(str(root / "img_align_celeba" / name))
        a = ["-1"] * 40
        a[20], a[31] = "1", "1"      # male, smiling
        a[9] = "1"                   # blond
        if i == 2:
            a[10] = "1"              # blurry → filtered out
        if i == 3:
            a[8] = a[9] = "-1"       # no hair color → filtered out
        attrs.append(name + " " + " ".join(a))
    (root / "list_attr_celeba.txt").write_text(
        f"{len(names)}\nheader\n" + "\n".join(attrs) + "\n")

    ds = load_celeba(str(root))
    assert len(ds) == 2  # two filtered away
    assert ds.images.shape == (2, 64, 64, 3)
    assert (ds.labels == 0).all() and (ds.style_idx == 1).all()


def test_load_chexpert(tmp_path):
    from clearvae_tpu.data.chexpert import load_chexpert

    root = str(tmp_path) + "/"
    rows = []
    for i in range(3):
        rel = f"CheXpert-v1.0/train/p{i}/study/img.jpg"
        _img(root + rel.split("/", 1)[1], size=(30, 50), mode="L")
        rows.append({"Path": rel, "Sex": i % 2, "Age": i % 3,
                     "Pneumonia": i % 4})
    df = pd.DataFrame(rows)
    ds = load_chexpert(root, df, "Pneumonia")
    assert ds.images.shape == (3, 64, 64, 1)
    assert list(ds.labels) == [0, 1, 2]
    assert list(ds.style_idx) == [0, 4, 2]


def test_load_camelyon17(tmp_path):
    from clearvae_tpu.data.camelyon17 import load_camelyon17

    base = tmp_path / "camelyon17_v1.0"
    rows = []
    for i in range(3):
        rows.append({"patient": f"{i:03d}", "node": 0, "x_coord": 10 * i,
                     "y_coord": 20 * i, "tumor": i % 2, "center": i % 5,
                     "slide": 0, "split": 0})
        _img(str(base / "patches" / f"patient_{i:03d}_node_0" /
                 f"patch_patient_{i:03d}_node_0_x_{10*i}_y_{20*i}.png"),
             size=(96, 96))
    pd.DataFrame(rows).to_csv(base / "metadata.csv")
    ds = load_camelyon17(str(tmp_path))
    assert ds.images.shape == (3, 64, 64, 3)
    assert list(ds.labels) == [0, 1, 0]
    assert list(ds.style_idx) == [0, 1, 2]


def test_load_pacs(tmp_path):
    datasets = pytest.importorskip("datasets")
    from clearvae_tpu.data.pacs import load_pacs

    imgs = [Image.fromarray((np.random.RandomState(i).rand(70, 70, 3) * 255)
                            .astype(np.uint8)) for i in range(4)]
    dd = datasets.Dataset.from_dict({
        "image": imgs, "label": [0, 1, 2, 3],
        "domain": ["art_painting", "cartoon", "photo", "sketch"],
    })
    dd.save_to_disk(str(tmp_path / "pacs"))
    ds = load_pacs(str(tmp_path / "pacs"))
    assert ds.images.shape == (4, 64, 64, 3)
    assert list(ds.style_idx) == [0, 1, 2, 3]


def test_load_mnist_idx(tmp_path):
    import gzip
    import struct

    from clearvae_tpu.data.mnist import load_mnist

    rs = np.random.RandomState(0)
    imgs = (rs.rand(5, 28, 28) * 255).astype(np.uint8)
    labels = np.arange(5, dtype=np.uint8)
    with gzip.open(tmp_path / "train-images-idx3-ubyte.gz", "wb") as f:
        f.write(struct.pack(">IIII", 2051, 5, 28, 28) + imgs.tobytes())
    with gzip.open(tmp_path / "train-labels-idx1-ubyte.gz", "wb") as f:
        f.write(struct.pack(">II", 2049, 5) + labels.tobytes())
    x, y = load_mnist(str(tmp_path), "train")
    np.testing.assert_array_equal(x, imgs)
    np.testing.assert_array_equal(y, labels)
