"""Torch-CPU proxy calibration for the round-5 CheXpert stand-in generator
(`synth64.synthetic_chexpert64`), applying the round-3 method (BASELINE.md
"64×64 protocol redesign"): before committing a multi-seed campaign, verify
with a small independent CNN that

1. the 4 outcome classes are learnable in-distribution (target >= ~0.75 —
   content cues are real, not noise);
2. held-one-style-out transfer is middling (0.3-0.7 — styles are drastic
   enough that a style-entangled representation degrades OOD, but polarity
   -consistent enough that transfer is possible);
3. the 6 (sex, age) styles are recognizable (style supervision / MIG have
   signal).

Pure torch-CPU; run on an idle host (does not touch the TPU).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import torch
import torch.nn as nn

# python scripts/foo.py puts scripts/ (not the repo root) on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_cnn(n_out: int) -> nn.Module:
    return nn.Sequential(
        nn.Conv2d(1, 16, 3, 2, 1), nn.BatchNorm2d(16), nn.ReLU(),
        nn.Conv2d(16, 32, 3, 2, 1), nn.BatchNorm2d(32), nn.ReLU(),
        nn.Conv2d(32, 64, 3, 2, 1), nn.BatchNorm2d(64), nn.ReLU(),
        nn.Conv2d(64, 64, 3, 2, 1), nn.BatchNorm2d(64), nn.ReLU(),
        nn.Flatten(), nn.Linear(64 * 16, 128), nn.ReLU(),
        nn.Linear(128, n_out))


def train_eval(xtr, ytr, xte, yte, n_out, epochs=6, seed=0):
    torch.manual_seed(seed)
    net = make_cnn(n_out)
    opt = torch.optim.Adam(net.parameters(), 1e-3)
    xtr_t = torch.from_numpy(xtr.transpose(0, 3, 1, 2))
    ytr_t = torch.from_numpy(ytr)
    for _ in range(epochs):
        perm = torch.randperm(len(xtr_t))
        for i in range(0, len(xtr_t), 128):
            idx = perm[i:i + 128]
            opt.zero_grad()
            loss = nn.functional.cross_entropy(net(xtr_t[idx]), ytr_t[idx])
            loss.backward()
            opt.step()
    net.eval()
    with torch.no_grad():
        preds = []
        xte_t = torch.from_numpy(xte.transpose(0, 3, 1, 2))
        for i in range(0, len(xte_t), 256):
            preds.append(net(xte_t[i:i + 256]).argmax(1))
        pred = torch.cat(preds).numpy()
    return float((pred == yte).mean())


def main():
    from clearvae_tpu.data.synth64 import synthetic_chexpert64

    imgs, labels, styles = synthetic_chexpert64(6144, seed=123)
    ntr = 4096
    xtr, xte = imgs[:ntr], imgs[ntr:]
    ytr, yte = labels[:ntr], labels[ntr:]
    str_, ste = styles[:ntr], styles[ntr:]

    acc = train_eval(xtr, ytr, xte, yte, 4)
    print(f"in-distribution 4-class content acc: {acc:.3f}")

    sacc = train_eval(xtr, str_, xte, ste, 6, epochs=4)
    print(f"in-distribution 6-class style acc:   {sacc:.3f}")

    # per-class-pair confusion probe: which content pairs are hard
    for a, b in [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]:
        m_tr = np.isin(ytr, [a, b])
        m_te = np.isin(yte, [a, b])
        pacc = train_eval(xtr[m_tr], (ytr[m_tr] == b).astype(np.int64),
                          xte[m_te], (yte[m_te] == b).astype(np.int64),
                          2, epochs=4)
        print(f"  pair {a}v{b} acc: {pacc:.3f}")

    # held-one-style-out transfer (the OOD axis)
    for held in range(6):
        tr = styles != held
        te = styles == held
        tacc = train_eval(imgs[tr], labels[tr], imgs[te], labels[te], 4,
                          epochs=5)
        print(f"held-out style {held}: transfer acc {tacc:.3f}")


if __name__ == "__main__":
    main()
