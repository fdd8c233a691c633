"""Seed-paired Wilcoxon deltas between two models of a downstream campaign
(generalizes analyze.py's vs-baseline pairing to any reference model —
used for the round-5 CheXpert CLEAR-vs-group-evidence tables in
BASELINE.md).

Usage:
  python scripts/paired_vs.py --dir expr_output/chexpert/classification \
      --prefix chexpert --ref gvae
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re

import numpy as np
from scipy.stats import wilcoxon


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", required=True)
    p.add_argument("--prefix", required=True)
    p.add_argument("--ref", default="gvae")
    p.add_argument("--metric", default="acc")
    args = p.parse_args()

    res = {}
    pat = re.compile(rf"{args.prefix}-k(\d+)-(\d+)\.json$")
    for f in sorted(glob.glob(os.path.join(args.dir,
                                           f"{args.prefix}-k*.json"))):
        m = pat.search(f)
        if not m:
            continue
        k, seed = int(m.group(1)), int(m.group(2))
        for model, r in json.load(open(f)).items():
            res.setdefault((k, model), {})[seed] = r[args.metric]

    ks = sorted({k for k, _ in res})
    models = sorted({m for _, m in res} - {args.ref})
    seeds = sorted(set.intersection(*(set(res[(k, args.ref)]) for k in ks)))
    print(f"| model (Δ{args.metric} vs {args.ref}) | "
          + " | ".join(f"k={k}" for k in ks) + " |")
    print("|---|" + "---|" * len(ks))
    for m in models:
        cells = []
        for k in ks:
            d = np.array([res[(k, m)][s] - res[(k, args.ref)][s]
                          for s in seeds])
            nz = d[d != 0]
            pv = (wilcoxon(nz, alternative="greater").pvalue
                  if len(nz) else 1.0)
            cells.append(f"{d.mean():+.3f}±{d.std():.3f} "
                         f"({int((d > 0).sum())}/{len(d)} p={pv:.4f})")
        print(f"| {m} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
