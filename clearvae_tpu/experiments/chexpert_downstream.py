"""CheXpert train→test style-shift OOD downstream experiment.

NEW capability: the reference ships the CheXpert dataset class
(code/src/utils/data_utils.py:130-219) but no experiment runner uses it
(SURVEY §2.1). This runner applies the same k-style OOD protocol as the
CelebA/PACS experiments to CheXpert: disease outcome ∈ 4 content classes ×
(sex, age-group) ∈ 6 styles; grayscale 64×64, VAE64(in_channel=1), z=64,
β=1/32, Adam 3e-5 (the reference's 64×64 defaults,
run_celeba_downstream_expr.py:225-238).

Writes ``expr_output/chexpert/classification/chexpert-k{k}-{seed}.json``.
"""

from __future__ import annotations

import argparse

import numpy as np

from clearvae_tpu.data.chexpert import load_chexpert, synthetic_chexpert
from clearvae_tpu.data.common import (kstyle_train_test_split,
                                      train_valid_split_array)
from clearvae_tpu.experiments.common import (filter_models, run_model_zoo,
                                             save_results)
from clearvae_tpu.experiments.downstream64 import model_zoo64


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_root_path", type=str, default=None)
    p.add_argument("--csv", type=str, default=None,
                   help="CheXpert train.csv (with --data_root_path)")
    p.add_argument("--disease", type=str, default="Pleural Effusion")
    p.add_argument("--epochs", type=int, default=41)
    p.add_argument("--alpha", type=float, default=1e2)
    p.add_argument("--temperature", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--vae_lr", type=float, default=3e-5,
                   help="reference 64×64 default 3e-5; the synthetic "
                        "campaigns use 1e-4 (optimization-state fix, "
                        "BASELINE.md round-3 calibration)")
    p.add_argument("--models", type=str, nargs="*", default=None,
                   help="subset of zoo model names (calibration runs)")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--epochs_per_scan", type=int, default=1)
    # 4096 is the campaign protocol size (CLAUDE.md): every committed seed
    # used it, and resuming into the same results dir with a different n
    # would silently pool mismatched dataset sizes (VERDICT r3 weak #3).
    p.add_argument("--n_synthetic", type=int, default=4096)
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--k_max", type=int, default=3)
    p.add_argument("--perf_mode", action="store_true",
                   help="build the VAE zoo entries with the measured-fast "
                        "variant (bf16 conv stacks + fused latent heads); "
                        "results go to a separate *-perf.json — do not pool "
                        "with default-mode seeds")
    p.add_argument("--out", type=str,
                   default="./expr_output/chexpert/classification")
    return p.parse_args(argv)


def get_chexpert(data_root, csv, disease, n_synthetic, seed, max_images):
    if data_root and csv:
        import pandas as pd

        return load_chexpert(data_root, pd.read_csv(csv), disease,
                             max_images=max_images)
    return synthetic_chexpert(n_synthetic, seed)


def main(argv=None):
    from clearvae_tpu.utils.cache import enable_compilation_cache
    from clearvae_tpu.utils.lock import acquire_tpu_lock
    acquire_tpu_lock()  # explicit: not coupled to the cache call (VERDICT r4 #7)
    enable_compilation_cache()
    args = get_args(argv)
    seed = args.seed if args.seed is not None else int(np.random.randint(0, 1000))
    ds = get_chexpert(args.data_root_path, args.csv, args.disease,
                      args.n_synthetic, seed, args.max_images)
    trainer_kwargs = {"beta": 1 / 32, "vae_lr": args.vae_lr, "z_dim": 64,
                      "alpha": args.alpha, "temperature": args.temperature}
    classes = sorted(np.unique(ds.labels).tolist())
    styles = sorted(np.unique(ds.style_idx).tolist())
    for k in range(1, args.k_max + 1):
        print(f"Experiment: k={k}, seed={seed}")
        train_full, test, _ = kstyle_train_test_split(ds, classes, styles, k,
                                                      seed)
        train, valid = train_valid_split_array(train_full, 0.85, seed)
        models = model_zoo64(len(classes), trainer_kwargs, seed,
                             in_channel=1, perf_mode=args.perf_mode)
        models = filter_models(models, args.models)
        suffix = "-perf" if args.perf_mode else ""
        fpath = f"{args.out}/chexpert-k{k}-{seed}{suffix}.json"
        results = run_model_zoo(models, train, valid, test, args.epochs,
                                batch_size=args.batch_size,
                                n_class=len(classes), resume_path=fpath,
                                epochs_per_scan=args.epochs_per_scan)
        save_results(results, fpath)


if __name__ == "__main__":
    main()
