"""Camelyon17 (WILDS) hospital-shift OOD downstream experiment
(rebuild of reference code/run_camelyon17_downstream_expr.ipynb cells 4-11).

Tumor/normal content × hospital (center) ∈ 5 styles; zoo additionally
includes the LAM-CNN (lam_coef=0.001). Notebook hyperparameters: β=1/32,
lr 1e-4, z=64, α=100, τ=0.3 (τ=0.1 for CLEAR-TC), epochs 7 (6 for CNNs),
batch 64, MLP probe 1 epoch; results JSON persisted incrementally per model.
"""

from __future__ import annotations

import argparse

import numpy as np

from clearvae_tpu.data.camelyon17 import (
    get_camelyon17,
    kcamelyon_train_test_split,
)
from clearvae_tpu.data.common import train_valid_split_array
from clearvae_tpu.experiments.common import (filter_models, run_model_zoo,
                                             save_results)
from clearvae_tpu.experiments.downstream64 import model_zoo64


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_root_path", type=str, default=None)
    p.add_argument("--epochs", type=int, default=7)
    p.add_argument("--cnn_epochs", type=int, default=6)
    p.add_argument("--alpha", type=float, default=100.0)
    p.add_argument("--temperature", type=float, default=0.3)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--n_synthetic", type=int, default=2048)
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--k", type=int, default=1)
    p.add_argument("--models", type=str, nargs="*", default=None,
                   help="run only these zoo entries (prefix match)")
    p.add_argument("--perf_mode", action="store_true",
                   help="build the VAE zoo entries with the measured-fast "
                        "variant (bf16 conv stacks + fused latent heads); "
                        "results go to a separate *-perf.json — do not pool "
                        "with default-mode seeds")
    p.add_argument("--out", type=str,
                   default="./expr_output/camelyon17/classification")
    return p.parse_args(argv)


def main(argv=None):
    from clearvae_tpu.utils.cache import enable_compilation_cache
    from clearvae_tpu.utils.lock import acquire_tpu_lock
    acquire_tpu_lock()  # explicit: not coupled to the cache call (VERDICT r4 #7)
    enable_compilation_cache()
    args = get_args(argv)
    seed = args.seed if args.seed is not None else int(np.random.randint(0, 1000))
    data = get_camelyon17(args.data_root_path, n_synthetic=args.n_synthetic,
                          seed=seed, max_images=args.max_images)
    trainer_kwargs = {"beta": 1 / 32, "vae_lr": 1e-4, "z_dim": 64,
                      "alpha": args.alpha, "temperature": args.temperature}
    print(f"Experiment: k={args.k}, seed={seed}")
    train_full, test, _ = kcamelyon_train_test_split(data, args.k, seed)
    train, valid = train_valid_split_array(train_full, 0.85, seed)
    models = filter_models(
        model_zoo64(2, trainer_kwargs, seed, lam_coef=0.001,
                    tc_temperature=0.1, perf_mode=args.perf_mode),
        args.models)

    # incremental persistence like the notebook (cell 9): the results JSON
    # is run_model_zoo's resume manifest — finished models are skipped, so
    # a crashed run resumes cheaply
    suffix = "-perf" if args.perf_mode else ""
    fpath = f"{args.out}/camelyon17-k{args.k}-{seed}{suffix}.json"
    results = run_model_zoo(models, train, valid, test, args.epochs,
                            batch_size=args.batch_size, n_class=2,
                            probe_epochs=1, resume_path=fpath,
                            cnn_epochs=args.cnn_epochs)
    save_results(results, fpath)


if __name__ == "__main__":
    main()
