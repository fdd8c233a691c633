"""MIG/ELBO sweep on CelebA (rebuild of reference code/run_mig_expr_celeba.py).

Hair color is the style; 80/10/10 split of the filtered CelebA; zoo of 8
models on VAE64 (lr 3e-5, z 16 default, α 1e2, τ 0.1, epochs 16, batch 128;
reference :95-155). Writes
``expr_output/celeba/mig_elbo_s{seed}_a{alpha}_z{z}_t{temp}.csv``.
"""

from __future__ import annotations

import argparse

import numpy as np

from clearvae_tpu.data.celeba import get_celeba
from clearvae_tpu.experiments.common import (make_mig_cell,
                                             run_mig_sweep)
from clearvae_tpu.train.factories import (
    get_clearvae_trainer,
    get_cleartcvae_trainer,
    get_clearmimvae_trainer,
    get_hierarchical_vae_trainer,
)

BETAS = [1 / 8]  # full sweep in the reference: [1/32 .. 8]


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_root_path", type=str, default=None)
    p.add_argument("--seed", type=int, default=101)
    p.add_argument("--alpha", type=float, default=1e2)
    p.add_argument("--epochs", type=int, default=16)
    p.add_argument("--temperature", type=float, default=0.1)
    p.add_argument("--z_dim", type=int, default=16)
    p.add_argument("--n_synthetic", type=int, default=2048)
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--betas", type=float, nargs="*", default=None)
    p.add_argument("--mig_backend", type=str, default="auto",
                   choices=["auto", "native", "numpy", "jnp"],
                   help="MIG KSG backend ('jnp' = on-TPU; see mig_expr.py)")
    p.add_argument("--out", type=str, default="./expr_output/celeba")
    return p.parse_args(argv)


def main(argv=None):
    from clearvae_tpu.utils.cache import enable_compilation_cache
    from clearvae_tpu.utils.lock import acquire_tpu_lock
    acquire_tpu_lock()  # explicit: not coupled to the cache call (VERDICT r4 #7)
    enable_compilation_cache()
    args = get_args(argv)
    betas = args.betas or BETAS
    ds = get_celeba(args.data_root_path, n_synthetic=args.n_synthetic,
                    seed=args.seed, max_images=args.max_images)
    rs = np.random.RandomState(args.seed)
    idx = rs.permutation(len(ds))
    n8, n1 = int(len(ds) * 0.8), int(len(ds) * 0.1)
    train = ds.subset(idx[:n8])
    valid = ds.subset(idx[n8:n8 + n1])
    test = ds.subset(idx[n8 + n1:])

    dh = {"vae_lr": 3e-5, "z_dim": args.z_dim, "alpha": args.alpha,
          "temperature": args.temperature, "vae_arch": "VAE64",
          "in_channel": 3, "seed": args.seed,
          "mig_backend": args.mig_backend}
    hier = {"vae_lr": 3e-5, "z_dim": args.z_dim, "vae_arch": "VAE64",
            "in_channel": 3, "n_classes": 4, "seed": args.seed,
            "mig_backend": args.mig_backend}
    models = {
        "clear-ps": lambda b: get_clearvae_trainer(beta=b, ps=True, **dh),
        "clear-neg": lambda b: get_clearvae_trainer(beta=b, ps=False, **dh),
        "bvae": lambda b: get_clearvae_trainer(beta=b, ps=False,
                                               **{**dh, "alpha": 0}),
        "clear-tc": lambda b: get_cleartcvae_trainer(
            beta=b, la=1, factor_cls_lr=1e-4, **dh),
        "clear-mim (L1OutUB)": lambda b: get_clearmimvae_trainer(
            beta=b, mi_estimator="L1OutUB", la=3, mi_estimator_lr=2e-3, **dh),
        "clear-mim (CLUB-S)": lambda b: get_clearmimvae_trainer(
            beta=b, mi_estimator="CLUBSample", la=3, mi_estimator_lr=2e-3,
            **dh),
        "mlvae": lambda b: get_hierarchical_vae_trainer(
            beta=b, group_mode="MLVAE", **hier),
        "gvae": lambda b: get_hierarchical_vae_trainer(
            beta=b, group_mode="GVAE", **hier),
    }

    fpath = (f"{args.out}/mig_elbo_s{args.seed}_a{args.alpha}"
             f"_z{args.z_dim}_t{args.temperature}.csv")

    cell = make_mig_cell(args.epochs, train, valid, test, args.batch_size)
    df = run_mig_sweep(models, betas, fpath, cell)
    print(f"wrote {fpath}")
    return df


if __name__ == "__main__":
    main()
