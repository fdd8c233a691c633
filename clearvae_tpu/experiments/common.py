"""Shared experiment plumbing (reference: run_styledmnist_downstream_expr.py:92-225)."""

from __future__ import annotations

import json
import os

import numpy as np

from clearvae_tpu.train.trainers import DownstreamMLPTrainer, SimpleCNNTrainer


def experiment_helper(train_ds, valid_ds, test_ds, vae_trainer, epochs: int,
                      batch_size: int = 128, n_class: int = 10,
                      probe_lr: float = 3e-4, probe_epochs: int | None = None,
                      epochs_per_scan: int = 1, style_on_device: bool = False):
    """Train VAE → freeze → train MLP probe on mu_c → test metrics
    (reference experiment_helper, run_styledmnist_downstream_expr.py:92-127).

    The probe trains for the same number of epochs as the VAE unless
    ``probe_epochs`` overrides (the Camelyon17 notebook uses 1).
    ``epochs_per_scan`` > 1 fuses epoch blocks into single program dispatches
    (validation/verbose then fire at block boundaries)."""
    vae_trainer.fit(epochs, train_ds, valid_ds, batch_size=batch_size,
                    epochs_per_scan=epochs_per_scan,
                    style_on_device=style_on_device)
    probe = DownstreamMLPTrainer(vae_trainer, n_class=n_class, lr=probe_lr)
    # style_on_device extends through the probe and test evaluation: the
    # fused style+encode pass keeps the styled pixels device-only end to end
    probe.fit(probe_epochs or epochs, train_ds, valid_ds,
              batch_size=batch_size, style_on_device=style_on_device)
    (aupr, auroc), acc = probe.evaluate(test_ds, batch_size=batch_size,
                                        style_on_device=style_on_device)
    return aupr, auroc, acc


def run_model_zoo(models: dict, train_ds, valid_ds, test_ds, epochs: int,
                  batch_size: int = 128, n_class: int = 10,
                  probe_epochs: int | None = None,
                  resume_path: str | None = None,
                  epochs_per_scan: int = 1,
                  style_on_device: bool = False,
                  cnn_epochs: int | None = None) -> dict:
    """Train every (factory, params) entry and collect the reference's result
    schema: {model: {acc, pr: {overall, stratified}, roc: {...}}}
    (reference run_styledmnist_downstream_expr.py:190-216).

    With ``resume_path`` the results JSON doubles as a manifest: models
    already present are skipped and each finished model is persisted
    immediately (the resumable-experiment pattern SURVEY §5 calls for).
    ``cnn_epochs`` overrides ``epochs`` for the discriminative CNN zoo
    entries (the Camelyon17 notebook trains CNNs 6 epochs vs VAEs 7)."""
    results = {}
    if resume_path and os.path.exists(resume_path):
        results = json.load(open(resume_path))
        if results:
            print(f"resuming: {sorted(results)} already done")
    for model_name, (trainer_func, params) in models.items():
        if model_name in results:
            continue
        print(f"\nTraining {model_name}:")
        trainer = trainer_func(**params)
        if isinstance(trainer, SimpleCNNTrainer):
            trainer.fit(cnn_epochs if cnn_epochs is not None else epochs,
                        train_ds, valid_ds, batch_size=batch_size,
                        epochs_per_scan=epochs_per_scan,
                        style_on_device=style_on_device)
            (aupr, auroc), acc = trainer.evaluate(
                test_ds, batch_size=batch_size,
                style_on_device=style_on_device)
        else:
            aupr, auroc, acc = experiment_helper(
                train_ds, valid_ds, test_ds, trainer, epochs,
                batch_size=batch_size, n_class=n_class,
                probe_epochs=probe_epochs,
                epochs_per_scan=epochs_per_scan,
                style_on_device=style_on_device)
        results[model_name] = {
            "acc": round(float(acc), 3),
            "pr": {"overall": round(float(np.mean(list(aupr.values()))), 3),
                   "stratified": {int(k): v for k, v in aupr.items()}},
            "roc": {"overall": round(float(np.mean(list(auroc.values()))), 3),
                    "stratified": {int(k): v for k, v in auroc.items()}},
        }
        if resume_path:
            save_results(results, resume_path)
    return results


def filter_models(models: dict, names) -> dict:
    """Subset a model zoo by exact or prefix name match (the runners'
    ``--models`` flag; e.g. ``--models baseline clear-mim`` keeps the
    baseline and both MIM variants). ``names`` falsy → unchanged."""
    if not names:
        return models
    keep: set = set()
    for n in names:
        exact = [k for k in models if k == n]
        matched = exact or [k for k in models if k.startswith(n)]
        if not matched:
            raise KeyError(f"unknown model selector {n!r}; "
                           f"available: {sorted(models)}")
        keep.update(matched)
    return {k: v for k, v in models.items() if k in keep}


def make_mig_cell(epochs: int, train, valid, test, batch_size: int):
    """Standard ``evaluate_cell`` for :func:`run_mig_sweep`: fit, then
    return (mig, elbo) on the test split. Hierarchical (MLVAE/GVAE)
    trainers skip the evidence-accuracy pass — the sweep only consumes
    mig/elbo. Shared by the MNIST and CelebA sweep runners."""
    from clearvae_tpu.train.trainers import HierarchicalVAETrainer

    def cell(name, get_trainer, beta):
        trainer = get_trainer(beta)
        trainer.fit(epochs, train, valid, batch_size=batch_size)
        if isinstance(trainer, HierarchicalVAETrainer):
            return trainer.evaluate(test, batch_size=batch_size,
                                    with_evidence_acc=False)
        return trainer.evaluate(test, batch_size=batch_size)

    return cell


def run_mig_sweep(models: dict, betas, fpath: str, evaluate_cell):
    """β×model MIG/ELBO sweep with the CSV as an incremental resume manifest.

    Persists after every (beta, model) cell and skips cells already present,
    the same failure-recovery design as :func:`run_model_zoo`'s results JSON
    (the reference sweep is monolithic and only writes at the very end,
    run_mig_expr_mnist.py:163-198). ``evaluate_cell(name, get_trainer, beta)``
    must train the model and return ``(mig, elbo)``."""
    import pandas as pd

    cols = ["model", "beta", "mig", "elbo"]
    rows, done = [], set()
    if os.path.exists(fpath):
        rows = pd.read_csv(fpath).to_dict("records")
        done = {(r["model"], round(float(r["beta"]), 10)) for r in rows}
        if rows:
            print(f"resuming: {len(rows)} finished cells in {fpath}")

    def persist():
        os.makedirs(os.path.dirname(os.path.abspath(fpath)), exist_ok=True)
        # columns= keeps the empty-rows frame schema'd (plain
        # pd.DataFrame([])[cols] raises KeyError after e.g. a headers-only
        # resume CSV combined with an empty beta/model grid).
        # Write-temp-then-rename: a crash mid-write must not corrupt the
        # resume manifest itself.
        tmp = fpath + ".tmp"
        pd.DataFrame(rows, columns=cols).to_csv(tmp, index=False)
        os.replace(tmp, fpath)

    for beta in betas:
        print(f"==== BETA {beta} ====")
        for name, get_trainer in models.items():
            if (name, round(float(beta), 10)) in done:
                print(f"---- {name} (cached) ----")
                continue
            print(f"---- {name} ----")
            mig, elbo = evaluate_cell(name, get_trainer, beta)
            rows.append({"model": name, "beta": beta,
                         "mig": mig, "elbo": elbo})
            persist()
    persist()
    return pd.DataFrame(rows, columns=cols)


def save_results(results: dict, fpath: str):
    os.makedirs(os.path.dirname(os.path.abspath(fpath)), exist_ok=True)
    # atomic: this JSON doubles as the zoo's resume manifest
    tmp = fpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(results, f, indent=4)
    os.replace(tmp, fpath)
    print(f"wrote {fpath}")
