"""Jitted training/eval step functions — the functional core.

Every reference trainer's per-batch body (reference: code/src/trainer.py)
becomes one pure function ``(state, batch, rng) -> (state, metrics)`` built by
a ``make_*_step`` factory closing over static configuration. The dual-
optimizer adversarial trainers (TC, MIM) run **both** phases inside a single
XLA program — no host round-trips between the VAE update and the
discriminator/estimator updates (SURVEY §7 hard part 6).

The KL annealing step counter lives in the TrainState, so the logistic
schedule (reference trainer.py:22-38) is traced, not host-side.

Data parallelism: these steps contain no explicit collectives. Under
``jax.jit`` with a sharded batch (see clearvae_tpu.parallel), the XLA SPMD
partitioner all-gathers the tiny [B, z] latents for the batch-global
contrastive/MI terms and psums gradients — numerics identical to single
device (SURVEY §2.2 design decision (b)).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from clearvae_tpu.ops import losses as L
from clearvae_tpu.ops.group import grouped_kl
from clearvae_tpu.ops.schedules import logistic_anneal

Array = jax.Array


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array
    # second player (factor classifier / MI estimator) for TC / MIM
    aux_params: Any = None
    aux_opt_state: Any = None


def init_vae_state(model, tx, rng, image_size: int, in_channel: int,
                   aux_model=None, aux_tx=None, aux_shapes=None) -> TrainState:
    """Initialize params/batch_stats/optimizers from dummy shapes.

    The whole initialization runs as ONE jitted program — eager flax init
    dispatches dozens of tiny programs, which is seconds-per-model over a
    remote-TPU tunnel."""

    def build(rng):
        x = jnp.zeros((2, image_size, image_size, in_channel))
        k1, k2, k3 = jax.random.split(rng, 3)
        variables = model.init({"params": k1, "reparam": k2}, x)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        aux_params = aux_opt_state = None
        if aux_model is not None:
            aux_vars = aux_model.init({"params": k3, "shuffle": k3},
                                      *[jnp.zeros(s) for s in aux_shapes])
            aux_params = aux_vars["params"]
            aux_opt_state = aux_tx.init(aux_params)
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32),
                          aux_params=aux_params,
                          aux_opt_state=aux_opt_state)

    return jax.jit(build)(rng)


def _forward(model, params, batch_stats, x, rng, *, train: bool,
             label=None, explicit: bool = True):
    out, muts = model.apply(
        {"params": params, "batch_stats": batch_stats}, x, label=label,
        explicit=explicit, train=train, rngs={"reparam": rng},
        mutable=["batch_stats"] if train else [],
    )
    new_stats = muts["batch_stats"] if train else batch_stats
    return out, new_stats


def _contrastive(cc, mu, logvar, label, ps):
    """Route to the fused Pallas kernel (cosine/snn) or the jnp path."""
    if getattr(cc, "fused", False):
        from clearvae_tpu.ops.pallas.fused_loss import fused_contrastive_loss

        return fused_contrastive_loss(mu, logvar, label, sim_fn=cc.sim_fn,
                                      temperature=cc.temperature,
                                      loss_name=cc.loss_name, ps=ps)
    return L.contrastive_loss(mu, logvar, label, sim_fn=cc.sim_fn,
                              temperature=cc.temperature,
                              loss_name=cc.loss_name, ps=ps)


def _clear_terms(lp, label, contrastive_cfg):
    """The two CLEAR regularizers (reference trainer.py:456-472)."""
    cc = contrastive_cfg
    c_loss = _contrastive(cc, lp["mu_c"], lp["logvar_c"], label, False)
    s_loss = _contrastive(cc, lp["mu_s"], lp["logvar_s"], label, bool(cc.ps))
    if not cc.ps:
        s_loss = -s_loss
    return c_loss, s_loss


# ---------------------------------------------------------------------------
# CLEAR-VAE (reference CLEARVAETrainer._train, trainer.py:435-493)
# ---------------------------------------------------------------------------


def make_clear_vae_step(model, tx, anneal_cfg, contrastive_cfg):
    cc = contrastive_cfg
    use_fused = (getattr(cc, "fused", False) and cc.sim_fn == "cosine"
                 and cc.loss_name == "snn")

    def loss_fn(params, batch_stats, x, label, rng, step):
        (x_hat, lp, _z), new_stats = _forward(model, params, batch_stats, x, rng,
                                              train=True)
        if use_fused:
            # one Pallas kernel for KL(c)+KL(s)+SNN+PS-SNN (fwd AND bwd)
            from clearvae_tpu.ops.pallas.fused_loss import (
                fused_clear_latent_loss)

            recon = L.sample_level_reduction((x_hat - x) ** 2)
            kl_c, kl_s, c_loss, s_loss = fused_clear_latent_loss(
                lp["mu_c"], lp["logvar_c"], lp["mu_s"], lp["logvar_s"],
                label, temperature=cc.temperature, ps=bool(cc.ps))
            if not cc.ps:
                s_loss = -s_loss
        else:
            recon, kl_c, kl_s = L.vae_loss(x_hat, x, lp["mu_c"],
                                           lp["logvar_c"], lp["mu_s"],
                                           lp["logvar_s"])
            c_loss, s_loss = _clear_terms(lp, label, contrastive_cfg)
        w = logistic_anneal(step, beta=anneal_cfg.beta, loc=anneal_cfg.loc,
                            scale=anneal_cfg.scale)
        loss = (recon + w * kl_c + w * kl_s
                + contrastive_cfg.alpha * (c_loss + s_loss))
        metrics = {"loss": loss, "recon": recon, "kl_c": kl_c, "kl_s": kl_s,
                   "c_loss": c_loss, "s_loss": s_loss}
        return loss, (new_stats, metrics)

    def step_core(state: TrainState, x, label, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, x, label, rng, state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_stats, opt_state=opt_state,
            step=state.step + 1), metrics

    step_fn = jax.jit(step_core)
    step_fn.core = step_core
    return step_fn


def make_clear_vae_eval_step(model, contrastive_cfg):
    """Eval-mode forward returning per-batch losses and sampled latents
    (reference CLEARVAETrainer.evaluate, trainer.py:495-570: MIG uses the
    *sampled* z halves, in eval/running-stats mode)."""

    @jax.jit
    def eval_fn(state: TrainState, x, label, rng):
        (x_hat, lp, z), _ = _forward(model, state.params, state.batch_stats,
                                     x, rng, train=False)
        recon, kl_c, kl_s = L.vae_loss(x_hat, x, lp["mu_c"], lp["logvar_c"],
                                       lp["mu_s"], lp["logvar_s"])
        c_loss, s_loss = _clear_terms(lp, label, contrastive_cfg)
        z_dim = lp["mu_c"].shape[-1]
        return {"recon": recon, "kl_c": kl_c, "kl_s": kl_s,
                "c_loss": c_loss, "s_loss": s_loss,
                "z_c": z[:, :z_dim], "z_s": z[:, z_dim:],
                "mu_c": lp["mu_c"], "mu_s": lp["mu_s"]}

    return eval_fn


# ---------------------------------------------------------------------------
# GVAE / ML-VAE (reference HierarchicalVAETrainer, trainer.py:291-412)
# ---------------------------------------------------------------------------


def make_hierarchical_step(model, tx, anneal_cfg):
    def loss_fn(params, batch_stats, x, label, rng, step):
        (x_hat, lp, _z), new_stats = _forward(model, params, batch_stats, x, rng,
                                              train=True, label=label)
        b = x.shape[0]
        recon = L.sample_level_reduction((x_hat - x) ** 2)
        kl_c = grouped_kl(lp["mu_c"], lp["logvar_c"], lp["present"])
        kl_s = -0.5 * L.sample_level_reduction(
            1 + lp["logvar_s"] - lp["mu_s"]**2 - jnp.exp(lp["logvar_s"]))
        m = jnp.maximum(jnp.sum(lp["present"]), 1)
        # group adjust: recon and kl_s scaled by B/m (trainer.py:322-324,345-348)
        adj = b / m
        recon_adj, kl_s_adj = recon * adj, kl_s * adj
        w = logistic_anneal(step, beta=anneal_cfg.beta, loc=anneal_cfg.loc,
                            scale=anneal_cfg.scale)
        loss = recon_adj + w * kl_c + w * kl_s_adj
        metrics = {"loss": loss, "recon": recon_adj, "kl_c": kl_c,
                   "kl_s": kl_s_adj}
        return loss, (new_stats, metrics)

    def step_core(state: TrainState, x, label, rng):
        (_, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, x, label,
                                   rng, state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_stats, opt_state=opt_state,
            step=state.step + 1), metrics

    step_fn = jax.jit(step_core)
    step_fn.core = step_core
    return step_fn


def make_hierarchical_eval_step(model, with_evidence_acc: bool = False):
    @jax.jit
    def eval_fn(state: TrainState, x, label, rng):
        lbl = label if with_evidence_acc else None
        (x_hat, lp, z), _ = _forward(model, state.params, state.batch_stats,
                                     x, rng, train=False, label=lbl)
        recon = L.sample_level_reduction((x_hat - x) ** 2)
        if with_evidence_acc:
            kl_c = grouped_kl(lp["mu_c"], lp["logvar_c"], lp["present"])
        else:
            kl_c = -0.5 * L.sample_level_reduction(
                1 + lp["logvar_c"] - lp["mu_c"]**2 - jnp.exp(lp["logvar_c"]))
        kl_s = -0.5 * L.sample_level_reduction(
            1 + lp["logvar_s"] - lp["mu_s"]**2 - jnp.exp(lp["logvar_s"]))
        z_dim = z.shape[-1] // 2
        return {"recon": recon, "kl_c": kl_c, "kl_s": kl_s,
                "z_c": z[:, :z_dim], "z_s": z[:, z_dim:]}

    return eval_fn


# ---------------------------------------------------------------------------
# CLEAR-TC-VAE (reference ClearTCVAETrainer, trainer.py:590-709)
# ---------------------------------------------------------------------------


def factor_shuffling(z: Array, strategy: str = "permute_1") -> Array:
    """Build 'marginal' samples by shifting z_s one position
    (reference trainer.py:573-587; the 'full' branch there is dead/buggy and
    intentionally not replicated)."""
    if strategy != "permute_1":
        raise ValueError("this strategy is not implemented yet")
    z_dim = z.shape[1] // 2
    z_c, z_s = z[:, :z_dim], z[:, z_dim:]
    z_s_changed = jnp.concatenate([z_s[1:, :], z_s[:1, :]], axis=0)
    return jnp.concatenate([z_c, z_s_changed], axis=1)


def make_clear_tc_step(model, factor_cls, tx, factor_tx, anneal_cfg,
                       contrastive_cfg, tc_cfg):
    la = tc_cfg.la

    def vae_loss_fn(params, batch_stats, factor_params, x, label, rng, step):
        (x_hat, lp, z), new_stats = _forward(model, params, batch_stats, x, rng,
                                             train=True)
        recon, kl_c, kl_s = L.vae_loss(x_hat, x, lp["mu_c"], lp["logvar_c"],
                                       lp["mu_s"], lp["logvar_s"])
        c_loss = _contrastive(contrastive_cfg, lp["mu_c"], lp["logvar_c"],
                              label, False)
        # relu(log(d/(1−d))) == relu(logit): identical to the reference
        # formula (trainer.py:664-673) but with bounded gradients at d→0/1
        logit = factor_cls.apply({"params": factor_params}, z, True)
        mi_loss = jnp.mean(jax.nn.relu(logit))
        w = logistic_anneal(step, beta=anneal_cfg.beta, loc=anneal_cfg.loc,
                            scale=anneal_cfg.scale)
        loss = (recon + w * kl_c + w * kl_s
                + contrastive_cfg.alpha * c_loss + la * mi_loss)
        metrics = {"loss": loss, "recon": recon, "kl_c": kl_c, "kl_s": kl_s,
                   "c_loss": c_loss, "mi_loss": mi_loss}
        return loss, (new_stats, metrics)

    def step_core(state: TrainState, x, label, rng):
        k_vae, k_disc = jax.random.split(rng)
        # phase 1: VAE update (factor params frozen — grads wrt params only)
        (_, (new_stats, metrics)), grads = jax.value_and_grad(
            vae_loss_fn, has_aux=True)(state.params, state.batch_stats,
                                       state.aux_params, x, label, k_vae,
                                       state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # phase 2: fresh forward with UPDATED vae params (trainer.py:679-681),
        # z detached; discriminator BCE on joint-vs-shuffled
        (_, _, z2), stats2 = _forward(model, new_params, new_stats, x, k_disc,
                                      train=True)
        z2 = jax.lax.stop_gradient(z2)

        def disc_loss_fn(factor_params):
            l_joint = factor_cls.apply({"params": factor_params}, z2, True)
            l_marg = factor_cls.apply(
                {"params": factor_params},
                factor_shuffling(z2, tc_cfg.shuffle_strategy), True)
            logits = jnp.concatenate([l_joint, l_marg], axis=0)
            target = jnp.concatenate(
                [jnp.ones_like(l_joint), jnp.zeros_like(l_marg)], axis=0)
            # == torch BCELoss(sigmoid(logits), target) but saturation-stable
            return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, target))

        d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(state.aux_params)
        d_updates, aux_opt_state = factor_tx.update(d_grads,
                                                    state.aux_opt_state,
                                                    state.aux_params)
        metrics["factor_d_loss"] = d_loss
        return state.replace(
            params=new_params, batch_stats=stats2, opt_state=opt_state,
            aux_params=optax.apply_updates(state.aux_params, d_updates),
            aux_opt_state=aux_opt_state, step=state.step + 1), metrics

    step_fn = jax.jit(step_core)
    step_fn.core = step_core
    return step_fn


def make_clear_tc_eval_step(model, factor_cls, contrastive_cfg):
    @jax.jit
    def eval_fn(state: TrainState, x, label, rng):
        (x_hat, lp, z), _ = _forward(model, state.params, state.batch_stats,
                                     x, rng, train=False)
        recon, kl_c, kl_s = L.vae_loss(x_hat, x, lp["mu_c"], lp["logvar_c"],
                                       lp["mu_s"], lp["logvar_s"])
        c_loss = L.contrastive_loss(lp["mu_c"], lp["logvar_c"], label,
                                    sim_fn=contrastive_cfg.sim_fn,
                                    temperature=contrastive_cfg.temperature)
        logit = factor_cls.apply({"params": state.aux_params}, z, True)
        mi_loss = jnp.mean(jax.nn.relu(logit))
        z_dim = z.shape[-1] // 2
        return {"recon": recon, "kl_c": kl_c, "kl_s": kl_s, "c_loss": c_loss,
                "mi_loss": mi_loss, "z_c": z[:, :z_dim], "z_s": z[:, z_dim:]}

    return eval_fn


# ---------------------------------------------------------------------------
# CLEAR-MIM-VAE (reference ClearMIMVAETrainer, trainer.py:781-897)
# ---------------------------------------------------------------------------


def make_clear_mim_step(model, mi_estimator, tx, mi_tx, anneal_cfg,
                        contrastive_cfg, mim_cfg):
    la = mim_cfg.la
    inner_steps = mim_cfg.inner_steps

    def vae_loss_fn(params, batch_stats, mi_params, x, label, rng, step):
        (x_hat, lp, z), new_stats = _forward(model, params, batch_stats, x, rng,
                                             train=True)
        recon, kl_c, kl_s = L.vae_loss(x_hat, x, lp["mu_c"], lp["logvar_c"],
                                       lp["mu_s"], lp["logvar_s"])
        c_loss = _contrastive(contrastive_cfg, lp["mu_c"], lp["logvar_c"],
                              label, False)
        zd = z.shape[-1] // 2
        mi_loss = mi_estimator.apply({"params": mi_params}, z[:, :zd], z[:, zd:],
                                     rngs={"shuffle": jax.random.fold_in(rng, 1)})
        w = logistic_anneal(step, beta=anneal_cfg.beta, loc=anneal_cfg.loc,
                            scale=anneal_cfg.scale)
        loss = (recon + w * kl_c + w * kl_s
                + contrastive_cfg.alpha * c_loss + la * mi_loss)
        metrics = {"loss": loss, "recon": recon, "kl_c": kl_c, "kl_s": kl_s,
                   "c_loss": c_loss, "mi_loss": mi_loss}
        return loss, (new_stats, metrics, lp)

    def step_core(state: TrainState, x, label, rng):
        k_vae, k_inner = jax.random.split(rng)
        # phase 1: VAE update (estimator params frozen)
        (_, (new_stats, metrics, lp1)), grads = jax.value_and_grad(
            vae_loss_fn, has_aux=True)(state.params, state.batch_stats,
                                       state.aux_params, x, label, k_vae,
                                       state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # phase 2: `inner_steps` estimator updates. The reference re-runs the
        # full VAE forward each inner step with the UPDATED params
        # (trainer.py:874-888); since encode is deterministic in train mode we
        # encode once and draw fresh reparameterization noise per inner step
        # (numerics identical apart from BN running-stat repetition — the
        # reference nudges running stats 5 extra times with the same batch
        # statistic, a documented deviation). ``reuse_phase1_encode`` goes one
        # step further (opt-in, default off): skip the re-encode and train
        # the estimator on the PRE-update params' latents (one-step stale) —
        # a measured-perf deviation from reference semantics, A/B'd in
        # BASELINE.md.
        if mim_cfg.reuse_phase1_encode:
            mu_c, logvar_c = lp1["mu_c"], lp1["logvar_c"]
            mu_s, logvar_s = lp1["mu_s"], lp1["logvar_s"]
        else:
            variables = {"params": new_params, "batch_stats": new_stats}
            (mu_c, logvar_c, mu_s, logvar_s), _ = model.apply(
                variables, x, train=True, method="encode",
                mutable=["batch_stats"])
        mu = jax.lax.stop_gradient(jnp.concatenate([mu_c, mu_s], -1))
        logvar = jax.lax.stop_gradient(
            jnp.concatenate([logvar_c, logvar_s], -1))
        zd = mu_c.shape[-1]

        def inner(carry, k):
            mi_params, mi_opt = carry
            eps = jax.random.normal(k, mu.shape, mu.dtype)
            z = jax.lax.stop_gradient(mu + eps * jnp.exp(0.5 * logvar))

            def ll(p):
                return mi_estimator.apply({"params": p}, z[:, :zd], z[:, zd:],
                                          method="learning_loss")

            l, g = jax.value_and_grad(ll)(mi_params)
            up, mi_opt = mi_tx.update(g, mi_opt, mi_params)
            return (optax.apply_updates(mi_params, up), mi_opt), l

        # unroll=inner_steps: the round-4 MIM trace showed the scan's while
        # bookkeeping alone cost ~39 us/step (while.282/while.290 — ~half
        # the MIM-vs-flagship device-time gap); unrolling 5 tiny-MLP
        # updates into straight-line code removes it at identical numerics
        # (the sequential Adam chain is preserved)
        (mi_params, mi_opt), inner_losses = jax.lax.scan(
            inner, (state.aux_params, state.aux_opt_state),
            jax.random.split(k_inner, inner_steps), unroll=inner_steps)
        metrics["mi_learning_loss"] = inner_losses[-1]
        return state.replace(
            params=new_params, batch_stats=new_stats, opt_state=opt_state,
            aux_params=mi_params, aux_opt_state=mi_opt,
            step=state.step + 1), metrics

    step_fn = jax.jit(step_core)
    step_fn.core = step_core
    return step_fn


def make_clear_mim_eval_step(model, mi_estimator, contrastive_cfg):
    @jax.jit
    def eval_fn(state: TrainState, x, label, rng):
        (x_hat, lp, z), _ = _forward(model, state.params, state.batch_stats,
                                     x, rng, train=False)
        recon, kl_c, kl_s = L.vae_loss(x_hat, x, lp["mu_c"], lp["logvar_c"],
                                       lp["mu_s"], lp["logvar_s"])
        c_loss = L.contrastive_loss(lp["mu_c"], lp["logvar_c"], label,
                                    sim_fn=contrastive_cfg.sim_fn,
                                    temperature=contrastive_cfg.temperature)
        zd = z.shape[-1] // 2
        mi_loss = mi_estimator.apply({"params": state.aux_params},
                                     z[:, :zd], z[:, zd:],
                                     rngs={"shuffle": rng})
        return {"recon": recon, "kl_c": kl_c, "kl_s": kl_s, "c_loss": c_loss,
                "mi_loss": mi_loss, "z_c": z[:, :zd], "z_s": z[:, zd:]}

    return eval_fn


# ---------------------------------------------------------------------------
# CNN classifiers (reference SimpleCNNTrainer / LAMCNNTrainer,
# trainer.py:168-288)
# ---------------------------------------------------------------------------


def _ce(logits, label):
    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits,
                                                                    label))


def make_cnn_step(model, tx):
    def loss_fn(params, batch_stats, x, label):
        logits, muts = model.apply({"params": params, "batch_stats": batch_stats},
                                   x, train=True, mutable=["batch_stats"])
        return _ce(logits, label), (muts["batch_stats"], logits)

    def step_core(state: TrainState, x, label, rng):
        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, x, label)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_stats, opt_state=opt_state,
            step=state.step + 1), {"loss": loss}

    step_fn = jax.jit(step_core)
    step_fn.core = step_core
    return step_fn


def stratified_shuffle(x: Array, label: Array, rng) -> Array:
    """ss_pairing: shuffle samples within each label stratum
    (reference LAMCNNTrainer.ss_pairing, trainer.py:249-257), jit-safe via
    the double-argsort trick."""
    n = label.shape[0]
    k1, k2 = jax.random.split(rng)
    u1 = jax.random.uniform(k1, (n,))
    u2 = jax.random.uniform(k2, (n,))
    s1 = jnp.lexsort((u1, label))
    s2 = jnp.lexsort((u2, label))
    perm = jnp.zeros(n, jnp.int32).at[s1].set(s2)
    return x[perm]


def make_lam_cnn_step(model, tx, lam_coef: float, head_weight_fn):
    def loss_fn(params, batch_stats, x, x_tilde, label):
        variables = {"params": params, "batch_stats": batch_stats}
        logits, muts = model.apply(variables, x, train=True,
                                   mutable=["batch_stats"])
        feats = model.apply(variables, x, train=True, method="features",
                            mutable=["batch_stats"])[0]
        feats_t = model.apply(variables, x_tilde, train=True,
                              method="features", mutable=["batch_stats"])[0]
        ce = _ce(logits, label)
        lam = L.lam_loss(feats, feats_t, label, head_weight_fn(params))
        return ce + lam_coef * lam, (muts["batch_stats"], ce, lam)

    def step_core(state: TrainState, x, label, rng):
        x_tilde = stratified_shuffle(x, label, rng)
        (_, (new_stats, ce, lam)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, x,
                                   x_tilde, label)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_stats, opt_state=opt_state,
            step=state.step + 1), {"ce_loss": ce, "lam_loss": lam}

    step_fn = jax.jit(step_core)
    step_fn.core = step_core
    return step_fn


def make_cnn_logits_fn(model):
    @jax.jit
    def logits_fn(state: TrainState, x):
        return model.apply({"params": state.params,
                            "batch_stats": state.batch_stats}, x, train=False)

    return logits_fn


# ---------------------------------------------------------------------------
# Downstream probe (reference DownstreamMLPTrainer, trainer.py:95-165)
# ---------------------------------------------------------------------------


def make_probe_step(vae_model, mlp, tx):
    """Train an MLP on the frozen VAE's mu_c (trainer.py:126-127).

    The VAE runs in eval mode (running BN stats), matching the reference's
    ``vae.eval()`` set by experiment_helper
    (run_styledmnist_downstream_expr.py:101)."""

    def step_core(mlp_state: TrainState, vae_params, vae_stats, x, label, rng):
        mu_c = vae_model.apply({"params": vae_params, "batch_stats": vae_stats},
                               x, train=False, method="encode")[0]

        def loss_fn(params, batch_stats):
            logits, muts = mlp.apply({"params": params,
                                      "batch_stats": batch_stats}, mu_c,
                                     train=True, mutable=["batch_stats"])
            return _ce(logits, label), muts["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(mlp_state.params, mlp_state.batch_stats)
        updates, opt_state = tx.update(grads, mlp_state.opt_state,
                                       mlp_state.params)
        return mlp_state.replace(
            params=optax.apply_updates(mlp_state.params, updates),
            batch_stats=new_stats, opt_state=opt_state,
            step=mlp_state.step + 1), {"loss": loss}

    step_fn = jax.jit(step_core)
    step_fn.core = step_core
    return step_fn


def make_probe_logits_fn(vae_model, mlp):
    @jax.jit
    def logits_fn(mlp_state: TrainState, vae_params, vae_stats, x):
        mu_c = vae_model.apply({"params": vae_params, "batch_stats": vae_stats},
                               x, train=False, method="encode")[0]
        return mlp.apply({"params": mlp_state.params,
                          "batch_stats": mlp_state.batch_stats}, mu_c,
                         train=False)

    return logits_fn


def make_probe_feature_logits_fn(mlp):
    """Probe logits from PRE-COMPUTED mu_c features (the style-on-device
    eval path: features come from the fused style+encode pass, so the
    styled pixels never exist host-side)."""

    @jax.jit
    def logits_fn(mlp_state: TrainState, feats):
        return mlp.apply({"params": mlp_state.params,
                          "batch_stats": mlp_state.batch_stats}, feats,
                         train=False)

    return logits_fn


# ---------------------------------------------------------------------------
# Whole-epoch runner: lax.scan over HBM-resident batches
# ---------------------------------------------------------------------------


def _batch_constrainer(mesh):
    """Sharding constraint pinning a gathered batch's leading axis to the
    'data' mesh axis (no-op without a mesh). Inside a scanned epoch the
    shuffled gather from sample-sharded data would otherwise leave GSPMD free
    to replicate the batch; the constraint keeps the per-step compute sharded
    so the scanned fast path and the mesh path compose (VERDICT r1 item 2)."""
    if mesh is None:
        return lambda *arrays: arrays
    from jax.sharding import NamedSharding, PartitionSpec as P

    from clearvae_tpu.parallel.mesh import DATA_AXIS

    def constrain(*arrays):
        return tuple(
            jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, P(DATA_AXIS)))
            for a in arrays)

    return constrain


def make_epoch_fn(step_core, mesh=None, unroll: int = 1,
                  gather: str = "take"):
    """Fuse an entire epoch into ONE XLA program.

    ``data``/``labels`` stay HBM-resident; ``batch_idx`` [n_batches, B] are
    the (host-shuffled) sample indices per batch; the scan body gathers each
    batch on device and applies ``step_core``. The input state buffers are
    donated. This removes the per-step host dispatch that dominates the
    naive loop (the reference pays a host→device copy and a tqdm device sync
    every batch, trainer.py:447,486-492).

    With ``mesh`` the data stays sample-sharded over the 'data' axis, each
    gathered batch is constrained batch-sharded, state stays replicated, and
    GSPMD inserts the gradient psums + tiny latent all-gathers — DP numerics
    identical to single device (tests/test_parallel.py).

    ``unroll`` > 1 unrolls that many scan iterations into the loop body
    (same gathers and step order; results match unroll=1 only up to float
    reassociation, since XLA may fuse across unrolled bodies — pinned at
    ~1e-4 after 3 epochs by tests/test_parallel.py. Trades compile time
    for less loop bookkeeping — the b128 trace attributes 22.8% of device
    time to scan overhead).

    ``gather`` picks how shuffled batches are materialized from HBM:
    ``"take"`` (default) row-gathers each batch inside the scan body;
    ``"permute_slice"`` performs ONE bulk row-gather of the whole epoch's
    permutation up front and lets the scan consume contiguous slices (scan
    xs slicing is free). Same batches, same step order — only the
    materialization strategy differs (the b2048 trace attributes 41% of
    device time to the in-scan gathers). Costs one epoch-sized HBM copy.
    """
    constrain = _batch_constrainer(mesh)

    if gather == "permute_slice":

        @partial(jax.jit, donate_argnums=(0,))
        def epoch_fn(state: TrainState, data, labels, batch_idx, rng):
            keys = jax.random.split(rng, batch_idx.shape[0])
            nb, bsz = batch_idx.shape
            flat = batch_idx.reshape(-1)
            xs = jnp.take(data, flat, axis=0).reshape(
                nb, bsz, *data.shape[1:])
            ls = jnp.take(labels, flat, axis=0).reshape(
                nb, bsz, *labels.shape[1:])

            def body(st, inp):
                xb, lb, k = inp
                xb, lb = constrain(xb, lb)
                st, metrics = step_core(st, xb, lb, k)
                return st, metrics

            state, ms = jax.lax.scan(body, state, (xs, ls, keys),
                                     unroll=unroll)
            return state, ms

        return epoch_fn

    if gather != "take":
        raise ValueError(f"unknown gather mode: {gather!r}")

    @partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(state: TrainState, data, labels, batch_idx, rng):
        keys = jax.random.split(rng, batch_idx.shape[0])

        def body(st, inp):
            idx, k = inp
            xb, lb = constrain(jnp.take(data, idx, axis=0),
                               jnp.take(labels, idx, axis=0))
            st, metrics = step_core(st, xb, lb, k)
            return st, metrics

        state, ms = jax.lax.scan(body, state, (batch_idx, keys),
                                 unroll=unroll)
        # ms: per-batch metric arrays [n_batches] (histories for TC/MIM)
        return state, ms

    return epoch_fn


def make_multi_epoch_fn(step_core, mesh=None, unroll: int = 1,
                        gather: str = "take"):
    """Fuse SEVERAL epochs into one XLA program (nested lax.scan).

    ``batch_idx`` is [n_epochs, n_batches, B]. Each program dispatch through
    the remote-TPU tunnel costs ~3ms of host latency; at reference scale one
    epoch is ~11ms of device time, so per-epoch dispatch leaves the chip idle
    ~25% of the time — fusing epochs measured 2.5× throughput (945k vs 377k
    img/s on a v5e chip). Metrics are reduced to the LAST batch of each epoch
    ([n_epochs] per key) to bound the output size.

    ``gather="permute_slice"`` bulk-gathers each epoch's permutation ONCE in
    the outer scan body and feeds the inner scan contiguous slices (see
    make_epoch_fn) — peak HBM is dataset + one epoch-sized copy.
    """
    constrain = _batch_constrainer(mesh)
    if gather not in ("take", "permute_slice"):
        raise ValueError(f"unknown gather mode: {gather!r}")
    permute = gather == "permute_slice"

    @partial(jax.jit, donate_argnums=(0,))
    def multi_epoch_fn(state: TrainState, data, labels, batch_idx, rng):
        keys = jax.random.split(rng, batch_idx.shape[0])

        def outer(st, inp):
            bi, k = inp
            ks = jax.random.split(k, bi.shape[0])

            if permute:
                nb, bsz = bi.shape
                flat = bi.reshape(-1)
                xs = jnp.take(data, flat, axis=0).reshape(
                    nb, bsz, *data.shape[1:])
                ls = jnp.take(labels, flat, axis=0).reshape(
                    nb, bsz, *labels.shape[1:])

                def body(s2, inp2):
                    xb, lb, kk = inp2
                    xb, lb = constrain(xb, lb)
                    return step_core(s2, xb, lb, kk)

                st, ms = jax.lax.scan(body, st, (xs, ls, ks), unroll=unroll)
            else:

                def body(s2, inp2):
                    idx, kk = inp2
                    xb, lb = constrain(jnp.take(data, idx, axis=0),
                                       jnp.take(labels, idx, axis=0))
                    return step_core(s2, xb, lb, kk)

                st, ms = jax.lax.scan(body, st, (bi, ks), unroll=unroll)
            return st, jax.tree.map(lambda a: a[-1], ms)

        state, ms = jax.lax.scan(outer, state, (batch_idx, keys))
        return state, ms

    return multi_epoch_fn


def make_probe_feature_epochs_fn(mlp, tx):
    """Fuse the ENTIRE probe training (all epochs × batches on cached
    features) into one donated XLA program.

    The probe MLP trains on [n, z] features — tiny math, so the per-batch
    eager loop is pure dispatch latency (41 epochs × ~300 batches ≈ 12k
    round-trips through the remote-TPU tunnel ≈ half a minute per probe).
    ``batch_idx`` is [n_epochs, n_batches, B]; one dispatch trains the
    whole probe."""

    @partial(jax.jit, donate_argnums=(0,))
    def epochs_fn(mlp_state: TrainState, feats, labels, batch_idx):
        def epoch(st, bi):
            def body(st, idx):
                st, m = _probe_feature_core(mlp, tx, st,
                                            jnp.take(feats, idx, axis=0),
                                            jnp.take(labels, idx, axis=0))
                return st, m["loss"]

            st, losses = jax.lax.scan(body, st, bi)
            return st, losses[-1]

        mlp_state, losses = jax.lax.scan(epoch, mlp_state, batch_idx)
        return mlp_state, {"loss": losses}

    return epochs_fn


def _probe_feature_core(mlp, tx, mlp_state: TrainState, mu_c, label):
    def loss_fn(params, batch_stats):
        logits, muts = mlp.apply({"params": params,
                                  "batch_stats": batch_stats}, mu_c,
                                 train=True, mutable=["batch_stats"])
        return _ce(logits, label), muts["batch_stats"]

    (loss, new_stats), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(mlp_state.params, mlp_state.batch_stats)
    updates, opt_state = tx.update(grads, mlp_state.opt_state,
                                   mlp_state.params)
    return mlp_state.replace(
        params=optax.apply_updates(mlp_state.params, updates),
        batch_stats=new_stats, opt_state=opt_state,
        step=mlp_state.step + 1), {"loss": loss}


def make_probe_feature_step(mlp, tx):
    """Probe step on pre-encoded features (frozen-VAE encode cached once)."""

    @jax.jit
    def step_fn(mlp_state: TrainState, mu_c, label):
        return _probe_feature_core(mlp, tx, mlp_state, mu_c, label)

    return step_fn


def make_styled_epoch_fn(step_core, styles=None, base_seed: int = 0,
                         mesh=None, unroll: int = 1):
    """Epoch runner that styles each batch ON THE FLY inside the scan body.

    Takes RAW images (0..255, [N, H, W]) + per-sample style indices +
    absolute sample ids; corruption keys are fold_in(base, sample_id), so the
    styled pixels are bit-identical to StyledDataset.materialize() while only
    the raw uint8-scale data needs to stay resident. Use when the dataset is
    too large to keep a styled float32 copy in HBM. ``unroll`` as in
    :func:`make_epoch_fn`.
    """
    from clearvae_tpu.data.styled import style_batch
    from clearvae_tpu.ops.corruptions import EXPERIMENT_STYLES, make_style_fn

    style_fn = make_style_fn(styles or EXPERIMENT_STYLES)
    constrain = _batch_constrainer(mesh)

    @partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(state: TrainState, raw, labels, style_idx, sample_ids,
                 batch_idx, rng):
        base = jax.random.key(base_seed)
        keys = jax.random.split(rng, batch_idx.shape[0])

        def body(st, inp):
            idx, k = inp
            xb, sb, ib, lb = constrain(jnp.take(raw, idx, axis=0),
                                       jnp.take(style_idx, idx, axis=0),
                                       jnp.take(sample_ids, idx, axis=0),
                                       jnp.take(labels, idx, axis=0))
            xb = style_batch(style_fn, xb, sb, ib, base)
            st, metrics = step_core(st, xb[..., None], lb, k)
            return st, metrics

        state, ms = jax.lax.scan(body, state, (batch_idx, keys),
                                 unroll=unroll)
        return state, ms

    return epoch_fn


def make_eval_epoch_fn(eval_step, mesh=None):
    """Scan an eval step over a whole [n_batches, B, ...] batched dataset in
    one XLA program; returns the metric/latent stacks (host reduces them).
    Cuts per-batch dispatch from evaluation the way make_epoch_fn does for
    training."""
    constrain = _batch_constrainer(mesh)

    @jax.jit
    def eval_epoch(state: TrainState, data, labels, batch_idx, rng):
        keys = jax.random.split(rng, batch_idx.shape[0])

        def body(_, inp):
            idx, k = inp
            xb, lb = constrain(jnp.take(data, idx, axis=0),
                               jnp.take(labels, idx, axis=0))
            out = eval_step(state, xb, lb, k)
            return None, out

        _, outs = jax.lax.scan(body, None, (batch_idx, keys))
        return outs

    return eval_epoch


def make_styled_eval_epoch_fn(eval_step, styles=None, base_seed: int = 0,
                              mesh=None):
    """Eval twin of :func:`make_styled_epoch_fn`: styles each batch on the
    fly inside the scanned eval program (same fold_in(base, sample_id) keys
    as materialize(), so metrics are identical to the materialized path)
    while only the raw 0..255 images stay resident."""
    from clearvae_tpu.data.styled import style_batch
    from clearvae_tpu.ops.corruptions import EXPERIMENT_STYLES, make_style_fn

    style_fn = make_style_fn(styles or EXPERIMENT_STYLES)
    constrain = _batch_constrainer(mesh)

    @jax.jit
    def eval_epoch(state: TrainState, raw, labels, style_idx, sample_ids,
                   batch_idx, rng):
        base = jax.random.key(base_seed)
        keys = jax.random.split(rng, batch_idx.shape[0])

        def body(_, inp):
            idx, k = inp
            xb, sb, ib, lb = constrain(jnp.take(raw, idx, axis=0),
                                       jnp.take(style_idx, idx, axis=0),
                                       jnp.take(sample_ids, idx, axis=0),
                                       jnp.take(labels, idx, axis=0))
            xb = style_batch(style_fn, xb, sb, ib, base)
            out = eval_step(state, xb[..., None], lb, k)
            return None, out

        _, outs = jax.lax.scan(body, None, (batch_idx, keys))
        return outs

    return eval_epoch
