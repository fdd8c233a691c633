"""Benchmark harness: CLEAR-VAE family training throughput on TPU.

Flagship config (reference run_styledmnist_downstream_expr.py:231-238):
Styled-MNIST CLEAR-VAE, z_dim=16, batch=128, beta=1/8, alpha=1e2, tau=0.1,
Adam lr 5e-4, sim_fn=cosine.

Prints ONE JSON line:
  {"metric": ..., "value": images/sec/chip, "unit": ..., "vs_baseline": ratio,
   "configs": {<name>: {images_per_sec_per_chip, mfu, ...}, ...}}

The configs dict adds the rows VERDICT r2 item 4 asked for: VAE64 (z=64,
batch 128, the CelebA/PACS/Camelyon17 pipeline config), CLEAR-TC and
CLEAR-MIM dual-optimizer steps, bf16, and a non-parity "perf mode" point
(bf16, batch 2048) showing throughput/MFU off the reference-parity batch.

vs_baseline: ratio against the PyTorch-CPU *reference implementation* run in
this same container (the reference publishes no numbers — BASELINE.md). The
torch baseline is measured once by importing the reference's own trainer
(read-only) on synthetic data and cached in .bench_baseline.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")

BATCH = 128
Z_DIM = 16
# Every config's target_window_images is sized so one timing window is
# >=1.2s of device time AT THE MEASURED RATE of that config (bench_r3.json)
# — the final block_until_ready roundtrip through the remote-TPU tunnel
# (~100ms) then amortizes to <10% instead of biasing throughput down.
N_IMAGES = 4096

# TPU v5e (1 chip) peak: 197 TFLOP/s bf16 on the MXU (f32 matmuls decompose
# into multiple bf16 passes, so the same peak is the roofline either way).
V5E_PEAK_FLOPS = 197e12


def _conv_macs(size: int, chans, kernel: int) -> tuple[int, int, int]:
    """(encoder MACs, decoder MACs, flat dim) for the mirrored conv stacks
    (reference vae.py:15-46, 113-156): stride-2 convs in→chans, decoder
    ConvTs mirroring them."""
    enc = 0
    spatial = size
    for cin, cout in zip(chans[:-1], chans[1:]):
        spatial = (spatial + 1) // 2
        enc += spatial * spatial * cout * kernel * kernel * cin
    flat = spatial * spatial * chans[-1]
    dec = 0
    spatial_in = spatial
    for cin, cout in zip(reversed(chans[1:]), reversed(chans[:-1])):
        dec += spatial_in * spatial_in * cin * kernel * kernel * cout
        spatial_in *= 2
    return enc, dec, flat


def clear_vae_train_flops_per_image(z_dim: int = Z_DIM, batch: int = BATCH,
                                    size: int = 28, in_ch: int = 1,
                                    variant: str = "clear") -> float:
    """Analytic training FLOPs per image for a CLEAR-family step: 2 FLOPs/MAC
    forward, backward ≈ 2× forward (standard MFU accounting). XLA's compiled
    cost_analysis() cannot be used here — TPU convolutions lower into fused
    custom calls whose FLOPs it does not count (measured ~40× undercount), so
    the roofline number comes from the layer math.

    ``variant``: 'clear' = fwd+bwd (3× fwd). 'tc' adds the discriminator
    phase's fresh VAE forward (steps.py make_clear_tc_step phase 2; the
    factor classifier itself is O(z²), negligible). 'mim' adds one
    encoder-only forward plus 5 inner estimator steps on tiny MLPs
    (steps.py make_clear_mim_step phase 2)."""
    if size >= 64:
        chans = (in_ch, 32, 64, 128, 256, 512)
        kernel = 4
    else:
        chans = (in_ch, 32, 64, 128)
        kernel = 3
    enc, dec, flat = _conv_macs(size, chans, kernel)
    heads = 4 * flat * (z_dim // 2)          # four latent heads
    dec_dense = z_dim * flat                 # decoder dense
    fwd = enc + heads + dec_dense + dec
    # contrastive [B,B] sim matrices on mu_c and mu_s (cosine: one matmul each)
    fwd += 2 * batch * (z_dim // 2)          # per image: B·z/2 MACs ×2 halves
    macs = 3 * fwd                           # fwd + bwd(≈2×fwd)
    if variant == "tc":
        z = z_dim
        macs += fwd + 3 * 2 * (z * z + z)   # fresh fwd + disc step (2×[B,2z]→1)
    elif variant == "mim":
        zh, hidden = z_dim // 2, z_dim
        est = 2 * (zh * hidden + hidden * zh)   # p_mu + p_logvar MLPs
        macs += (enc + heads) + 5 * 3 * est     # one encode + 5 estimator steps
    return 2 * macs


def _make_state_and_step(kind: str, dtype, z_dim: int, size: int,
                         in_ch: int, fused_heads: bool = False,
                         model_kwargs: dict | None = None):
    import jax
    import optax

    from clearvae_tpu.config import (AnnealConfig, ContrastiveConfig,
                                     MIMConfig, TCConfig)
    from clearvae_tpu.models.vae import VAE, VAE64
    from clearvae_tpu.train import steps as S

    kw = {"dtype": dtype} if dtype is not None else {}
    if fused_heads:
        kw["fused_heads"] = True
    kw.update(model_kwargs or {})
    cls = VAE64 if size >= 64 else VAE
    model = cls(total_z_dim=z_dim, in_channel=in_ch, **kw)
    tx = optax.adam(5e-4)
    anneal = AnnealConfig(beta=1 / 8)
    contr = ContrastiveConfig(alpha=1e2, temperature=0.1, ps=True)
    rng = jax.random.key(0)
    if kind == "clear":
        state = S.init_vae_state(model, tx, rng, size, in_ch)
        step = S.make_clear_vae_step(model, tx, anneal, contr)
    elif kind == "tc":
        from clearvae_tpu.models.factor import FactorCls

        factor = FactorCls(z_dim=z_dim)
        ftx = optax.adam(1e-4)
        state = S.init_vae_state(model, tx, rng, size, in_ch,
                                 aux_model=factor, aux_tx=ftx,
                                 aux_shapes=[(2, z_dim)])
        step = S.make_clear_tc_step(model, factor, tx, ftx, anneal, contr,
                                    TCConfig(la=1.0))
    elif kind == "mim":
        from clearvae_tpu.models.mi_estimators import CLUBSample

        zh = z_dim // 2
        est = CLUBSample(x_dim=zh, y_dim=zh, hidden_size=z_dim)
        mtx = optax.adam(2e-3)
        state = S.init_vae_state(model, tx, rng, size, in_ch,
                                 aux_model=est, aux_tx=mtx,
                                 aux_shapes=[(2, zh), (2, zh)])
        step = S.make_clear_mim_step(model, est, tx, mtx, anneal, contr,
                                     MIMConfig(la=3.0))
    else:
        raise ValueError(kind)
    return model, state, step


def measure_config(kind: str = "clear", dtype=None, batch: int = BATCH,
                   z_dim: int = Z_DIM, size: int = 28, in_ch: int = 1,
                   target_window_images: int = 1_200_000, n_images: int = N_IMAGES,
                   fused_heads: bool = False, unroll: int = 1,
                   gather: str = "take", model_kwargs: dict | None = None):
    """Returns median images/sec/chip over 3 timing windows for one config.

    The production fast path: HBM-resident data, a whole block of epochs
    fused into one scanned XLA program per dispatch (the same
    make_multi_epoch_fn program trainers run with fit(epochs_per_scan=...));
    with multiple chips the batch shards over a 1-D data mesh (GSPMD)."""
    import jax
    import jax.numpy as jnp

    from clearvae_tpu.train.steps import make_multi_epoch_fn

    rs = np.random.RandomState(0)
    if size == 28 and in_ch == 1:
        from clearvae_tpu.data.mnist import synthetic_mnist
        from clearvae_tpu.data.styled import make_styled_mnist

        imgs, labels = synthetic_mnist(n_images, seed=0)
        ds = make_styled_mnist(imgs, labels, seed=0)
        data = np.asarray(ds.materialize())[..., None]
    else:
        data = rs.rand(n_images, size, size, in_ch).astype(np.float32)
        labels = rs.randint(0, 10, n_images)

    model, state, step = _make_state_and_step(kind, dtype, z_dim, size, in_ch,
                                              fused_heads=fused_heads,
                                              model_kwargs=model_kwargs)

    mesh = None
    if jax.device_count() > 1:
        from clearvae_tpu.parallel.mesh import (make_mesh, replicate_state,
                                                shard_batch)

        mesh = make_mesh()
    epoch_fn = make_multi_epoch_fn(step.core, mesh=mesh, unroll=unroll,
                                   gather=gather)
    data = jnp.asarray(data)
    lbl = jnp.asarray(labels)
    if mesh is not None:
        state = replicate_state(mesh, state)
        data, lbl = shard_batch(mesh, data, lbl)
    n_batches = n_images // batch
    epochs_per_block = max(1, target_window_images // (n_batches * batch))

    def one_block(state, seed):
        bi = np.stack([rs.permutation(n_images)[: n_batches * batch]
                       .reshape(n_batches, batch)
                       for _ in range(epochs_per_block)])
        return epoch_fn(state, data, lbl, jnp.asarray(bi),
                        jax.random.key(seed))

    state, m = one_block(state, 0)  # compile + warmup
    np.asarray(m["loss"])  # device_get = true sync (see window note below)

    # median of 3 timing windows — throughput through the remote-TPU tunnel
    # is noisy, and a single short window under-reports steady state.
    # Window end is a HOST TRANSFER of the tiny per-epoch loss vector, not
    # jax.block_until_ready: on the axon remote backend block_until_ready
    # can return before the dispatched program actually finishes (measured:
    # 122-epoch VAE64 blocks "completing" in 6ms -> a 260x-inflated rate),
    # while a device_get cannot lie about completion.
    rates = []
    for w in range(3):
        t0 = time.perf_counter()
        state, m = one_block(state, 1 + w)
        np.asarray(m["loss"])
        rates.append(epochs_per_block * n_batches * batch
                     / (time.perf_counter() - t0))
    return float(np.median(rates))


def measure_torch_baseline(max_seconds: float = 120.0) -> float:
    """Run the reference implementation (PyTorch CPU) on the same config.

    Imports the reference's own CLEARVAETrainer/VAE/losses — no reimplemented
    torch code here — on synthetic styled data.
    """
    import torch
    from torch.utils.data import DataLoader, TensorDataset

    sys.path.insert(0, "/root/reference/code")
    from src.models.vae import VAE as TorchVAE  # noqa: E402
    from src.trainer import CLEARVAETrainer as TorchTrainer  # noqa: E402

    torch.manual_seed(0)
    n = BATCH * 16
    x = torch.rand(n, 1, 28, 28)
    y = torch.randint(0, 10, (n,))
    loader = DataLoader(TensorDataset(x, y), batch_size=BATCH, shuffle=False)

    vae = TorchVAE(total_z_dim=Z_DIM)
    opt = torch.optim.Adam(vae.parameters(), lr=5e-4)
    trainer = TorchTrainer(
        vae, opt, sim_fn="cosine",
        hyperparameter={"temperature": 0.1, "alpha": 1e2, "beta": 1 / 8,
                        "ps": True, "loc": 0, "scale": 1},
        verbose_period=10**9, device=torch.device("cpu"))

    import itertools

    def run_batches(k):
        count = 0
        t0 = time.perf_counter()
        for _ in range(k):
            trainer._train(itertools.islice(iter(loader), 4), False, 0)
            count += 4 * BATCH
            if time.perf_counter() - t0 > max_seconds:
                break
        return count / (time.perf_counter() - t0)

    run_batches(1)  # warmup
    return run_batches(4)


def _host_load_context() -> dict:
    """Provenance for the baseline cache: a torch-CPU number measured on a
    contended host silently inflates vs_baseline for every later bench run
    (the round-3 744x figure came from a 1230 img/s cache vs the honest
    ~1732 img/s idle-host rate — VERDICT r3 weak #1). Stamp enough context
    to detect that after the fact."""
    n_python = 0
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/comm") as f:
                    if "python" in f.read():
                        n_python += 1
            except OSError:
                continue
    except OSError:
        n_python = -1
    return {
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "loadavg_1m": os.getloadavg()[0],
        "n_python_procs": n_python,  # includes this one
        "cpu_count": os.cpu_count(),
    }


def get_torch_baseline() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        ctx = {k: cached.get(k) for k in ("measured_at", "loadavg_1m",
                                          "n_python_procs")}
        if cached.get("loadavg_1m", 0.0) > 1.0 or \
                cached.get("n_python_procs", 1) > 2:
            print(f"# WARNING: cached torch baseline was measured on a "
                  f"loaded host ({ctx}); delete {BASELINE_CACHE} and "
                  f"re-measure on an idle machine", file=sys.stderr)
        return cached["torch_cpu_images_per_sec"]
    ctx = _host_load_context()
    if ctx["loadavg_1m"] > 1.0 or ctx["n_python_procs"] > 2:
        print(f"# WARNING: measuring torch baseline on a busy host {ctx}; "
              f"the result will under-state the reference (inflating "
              f"vs_baseline)", file=sys.stderr)
    try:
        v = measure_torch_baseline()
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"torch_cpu_images_per_sec": v, **ctx}, f)
        return v
    except Exception as e:  # reference import can fail in minimal envs
        print(f"# torch baseline unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)
        return float("nan")


# name → (measure_config kwargs, flops kwargs)
EXTRA_CONFIGS = {
    "clear_28_bf16": (dict(dtype="bf16"), dict()),
    # the trace-informed optimization (VERDICT r2 item 2): the four latent
    # heads + decoder dense folded into one [flat, 2z] matmul
    "clear_28_fusedheads": (dict(fused_heads=True), dict()),
    "vae64_clear": (dict(z_dim=64, size=64, in_ch=3, n_images=2048,
                         target_window_images=250_000),
                    dict(z_dim=64, size=64, in_ch=3)),
    # best measured 64px config (vae64 batch-scaling: bf16 B=256 beats the
    # parity B=128 row by ~13% — the pipeline config that dominates
    # experiment wall-clock, in perf mode)
    "vae64_bf16_b256": (dict(dtype="bf16", z_dim=64, size=64, in_ch=3,
                             batch=256, n_images=2048,
                             target_window_images=300_000),
                        dict(z_dim=64, size=64, in_ch=3, batch=256)),
    "clear_tc_28": (dict(kind="tc", target_window_images=1_000_000),
                    dict(variant="tc")),
    "clear_mim_28": (dict(kind="mim", target_window_images=800_000),
                     dict(variant="mim")),
    "perf_mode_b2048_bf16": (dict(dtype="bf16", batch=2048, n_images=8192,
                                  target_window_images=2_500_000),
                             dict(batch=2048)),
    # permute-once batch materialization A/B twin of the row above (the
    # b2048 trace attributes 41% of device time to the in-scan gathers;
    # scan_gather="permute_slice" replaces them with one bulk gather per
    # epoch — see train/steps.make_epoch_fn)
    "perf_mode_b2048_bf16_permute": (
        dict(dtype="bf16", batch=2048, n_images=8192,
             target_window_images=2_500_000, gather="permute_slice"),
        dict(batch=2048)),
    # best measured 28px config (round-3 scaling curve peak + fused heads)
    "perf_mode_b512_bf16_fusedheads": (
        dict(dtype="bf16", batch=512, fused_heads=True,
             target_window_images=2_000_000),
        dict(batch=512)),
    # round-5 best 28px: + scan unroll (4 scanned steps inlined per loop
    # iteration — same math up to float reassociation; +4.3% measured over
    # the unroll=1 twin, .runs/r5_unroll_ab.log / expr_output/perf/
    # unroll_ab_r5.json)
    "perf_mode_b512_bf16_fh_unroll4": (
        dict(dtype="bf16", batch=512, fused_heads=True, unroll=4,
             target_window_images=2_000_000),
        dict(batch=512)),
    # VERDICT r4 weak #1 formulation attempt: first conv as the 2×2-block
    # im2col matmul (models/layers.Conv1MXUPack — K 9→25, N 32→128 on the
    # MXU at 2.8× the conv1 FLOPs). A/B twins of the parity row and the
    # best-28px row; flops kwargs stay the REAL conv FLOPs so mfu stays
    # comparable (the extra pack FLOPs are overhead, not useful work).
    "clear_28_convpack": (
        dict(model_kwargs={"first_conv_pack": True}), dict()),
    "perf_mode_b512_bf16_fh_convpack": (
        dict(dtype="bf16", batch=512, fused_heads=True,
             model_kwargs={"first_conv_pack": True},
             target_window_images=2_000_000),
        dict(batch=512)),
}


def main():
    import jax.numpy as jnp

    from clearvae_tpu.utils.cache import enable_compilation_cache

    from clearvae_tpu.utils.lock import acquire_tpu_lock
    acquire_tpu_lock()  # explicit: not coupled to the cache call (VERDICT r4 #7)
    enable_compilation_cache()

    def _dtype(v):
        return jnp.bfloat16 if v == "bf16" else None

    flag_ips = measure_config()
    flag_flops = clear_vae_train_flops_per_image()
    configs = {"clear_28_f32": {
        "images_per_sec_per_chip": round(flag_ips, 1),
        "train_flops_per_image_analytic": round(flag_flops),
        "mfu": round(flag_ips * flag_flops / V5E_PEAK_FLOPS, 4),
    }}
    for name, (mkw, fkw) in EXTRA_CONFIGS.items():
        try:
            kw = dict(mkw)
            kw["dtype"] = _dtype(kw.get("dtype"))
            ips = measure_config(**kw)
            fl = clear_vae_train_flops_per_image(
                **{**fkw, "batch": kw.get("batch", BATCH)})
            configs[name] = {
                "images_per_sec_per_chip": round(ips, 1),
                "train_flops_per_image_analytic": round(fl),
                "mfu": round(ips * fl / V5E_PEAK_FLOPS, 4),
            }
        except Exception as e:
            print(f"# config {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            configs[name] = None

    base_ips = get_torch_baseline()
    vs = flag_ips / base_ips if np.isfinite(base_ips) else None
    # stamp the exact baseline (value + its measurement provenance) into the
    # output so every vs_baseline ratio is traceable to the denominator it
    # used (round-4 advisor finding: three bench runs silently divided by
    # three different cache values)
    try:
        with open(BASELINE_CACHE) as f:
            base_stamp = json.load(f)
    except Exception:
        base_stamp = {"torch_cpu_images_per_sec": base_ips}
    print(json.dumps({
        "metric": "styledmnist_clearvae_train_images_per_sec_per_chip",
        "value": round(flag_ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "baseline_used": base_stamp,
        "mfu": configs["clear_28_f32"]["mfu"],
        "peak_flops_assumed": V5E_PEAK_FLOPS,
        "configs": configs,
    }))


if __name__ == "__main__":
    main()
