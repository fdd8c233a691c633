"""Trace-backed MFU/op-time breakdown for the training step (VERDICT r2
item 2: attribute step time from a real profiler trace, not an inference).

Captures a jax.profiler trace of the scanned CLEAR-VAE training program
(same multi-epoch fused program bench.py times), converts it with xprof's
framework_op_stats tool, groups device self-time into op categories
(conv fwd/bwd, BatchNorm, matmul/dense, contrastive, elementwise, ...),
and prints a markdown table for BASELINE.md.

Usage:
  python scripts/analyze_trace.py                      # capture + analyze
  python scripts/analyze_trace.py --trace-dir DIR      # analyze existing
  python scripts/analyze_trace.py --batch 2048 --dtype bf16
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

# package: scripts/ is sys.path[0], so add the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


CATEGORIES = [
    # (name, predicate over (type, operation) lowercased).  NB the conv
    # predicate must not swallow type "convert" (dtype casts — abundant in
    # bf16 traces) via the "conv" substring; casts belong to elementwise.
    ("conv", lambda t, o: ("conv" in t and t != "convert")
        or "convolution" in o),
    ("batchnorm", lambda t, o: "batchnorm" in o or "batch_norm" in o
        or "/bn" in o),
    ("dense/matmul", lambda t, o: "dot" in t or "dot_general" in o
        or "einsum" in o),
    ("contrastive [B,B]", lambda t, o: "contrastive" in o or "snn" in o
        or "pairwise" in o or "logsumexp" in o),
    ("optimizer", lambda t, o: "adam" in o or "apply_updates" in o
        or "optax" in o),
    ("data gather/transpose", lambda t, o: t in ("gather", "scatter",
                                                 "transpose", "copy")
        or "gather" in o or "transpose" in o),
    ("reduce", lambda t, o: "reduce" in t),
    ("elementwise/fusion", lambda t, o: t in ("fusion", "add", "multiply",
                                              "subtract", "divide", "tanh",
                                              "logistic", "exponential",
                                              "rsqrt", "power", "maximum",
                                              "select", "compare", "convert")),
]


def categorize(typ: str, op: str) -> str:
    t, o = (typ or "").lower(), (op or "").lower()
    for name, pred in CATEGORIES:
        if pred(t, o):
            return name
    return "other"


def capture(args) -> str:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clearvae_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import bench

    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    model, state, step = bench._make_state_and_step(
        args.kind, dtype, args.z_dim, args.size, args.in_ch)
    from clearvae_tpu.train.steps import make_multi_epoch_fn

    epoch_fn = make_multi_epoch_fn(step.core)
    n = max(args.batch * 8, 2048)
    rs = np.random.RandomState(0)
    data = jnp.asarray(rs.rand(n, args.size, args.size, args.in_ch),
                       jnp.float32)
    lbl = jnp.asarray(rs.randint(0, 10, n))
    nb = n // args.batch
    blocks = max(1, args.steps // nb)
    bi = jnp.asarray(np.stack([
        rs.permutation(n)[: nb * args.batch].reshape(nb, args.batch)
        for _ in range(blocks)]))
    state, m = epoch_fn(state, data, lbl, bi, jax.random.key(0))
    np.asarray(m["loss"])  # warmup; device-get sync
    with jax.profiler.trace(args.trace_dir):
        state, m = epoch_fn(state, data, lbl, bi, jax.random.key(1))
        # DEVICE_GET before closing the trace: block_until_ready can return
        # early on axon with one program in flight, truncating the trace
        # (CLAUDE.md benchmark-sync invariant)
        np.asarray(m["loss"])
    print(f"# trace captured: {blocks * nb} steps of batch {args.batch}",
          file=sys.stderr)
    return args.trace_dir


def analyze(trace_dir: str):
    from xprof.convert import raw_to_tool_data as r

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    paths = [max(paths, key=os.path.getmtime)]  # latest run (by mtime)
    raw, _ = r.xspace_to_tool_data(paths, "framework_op_stats", {})
    out = json.loads(raw.decode() if isinstance(raw, bytes) else raw)
    tbl = out[0] if isinstance(out, list) else out
    cols = [c["id"] for c in tbl["cols"]]
    rows = []
    for row in tbl["rows"]:
        d = dict(zip(cols, [c["v"] for c in row["c"]]))
        if d.get("host_or_device") == "Device" and d.get("type") != "IDLE":
            rows.append(d)
    if not rows:
        raise SystemExit("no device rows in trace (CPU-only trace?)")

    total = sum(d["total_self_time"] for d in rows)
    cats: dict = {}
    for d in rows:
        c = categorize(d.get("type", ""), d.get("operation", ""))
        e = cats.setdefault(c, {"us": 0.0, "ops": []})
        e["us"] += d["total_self_time"]
        e["ops"].append((d["total_self_time"], d.get("operation", "")[:70]))

    print(f"device self-time total: {total:,.0f} us\n")
    print("| category | self-time % | top op |")
    print("|---|---|---|")
    for c, e in sorted(cats.items(), key=lambda kv: -kv[1]["us"]):
        top = max(e["ops"])[1]
        print(f"| {c} | {100 * e['us'] / total:.1f}% | `{top}` |")
    print("\ntop 15 device ops by self-time:")
    for d in sorted(rows, key=lambda d: -d["total_self_time"])[:15]:
        print(f"  {d['total_self_time']:>10,.0f} us  {d.get('type', ''):<14}"
              f" {str(d.get('operation', ''))[:80]}")
    return cats, total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace-dir", default="/tmp/clearvae-trace")
    p.add_argument("--analyze-only", action="store_true")
    p.add_argument("--kind", default="clear", choices=["clear", "tc", "mim"])
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--z_dim", type=int, default=16)
    p.add_argument("--size", type=int, default=28)
    p.add_argument("--in_ch", type=int, default=1)
    p.add_argument("--dtype", default=None, choices=[None, "bf16"])
    p.add_argument("--steps", type=int, default=512)
    args = p.parse_args()
    if not args.analyze_only:
        capture(args)
    analyze(args.trace_dir)


if __name__ == "__main__":
    main()
