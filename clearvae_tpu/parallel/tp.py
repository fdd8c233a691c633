"""Tensor parallelism: a 2-D (data, model) mesh with GSPMD-sharded weights.

The reference is strictly single-device (no counterpart; SURVEY §2.2), and
plain data parallelism (``clearvae_tpu.parallel.mesh``) is the right
configuration at reference model sizes. This module adds the second mesh
axis for the regime DP cannot reach: when the per-chip weight + optimizer
state of a scaled-up model (e.g. a VAE64 grown past 512 channels, or a
large downstream head) no longer fits HBM, its parameters shard over the
'model' axis and XLA's SPMD partitioner inserts the all-gathers /
reduce-scatters over ICI.

TPU-first design (the scaling-book recipe): no explicit collectives and no
changes to the step functions — we only *place* the TrainState leaves with
``NamedSharding`` according to a rule table and let GSPMD propagate:

- conv / conv-transpose kernels (HWIO, ndim 4) shard the output-channel dim,
- dense kernels (ndim 2) shard the output-feature dim,
- the matching 1-D vectors (bias, BN scale/bias, BN running mean/var) shard
  that same channel dim,
- anything indivisible by the axis size (e.g. the decoder's final
  in_channel=1 conv) stays replicated — GSPMD re-shards at the boundary.

Adam's mu/nu mirror the param tree, so one path-based walk over the whole
TrainState shards optimizer state identically to its parameters (the
ZeRO-style sharding that makes the memory win real).

Numerics are IDENTICAL to single-device (same reduction semantics, RNG via
partitionable threefry) — pinned by tests/test_parallel.py::test_tp_*.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey, GetAttrKey

from clearvae_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"

# leaf name → index of the dimension that carries (output) channels/features
_CHANNEL_DIM_BY_NDIM = {4: 3, 2: 1, 1: 0}
_SHARDABLE_NAMES = frozenset(
    {"kernel", "bias", "scale", "mean", "var", "embedding"})


def make_mesh2d(n_data: int, n_model: int, devices=None) -> Mesh:
    """(data, model) mesh over the first ``n_data * n_model`` devices.

    Raises (like ``make_mesh``) rather than silently truncating. The model
    axis is innermost so that, on real hardware, model-parallel collectives
    ride neighbouring ICI links.
    """
    if devices is None:
        devices = jax.devices()
    need = n_data * n_model
    if len(devices) < need:
        raise RuntimeError(
            f"make_mesh2d({n_data}, {n_model}) needs {need} devices but only "
            f"{len(devices)} are visible on backend "
            f"{jax.default_backend()!r}; force a virtual CPU mesh with "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={need}")
    dev = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(dev, (DATA_AXIS, MODEL_AXIS))


def _leaf_name(path) -> str:
    for key in reversed(path):
        if isinstance(key, DictKey):
            return str(key.key)
        if isinstance(key, GetAttrKey):
            return str(key.name)
    return ""


def param_spec(path, leaf, n_model: int) -> P:
    """PartitionSpec for one TrainState leaf under the rule table above."""
    name = _leaf_name(path)
    ndim = getattr(leaf, "ndim", None)
    if name not in _SHARDABLE_NAMES or ndim not in _CHANNEL_DIM_BY_NDIM:
        return P()
    dim = _CHANNEL_DIM_BY_NDIM[ndim]
    if leaf.shape[dim] % n_model != 0:
        return P()  # e.g. final decoder conv with in_channel=1 output
    spec = [None] * ndim
    spec[dim] = MODEL_AXIS
    return P(*spec)


def shard_state_tp(mesh: Mesh, state):
    """Place a TrainState on a (data, model) mesh with weights + optimizer
    state sharded over 'model' (one walk covers params, batch_stats and the
    Adam mu/nu mirrors; scalars like the step counter replicate)."""
    n_model = mesh.shape[MODEL_AXIS]

    def place(path, leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, param_spec(path, leaf, n_model)))

    return jax.tree_util.tree_map_with_path(place, state)
