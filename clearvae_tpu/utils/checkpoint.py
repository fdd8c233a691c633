"""Checkpoint / resume via Orbax.

The reference has NO checkpointing at all (no torch.save/state_dict anywhere;
SURVEY §5) — this is a new capability. Format: one Orbax checkpoint per step
containing the full TrainState pytree (params, batch_stats, both optimizer
states, step counter) plus a JSON metadata blob with the config, so a
training run is resumable mid-experiment.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(directory: str, state, step: int | None = None,
                    metadata: dict | None = None) -> str:
    """Save a TrainState; returns the checkpoint path."""
    directory = os.path.abspath(directory)
    step = int(state.step) if step is None else step
    path = os.path.join(directory, f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
    ckptr.wait_until_finished()
    if metadata is not None:
        with open(os.path.join(directory, f"step_{step:08d}.meta.json"),
                  "w") as f:
            json.dump(metadata, f, indent=2, default=str)
    return path


def latest_checkpoint(directory: str) -> str | None:
    if not os.path.isdir(directory):
        return None
    steps = sorted(d for d in os.listdir(directory)
                   if d.startswith("step_") and not d.endswith(".json"))
    return os.path.join(directory, steps[-1]) if steps else None


def restore_checkpoint(path: str, target) -> Any:
    """Restore into a TrainState template (same pytree structure)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=jax.tree.map(np.asarray, target))
