"""KL-annealing schedules as pure functions of the step counter.

The reference's ``LogisticAnnealer`` is stateful and stepped per batch
(reference: code/src/trainer.py:22-38); here the step lives in the TrainState
and the weight is a pure traced function, so the whole schedule stays inside
the jitted train step.
"""

from __future__ import annotations

import jax.numpy as jnp


def logistic_anneal(step, *, beta: float, loc: float = 0.0, scale: float = 1.0):
    """beta / (1 + exp(-(step - loc)/scale)) — reference trainer.py:32-34."""
    step = jnp.asarray(step, jnp.float32)
    return beta / (1.0 + jnp.exp(-(step - loc) / scale))
