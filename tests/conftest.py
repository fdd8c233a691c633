"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (SURVEY §4 plan, item e).

Note: this environment registers an experimental 'axon' TPU platform plugin
that ignores the JAX_PLATFORMS env var, so we must also set the config flag
after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
