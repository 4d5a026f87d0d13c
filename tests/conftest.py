"""Test configuration: force an 8-device CPU mesh before jax initializes.

Multi-chip sharding tests run on virtual CPU devices
(`--xla_force_host_platform_device_count=8`), per SURVEY.md §4.

NOTE: in this environment the `axon` TPU plugin ignores the JAX_PLATFORMS
env var, so we must also set the config flag after importing jax (before any
backend is initialized).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
