"""Test configuration: force a CPU backend with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

# The environment may pin JAX_PLATFORMS to a TPU plugin; override in-process.
jax.config.update("jax_platforms", "cpu")
