"""Test configuration: force a CPU backend with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# The persistent XLA compile cache is UNSAFE under suite memory pressure:
# round 4 segfaulted 2/2 in the WRITE path (put_executable_and_time);
# round-5 repros crashed in the READ path too (get_executable_and_time,
# deserializing the large radiosity executable at test_tooling.py:178 —
# even from a freshly-written same-host entry). The same test passes
# alone. Run the suite with NO persistent cache at all; the cold
# monolithic suite measured ~27 min. Must be set BEFORE volprim_tpu is
# first imported (this conftest runs at collection start, so it is).
os.environ.setdefault("VOLPRIM_TPU_NO_COMPILE_CACHE", "1")

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

# The environment may pin JAX_PLATFORMS to a TPU plugin; override in-process.
jax.config.update("jax_platforms", "cpu")

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_suite_rss():
    """Free each module's compiled executables when it finishes.

    The monolithic suite accumulates every module's jitted executables in
    one process (~6.4 GB RSS by test_tooling), and the big radiosity graph
    then segfaults NATIVELY — reproduced in three different code paths as
    the memory pressure moved: the persistent-cache write
    (put_executable_and_time, round-4 judge 2/2), the cache read
    (get_executable_and_time), and finally plain backend_compile_and_load
    with the cache fully disabled. The same test passes alone in every
    case. Clearing jax's executable caches per module keeps peak RSS near
    the largest single module instead of the sum of all of them."""
    yield
    jax.clear_caches()
    gc.collect()
