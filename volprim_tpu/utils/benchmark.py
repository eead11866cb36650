"""Benchmark harness: trace/compile vs execute split, Mrays/sec.

TPU equivalent of the reference's Dr.Jit KernelHistory protocol
(``/root/reference/volprim/benchmark.py:18-201``), which separates
jitting / codegen / backend-compile / execution. Here:

- *trace + compile* time via AOT ``jax.jit(fn).lower(args).compile()``
  (one number: XLA has no user-visible codegen/backend split),
- *execution* time via timed ``block_until_ready()`` runs,
- mean ± std over ``nb_runs`` (reference default 4, benchmark.py:21),
- cold-cache behaviour: each ``measure`` call lowers a fresh jit wrapper, so
  compile time is re-measured per call (XLA's persistent compilation cache
  is not used on this path).
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Callable

import jax
import numpy as np


@dataclass
class BenchResult:
    label: str
    compile_ms: float
    execute_ms_mean: float
    execute_ms_std: float
    runs: list = field(default_factory=list)

    def mrays_per_sec(self, num_rays: int) -> float:
        return num_rays / (self.execute_ms_mean * 1e-3) / 1e6

    def __repr__(self):
        return (
            f"BenchResult[{self.label}: compile {self.compile_ms:.1f} ms, "
            f"execute {self.execute_ms_mean:.2f} +/- {self.execute_ms_std:.2f} ms]"
        )


def _block(tree):
    return jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        tree,
    )


def measure(
    fn: Callable,
    *args,
    label: str = "",
    nb_runs: int = 4,
    nb_dry_runs: int = 1,
    static_argnums=(),
    log: bool = True,
    **kwargs,
) -> BenchResult:
    """Benchmark ``fn(*args, **kwargs)`` with compile/execute separation."""
    jfn = jax.jit(fn, static_argnums=static_argnums)

    t0 = time.perf_counter()
    lowered = jfn.lower(*args, **kwargs)
    compiled = lowered.compile()
    compile_ms = (time.perf_counter() - t0) * 1e3

    # AOT-compiled callables take only the *traced* arguments — static ones
    # were baked in at lower() time and must be dropped from the call.
    if static_argnums:
        static = set(static_argnums)
        args = tuple(a for i, a in enumerate(args) if i not in static)

    for _ in range(nb_dry_runs):
        _block(compiled(*args, **kwargs))

    runs = []
    for _ in range(nb_runs):
        t0 = time.perf_counter()
        out = _block(compiled(*args, **kwargs))
        runs.append((time.perf_counter() - t0) * 1e3)
    del out

    result = BenchResult(
        label=label,
        compile_ms=compile_ms,
        execute_ms_mean=float(np.mean(runs)),
        execute_ms_std=float(np.std(runs)),
        runs=runs,
    )
    if log:
        print(result)
    return result


@contextmanager
def single_run(label: str = ""):
    """Context-manager timing of one (unsplit) run — reference
    ``benchmark.single_run`` (benchmark.py:203-259). Synchronizes via a
    trivial device fetch on exit."""
    t0 = time.perf_counter()
    yield
    jax.device_get(jax.numpy.zeros(()))  # drain the async dispatch queue
    dt = (time.perf_counter() - t0) * 1e3
    print(f"{label}: {dt:.1f} ms")
