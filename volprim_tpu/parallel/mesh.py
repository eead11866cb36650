"""Mesh sharding of ray wavefronts — the TPU scale-out axis.

The reference's only multi-view parallelism is the Mitsuba ``batch`` sensor
(one wide film for all cameras, examples/optimize_volume.py:167-177); its
only device parallelism is single-GPU SIMT (SURVEY.md §2.2). The TPU-native
equivalent implemented here:

- a 1-D ``data`` mesh over all chips (ICI),
- ray/pixel/camera wavefronts sharded along ``data`` (every integrator is a
  pure map over rays, so XLA partitions the whole pipeline and inserts the
  film-reduction collectives automatically from the sharding annotations),
- primitive parameters replicated; loss/grad reductions become ``psum``s
  inserted by XLA during jit partitioning.

Multi-host runs use the same code: ``jax.distributed.initialize()`` +
the global device mesh (DCN handled by the runtime).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    timeout_s: Optional[int] = None,
) -> bool:
    """Initialize the multi-host (DCN) runtime — ``jax.distributed``.

    The SURVEY §2.2 multi-host path: on a TPU pod slice each host runs
    this before any jax call; afterwards ``jax.devices()`` is the GLOBAL
    device list and :func:`data_mesh` spans all hosts (XLA routes the
    mesh collectives over ICI within a slice and DCN across slices — the
    sharding code does not change). On Cloud TPU all three arguments are
    discovered from the metadata server, so ``init_multihost()`` with no
    arguments is the common call; set them explicitly for GPU/CPU
    clusters (coordinator ``host:port``, world size, rank).

    Returns True when the distributed runtime was initialized (or already
    was), False when running single-process (no coordinator reachable /
    single-host environment) — callers proceed identically either way,
    which keeps the one-chip path dependency-free.
    """
    try:
        state = jax.distributed.global_state
        if getattr(state, "client", None) is not None:
            return True  # already initialized (idempotent)
    except Exception:  # pragma: no cover - very old jax
        pass
    kwargs = {}
    if timeout_s is not None:
        kwargs["initialization_timeout"] = timeout_s
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
        return True
    except Exception:
        # Single-process environment (no TPU metadata, no coordinator):
        # the 1-D mesh over local devices still works.
        return False


def data_mesh(devices=None, axis: str = "data") -> Mesh:
    """1-D mesh over all (or the given) devices. After
    :func:`init_multihost` on a pod slice this spans every host's chips
    (jax.devices() is global there)."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_rays(mesh: Optional[Mesh], *arrays, axis: str = "data"):
    """Constrain ray-batch arrays (leading axis = rays) to the data axis.
    No-op when mesh is None. Use inside jit; XLA propagates the sharding
    through the whole wavefront."""
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    out = tuple(
        jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))
        )
        for a in arrays
    )
    return out if len(out) > 1 else out[0]


def replicate(mesh: Optional[Mesh], tree):
    """Constrain a pytree (e.g. the primitive scene) to be replicated."""
    if mesh is None:
        return tree
    spec = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda a: jax.lax.with_sharding_constraint(a, spec), tree
    )


def sharded_grad_step(loss_fn, mesh: Optional[Mesh] = None):
    """jit a (params -> loss) gradient step with replicated params.

    With rays sharded inside ``loss_fn`` (via shard_rays / sharded render),
    XLA partitions the forward and backward wavefronts across the mesh and
    inserts the cross-chip grad reduction (the DP psum pattern) on its own.
    """

    @jax.jit
    def step(params, *args):
        loss, grads = jax.value_and_grad(loss_fn)(params, *args)
        if mesh is not None:
            grads = replicate(mesh, grads)
        return loss, grads

    return step
