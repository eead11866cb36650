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


def data_mesh(devices=None, axis: str = "data") -> Mesh:
    """1-D mesh over all (or the given) devices."""
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
