"""Absorption-only tomography integrator.

Functional rebuild of the reference's ``volprim_tomography`` plugin
(``/root/reference/volprim/integrators/volprim_tomography.py``). The
reference marches primitive-to-primitive with a Dr.Jit megakernel,
multiplying ``beta *= exp(-sigma_t * integral_fullrange)`` per intersected
primitive (volprim_tomography.py:37-44,83-85) and adding ``beta * env`` when
the ray escapes (:103-107). Because the full-range Gaussian line integral is
used, the final transmittance is **order-independent**:

    beta = exp( - sum_{hit prims} sigma_t_j * D_j(ray) )

so on TPU the whole integrator collapses to a masked sum over primitives —
a perfectly regular wavefront reduction (chunked ``lax.scan`` with
rematerialization for O(chunk) backward memory), no marching, no BVH, and
the adjoint is exact XLA AD instead of the reference's PRB replay
(:87-101).

Semantics preserved exactly:
- a primitive contributes iff its extent-scaled bounding ellipsoid is
  entered in front of the ray origin (the BVH + backface-culling behaviour
  of :71-76; rays starting inside a primitive skip it),
- rays that intersect more than ``max_depth`` primitives produce zero
  radiance (the loop-exit behaviour of :118-125),
- ``hide_emitters`` blanks the environment for rays that hit nothing
  (:105-106).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from . import register_integrator
from ..ops import quadric
from ..ops.kernels import Kernel
from ..scene.ellipsoids import EllipsoidScene
from .base import pad_primitives


@dataclasses.dataclass(frozen=True)
class TomographyConfig:
    max_depth: int = 64  # -1 = unlimited (volprim_tomography.py:27-30)
    kernel_type: str = "gaussian"
    hide_emitters: bool = False
    chunk_size: int = 1024

    @property
    def kernel(self) -> Kernel:
        # Forced by the integrator (volprim_tomography.py:32-35).
        return Kernel(self.kernel_type, normalized=False, full_range=True)


@register_integrator("volprim_tomography")
def radiance(
    primitives: EllipsoidScene,
    emitter,
    o: jnp.ndarray,
    d: jnp.ndarray,
    cfg: TomographyConfig,
    key=None,
) -> jnp.ndarray:
    """Radiance for a wavefront of rays. o, d: [R, 3] -> [R, 3]."""
    del key  # deterministic given the rays
    primitives.require_attrs(["sigma_t"])
    kern = cfg.kernel
    prims = pad_primitives(primitives, cfg.chunk_size)
    n = prims.num_prims
    c = min(cfg.chunk_size, n)
    n_chunks = n // c

    centers = prims.centers.reshape(n_chunks, c, 3)
    scales = prims.scales.reshape(n_chunks, c, 3)
    quats = prims.quats.reshape(n_chunks, c, 4)
    sigma_t = prims.attrs["sigma_t"].reshape(n_chunks, c)
    real = (
        jnp.arange(n).reshape(n_chunks, c) < primitives.num_prims
    )  # mask out padding primitives

    @jax.checkpoint
    def chunk_tau(chunk):
        ctr, scl, qt, sig, is_real = chunk
        coeffs = quadric.ray_prim_coeffs(o, d, ctr, scl, qt)
        valid, t_near, _ = quadric.intersect_extent(coeffs, prims.extent)
        # BVH/backface-culling semantics: entry point must be in front.
        valid = valid & (t_near > 0.0) & is_real[None, :]
        s_prod = (scl[:, 0] * scl[:, 1] * scl[:, 2])[None, :]
        dens = kern.density_integral(
            coeffs, s_prod, scl[None, :, :], prims.extent, None, None, valid
        )
        tau = jnp.sum(dens * sig[None, :], axis=-1)
        count = jnp.sum(valid, axis=-1).astype(jnp.int32)
        return tau, count

    def body(carry, chunk):
        tau, count = carry
        dtau, dcount = chunk_tau(chunk)
        return (tau + dtau, count + dcount), None

    r = o.shape[0]
    init = (jnp.zeros((r,), o.dtype), jnp.zeros((r,), jnp.int32))
    (tau, count), _ = jax.lax.scan(
        body, init, (centers, scales, quats, sigma_t, real)
    )

    beta = jnp.exp(-tau)
    env = (
        emitter.eval(d)
        if emitter is not None
        else jnp.zeros(d.shape[:-1] + (3,), o.dtype)
    )
    live = (
        count <= cfg.max_depth if cfg.max_depth >= 0 else jnp.ones_like(count, bool)
    )
    if cfg.hide_emitters:
        live = live & (count > 0)
    return jnp.where(live[:, None], beta[:, None] * env, 0.0)
