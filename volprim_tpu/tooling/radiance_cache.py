"""Radiance cache over a primitive scene.

Rebuild of the core of ``/root/reference/scripts/radiosity/
radiance_cache.py``: a cache object wrapping a Gaussian-splat scene plus an
rf integrator instance, used directly as a radiance oracle for arbitrary
query rays (:209-266 — the reference calls ``integrator.sample(Primal, ...)``
outside any film/sensor machinery), with hemisphere sampling helpers for
radiosity-style losses (:585-698).

The reference's "phantom geometry" trick and vertex-BSDF optimization
harness depend on mesh surfaces, which the TPU build does not support yet
(SURVEY.md §2.3 marks surface BSDFs post-v0); the query-oracle and
hemisphere-integration capabilities are provided here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import rf
from ..scene.ellipsoids import EllipsoidScene


@dataclasses.dataclass
class RadianceCache:
    """Query incident/outgoing radiance of a 3DGS scene along rays."""

    primitives: EllipsoidScene
    cfg: rf.RFConfig = dataclasses.field(
        default_factory=lambda: rf.RFConfig(max_depth=64)
    )
    emitter: Optional[object] = None

    def query(self, o: jnp.ndarray, d: jnp.ndarray, key=None) -> jnp.ndarray:
        """Radiance arriving at o from direction d (pathtrace oracle;
        radiance_cache.py:252-266)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        return rf.radiance(self.primitives, self.emitter, o, d, self.cfg, key)

    def incident_hemisphere(
        self, p: jnp.ndarray, n: jnp.ndarray, key, num_wi: int
    ):
        """Cosine-sampled incident radiance over the hemisphere at surface
        points p with normals n (the eval_Li step of compute_loss,
        radiance_cache.py:636-669).

        Returns (wi [P, W, 3], Li [P, W, 3]); the cosine pdf cancels the
        cosine foreshortening, so mean(Li) * pi estimates the irradiance.
        """
        kp = jax.random.split(key, 2)
        u = jax.random.uniform(kp[0], p.shape[:-1] + (num_wi,))
        v = jax.random.uniform(kp[1], p.shape[:-1] + (num_wi,))
        r = jnp.sqrt(u)
        phi = 2.0 * jnp.pi * v
        local = jnp.stack(
            [r * jnp.cos(phi), r * jnp.sin(phi), jnp.sqrt(1.0 - u)], axis=-1
        )
        wi = _to_frame(n[..., None, :], local)
        p_rep = jnp.broadcast_to(p[..., None, :], wi.shape)
        offset = p_rep + n[..., None, :] * 1e-3
        li = self.query(
            offset.reshape(-1, 3), wi.reshape(-1, 3)
        ).reshape(wi.shape)
        return wi, li


def _to_frame(n: jnp.ndarray, local: jnp.ndarray) -> jnp.ndarray:
    nz = n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + sign * n[..., 0] ** 2 * a, sign * b, -sign * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, sign + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return local[..., 0:1] * t + local[..., 1:2] * bt + local[..., 2:3] * n
