"""Radiance cache + the radiosity-equation loss.

Rebuild of ``/root/reference/scripts/radiosity/radiance_cache.py``: a cache
object wrapping a scene (Gaussian splats, optional triangle meshes with
vertex BSDFs) plus an integrator, used directly as a radiance oracle for
arbitrary query rays (:209-266 — the reference calls
``integrator.sample(Primal, ...)`` outside any film/sensor machinery), with

- ``eval_Lo`` (:323-354): outgoing radiance at surface points, pathtraced
  toward the point from just off the surface;
- ``eval_Li_mat`` (:412-448): cosine-sampled incident radiance over the
  hemisphere, pre-divided by the sampling pdf;
- ``compute_loss`` (:585-698): the radiosity residual
  ``|| (Lo - Le) - (1/W) sum_i Li_i f(si, wi_i -> wo) ||^2`` with gradients
  flowing only into the *trainable* vertex BSDF attributes — the
  ``run.ipynb`` optimization driven by examples/fit_radiosity_bsdf.py.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..models import prb, rf
from ..ops import bsdf as bsdf_ops
from ..scene import mesh as mesh_mod
from ..scene.ellipsoids import EllipsoidScene, EllipsoidsFactory


def _inert_medium() -> EllipsoidScene:
    """A single zero-density primitive: prb requires a medium scene."""
    f = EllipsoidsFactory()
    f.add(mean=[0.0, 0.0, 0.0], scale=0.1, sigma_t=0.0, albedo=0.0)
    return f.build()


@dataclasses.dataclass
class RadianceCache:
    """Query incident/outgoing radiance of a scene along arbitrary rays.

    ``integrator='rf'`` wraps the 3DGS radiance-field oracle (round-1
    behavior); ``'prb'`` pathtraces, supporting meshes with ground-truth
    vertex BSDFs (the radiosity setup).
    """

    primitives: Optional[EllipsoidScene] = None
    cfg: object = None
    emitter: Optional[object] = None
    mesh: Optional[mesh_mod.TriangleMesh] = None
    bsdf: Optional[object] = None
    integrator: str = "rf"
    spp: int = 1

    def __post_init__(self):
        if self.cfg is None:
            self.cfg = (
                rf.RFConfig(max_depth=64)
                if self.integrator == "rf"
                else prb.PRBConfig(
                    max_overlaps=8, max_windows=2, bounce_cap=6,
                    chunk_size=64, cluster_size=8,
                )
            )
        if self.primitives is None:
            self.primitives = _inert_medium()

    def query(self, o: jnp.ndarray, d: jnp.ndarray, key=None) -> jnp.ndarray:
        """Radiance arriving at o from direction d (pathtrace oracle;
        radiance_cache.py:252-266)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        if self.integrator == "rf":
            return rf.radiance(
                self.primitives, self.emitter, o, d, self.cfg, key
            )
        out = 0.0
        for s in range(self.spp):
            out = out + prb.radiance(
                self.primitives, self.emitter, o, d, self.cfg,
                jax.random.fold_in(key, s), mesh=self.mesh, bsdf=self.bsdf,
            )
        return out / self.spp

    # ---- radiosity-equation terms (radiance_cache.py:317-448) -------------

    def eval_le(self, n_points: int) -> jnp.ndarray:
        """Surface emission — zero, like the reference (:317-321 TODO)."""
        return jnp.zeros((n_points, 3))

    def eval_lo(self, p, n, wo_local, key, offset: float = 1e-3):
        """Outgoing radiance at points p (normals n) in local directions
        wo_local: spawn along wo, trace back toward the point (:323-354)."""
        wo_world = bsdf_ops.to_world(n, wo_local)
        o = p + n * 1e-4 + wo_world * offset
        return self.query(o, -wo_world, key)

    def eval_li_mat(self, p, n, key, num_wi: int):
        """Cosine-sampled incident radiance, pre-divided by the pdf
        (:412-448). Returns (li_over_pdf [P, W, 3], wi_local [P, W, 3])."""
        k1, k2 = jax.random.split(key)
        pn = p.shape[0]
        u = jax.random.uniform(k1, (pn, num_wi))
        v = jax.random.uniform(k2, (pn, num_wi))
        r = jnp.sqrt(u)
        phi = 2.0 * jnp.pi * v
        wi_local = jnp.stack(
            [r * jnp.cos(phi), r * jnp.sin(phi), jnp.sqrt(1.0 - u)], axis=-1
        )
        pdf = jnp.maximum(wi_local[..., 2] / jnp.pi, 1e-6)
        wi_world = bsdf_ops.to_world(n[:, None, :], wi_local)
        o = jnp.broadcast_to((p + n * 1e-3)[:, None, :], wi_world.shape)
        li = self.query(
            o.reshape(-1, 3), wi_world.reshape(-1, 3),
            jax.random.fold_in(key, 7),
        ).reshape(pn, num_wi, 3)
        return li / pdf[..., None], wi_local

    # round-1 helper kept for the hemisphere-integration tests
    def incident_hemisphere(self, p, n, key, num_wi: int):
        li_w, wi = self.eval_li_mat(p, n, key, num_wi)
        # undo the 1/pdf weighting: Li alone, cosine-distributed
        pdf = jnp.maximum(wi[..., 2] / jnp.pi, 1e-6)
        return wi, li_w * pdf[..., None]


def compute_loss(
    cache: RadianceCache,
    train_mesh: mesh_mod.TriangleMesh,
    train_attrs: Dict[str, jnp.ndarray],
    train_bsdf,
    key,
    num_points: int = 64,
    num_wi: int = 64,
    num_wo: int = 1,
):
    """Radiosity residual over random surface points (:585-698).

    ``train_attrs`` maps vertex-attribute names to [V, k] arrays — the
    trainable parameters; everything queried from the cache is detached
    (the reference's ``dr.suspend_grad`` block).
    """
    k_pt, k_rest = jax.random.split(key)
    pts, normals, fid, bary, _ = mesh_mod.sample_surface(
        train_mesh, k_pt, num_points
    )
    pts = jax.lax.stop_gradient(pts)
    normals = jax.lax.stop_gradient(normals)

    # interpolate trainable attributes at the sampled points
    tm = mesh_mod.TriangleMesh(
        train_mesh.vertices, train_mesh.faces, train_attrs
    )
    attrs_pt = {}
    for name in train_bsdf.attr_names():
        v = tm.interpolate(name, fid, bary)
        attrs_pt[name] = v if v.shape[-1] > 1 else v[:, 0]

    k_li, k_wo = jax.random.split(k_rest)
    li_w, wi_local = cache.eval_li_mat(pts, normals, k_li, num_wi)
    li_w = jax.lax.stop_gradient(li_w)
    wi_local = jax.lax.stop_gradient(wi_local)

    loss = 0.0
    for j in range(num_wo):
        kj = jax.random.fold_in(k_wo, j)
        u = jax.random.uniform(kj, (num_points, 2))
        r = jnp.sqrt(u[:, 0])
        phi = 2.0 * jnp.pi * u[:, 1]
        wo_local = jnp.stack(
            [r * jnp.cos(phi), r * jnp.sin(phi),
             jnp.sqrt(jnp.maximum(1.0 - u[:, 0], 0.0))], axis=-1,
        )
        lo = jax.lax.stop_gradient(
            cache.eval_lo(pts, normals, wo_local, jax.random.fold_in(kj, 1))
        )
        lhs = lo - cache.eval_le(num_points)
        # reciprocity: eval with si.wi = wo and query direction wi
        # (compute_loss integrand, radiance_cache.py:664-668)
        wide = {
            k: jnp.repeat(v, num_wi, axis=0) for k, v in attrs_pt.items()
        }
        f = train_bsdf.eval(
            wide,
            jnp.repeat(wo_local, num_wi, axis=0),
            wi_local.reshape(-1, 3),
        ).reshape(num_points, num_wi, 3)
        rhs = jnp.mean(li_w * f, axis=1)
        loss = loss + 0.5 * jnp.mean(
            jnp.sum(jnp.square(lhs - rhs), axis=-1)
        ) / num_wo
    return loss
