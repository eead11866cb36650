"""Spherical-harmonics fitting via spherical quadrature.

Rebuild of ``/root/reference/scripts/radiosity/sh_utils.py``: composite-
Simpson quadrature over the sphere with the Jacobian folded into the weights
(sh_utils.py:65-91), SH basis evaluation on the quadrature grid
(:93-194), and coefficient fitting / reconstruction for scalar and color
functions (:196-252). The SH basis itself lives in volprim_tpu.ops.sh.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import sh


def composite_simpson(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Nodes/weights of the composite Simpson rule on [0, 1] with n points
    (n odd >= 3; mirrors mi.quad.composite_simpson semantics)."""
    assert n >= 3 and n % 2 == 1, "composite Simpson needs an odd point count"
    x = np.linspace(0.0, 1.0, n)
    h = 1.0 / (n - 1)
    w = np.ones(n)
    w[1:-1:2] = 4.0
    w[2:-1:2] = 2.0
    w *= h / 3.0
    return x, w


def spherical_quadrature(res: int = 31):
    """Product quadrature over the sphere.

    Returns (directions [M, 3], weights [M]) such that
    sum(w_i f(d_i)) ~ integral of f over the sphere (solid-angle measure);
    the sin(theta) Jacobian is folded into the weights (sh_utils.py:65-91).
    """
    xt, wt = composite_simpson(res)
    xp, wp = composite_simpson(2 * res - 1)
    theta = xt * np.pi
    phi = xp * 2.0 * np.pi
    tg, pg = np.meshgrid(theta, phi, indexing="ij")
    st = np.sin(tg)
    d = np.stack(
        [st * np.sin(pg), np.cos(tg), -st * np.cos(pg)], axis=-1
    ).reshape(-1, 3)
    w = (wt[:, None] * np.pi) * (wp[None, :] * 2.0 * np.pi) * st
    return jnp.asarray(d, jnp.float32), jnp.asarray(w.reshape(-1), jnp.float32)


def fit_sh(fn, degree: int = 3, res: int = 31) -> jnp.ndarray:
    """Project a spherical function onto the real SH basis.

    Args:
      fn: callable mapping directions [M, 3] -> values [M] or [M, C].
      degree: max SH degree (coefficient count (degree+1)^2).

    Returns coefficients [(degree+1)^2] or [(degree+1)^2, C].
    """
    d, w = spherical_quadrature(res)
    vals = fn(d)
    basis = sh.eval_basis(d, degree)  # [M, K]
    if vals.ndim == 1:
        return jnp.einsum("m,mk,m->k", w, basis, vals)
    return jnp.einsum("m,mk,mc->kc", w, basis, vals)


def eval_sh(coeffs: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Reconstruct the fitted function at directions d [..., 3]."""
    k = coeffs.shape[0]
    basis = sh.eval_basis(d, sh.degree_from_coeffs(k))
    if coeffs.ndim == 1:
        return basis @ coeffs
    return basis @ coeffs


def fit_sh_batched(fn, points: jnp.ndarray, degree: int = 3, res: int = 15,
                   ray_budget: int = 2**22) -> jnp.ndarray:
    """Fit per-point SH of a field ``fn(points, dirs) -> [P, M, C]`` in
    batches bounded by a total ray budget (the batching strategy of
    sh_fitting.py:90-191). Returns [P, K, C]."""
    d, w = spherical_quadrature(res)
    m = d.shape[0]
    basis = sh.eval_basis(d, degree)  # [M, K]
    batch = max(1, ray_budget // m)
    outs = []
    for i in range(0, points.shape[0], batch):
        pts = points[i:i + batch]
        vals = fn(pts, d)  # [P, M, C]
        outs.append(jnp.einsum("m,mk,pmc->pkc", w, basis, vals))
    return jnp.concatenate(outs, axis=0)


def fit_sh_on_mesh(
    cache,
    mesh,
    degree: int = 3,
    res: int = 15,
    ray_budget: int = 2**20,
    key=None,
    offset: float = 1e-3,
):
    """Per-vertex SH fit of a mesh's outgoing radiance — the reference's
    ``fit_sh_on_mesh_batched`` (sh_fitting.py:90-191): for every vertex,
    outgoing radiance Lo(v, d) is pathtraced from just off the surface back
    toward the vertex over a spherical quadrature in the shading frame, and
    projected onto the SH basis. Returns [V, K, 3] coefficients (store as
    ``vertex_Lo_coeffs`` attributes like the reference).
    """
    import jax

    from ..ops import bsdf as bsdf_ops

    key = key if key is not None else jax.random.PRNGKey(0)
    verts = mesh.vertices
    normals = mesh.vertex_normals()

    def lo_field(pts_idx, d_local):
        p = verts[pts_idx]
        n = normals[pts_idx]
        m = d_local.shape[0]
        pn = p.shape[0]
        d_world = bsdf_ops.to_world(
            n[:, None, :], jnp.broadcast_to(d_local[None], (pn, m, 3))
        )
        o = (p + n * offset)[:, None, :] + d_world * offset
        li = cache.query(
            o.reshape(-1, 3), (-d_world).reshape(-1, 3), key
        )
        return li.reshape(pn, m, 3)

    idx = jnp.arange(verts.shape[0])
    return fit_sh_batched(
        lambda pts, d: lo_field(pts, d), idx, degree=degree, res=res,
        ray_budget=ray_budget,
    )
