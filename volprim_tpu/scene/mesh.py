"""Triangle-mesh surfaces — fixed-shape, chunked ray intersection.

The reference gets surfaces for free from Mitsuba shapes + Embree/OptiX
(``common.py:461-466`` intersects the full scene each march step;
``volprim_prb.py:262-282`` handles the BSDF vertex). The TPU equivalent is a
flat SoA mesh pytree with a chunked Möller–Trumbore wavefront test: the
radiosity scenes this unlocks (cornell-box class, ``scripts/radiosity``) are
a few hundred triangles, for which a masked [R, F] sweep on the VPU beats
any pointer-chasing BVH. Per-vertex attributes (normals, BSDF parameters)
are barycentrically interpolated at hits — the analogue of Mitsuba's
``eval_attribute_3("vertex_bsdf_*")`` (vertex_bsdf.py:8-22).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TriangleMesh:
    """Indexed triangle mesh with per-vertex attributes."""

    vertices: jnp.ndarray  # [V, 3] float32
    faces: jnp.ndarray  # [F, 3] int32
    attrs: Dict[str, jnp.ndarray] = dataclasses.field(default_factory=dict)

    @property
    def num_vertices(self) -> int:
        return self.vertices.shape[0]

    @property
    def num_faces(self) -> int:
        return self.faces.shape[0]

    def corners(self):
        """Returns (p0, p1, p2) each [F, 3]."""
        v = self.vertices
        f = self.faces
        return v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]

    def face_normals(self) -> jnp.ndarray:
        p0, p1, p2 = self.corners()
        n = jnp.cross(p1 - p0, p2 - p0)
        return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)

    def face_areas(self) -> jnp.ndarray:
        p0, p1, p2 = self.corners()
        return 0.5 * jnp.linalg.norm(jnp.cross(p1 - p0, p2 - p0), axis=-1)

    def vertex_normals(self) -> jnp.ndarray:
        """Area-weighted vertex normals [V, 3]."""
        p0, p1, p2 = self.corners()
        fn = jnp.cross(p1 - p0, p2 - p0)  # area-weighted
        vn = jnp.zeros_like(self.vertices)
        for k in range(3):
            vn = vn.at[self.faces[:, k]].add(fn)
        return vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)

    def interpolate(self, name: str, fid: jnp.ndarray, bary: jnp.ndarray):
        """Barycentric interpolation of a vertex attribute at hits.

        fid [R] face ids, bary [R, 2] = (u, v) with w = 1-u-v on vertex 0.
        Returns [R, k]. Mirrors ``mesh.eval_attribute_*`` (vertex_bsdf.py).
        """
        a = self.attrs[name]
        if a.ndim == 1:  # scalar-per-vertex attributes stored as [V]
            a = a[:, None]
        f = self.faces[fid]  # [R, 3]
        w = jnp.stack([1.0 - bary[:, 0] - bary[:, 1], bary[:, 0], bary[:, 1]], -1)
        return (
            a[f[:, 0]] * w[:, 0:1]
            + a[f[:, 1]] * w[:, 1:2]
            + a[f[:, 2]] * w[:, 2:3]
        )


def merge(meshes) -> TriangleMesh:
    """Concatenate meshes (attrs must share keys)."""
    off = 0
    vs, fs = [], []
    keys = set(meshes[0].attrs)
    attrs = {k: [] for k in keys}
    for m in meshes:
        assert set(m.attrs) == keys, "attribute keys differ"
        vs.append(m.vertices)
        fs.append(m.faces + off)
        off += m.num_vertices
        for k in keys:
            attrs[k].append(m.attrs[k])
    return TriangleMesh(
        vertices=jnp.concatenate(vs),
        faces=jnp.concatenate(fs),
        attrs={k: jnp.concatenate(v) for k, v in attrs.items()},
    )


_EPS = 1e-7


def intersect(
    mesh: Optional[TriangleMesh],
    o: jnp.ndarray,  # [R, 3]
    d: jnp.ndarray,  # [R, 3]
    t_min: float = 1e-4,
    t_max=jnp.inf,
    chunk: int = 512,
):
    """Nearest-hit Möller–Trumbore over all faces, chunked.

    Returns (valid [R], t [R] (inf on miss), fid [R], bary [R, 2]).
    """
    if mesh is None or mesh.num_faces == 0:
        r = o.shape[0]
        return (
            jnp.zeros((r,), bool),
            jnp.full((r,), jnp.inf, o.dtype),
            jnp.zeros((r,), jnp.int32),
            jnp.zeros((r, 2), o.dtype),
        )
    p0, p1, p2 = mesh.corners()
    f = mesh.num_faces
    c = min(chunk, f)
    n_pad = (-f) % c
    if n_pad:
        pad = jnp.zeros((n_pad, 3), p0.dtype)
        p0 = jnp.concatenate([p0, pad])
        p1 = jnp.concatenate([p1, pad])
        p2 = jnp.concatenate([p2, pad])
    n_chunks = p0.shape[0] // c
    e1 = (p1 - p0).reshape(n_chunks, c, 3)
    e2 = (p2 - p0).reshape(n_chunks, c, 3)
    p0c = p0.reshape(n_chunks, c, 3)
    real = (jnp.arange(n_chunks * c) < f).reshape(n_chunks, c)

    def body(carry, inp):
        best_t, best_fid, best_uv = carry
        ci, e1c, e2c, p0cc, is_real = inp
        # Möller–Trumbore, broadcast [R, C]
        h = jnp.cross(d[:, None, :], e2c[None, :, :])  # [R, C, 3]
        det = jnp.sum(e1c[None] * h, axis=-1)
        inv = jnp.where(jnp.abs(det) > _EPS, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
        s = o[:, None, :] - p0cc[None]
        u = jnp.sum(s * h, axis=-1) * inv
        q = jnp.cross(s, e1c[None])
        v = jnp.sum(d[:, None, :] * q, axis=-1) * inv
        t = jnp.sum(e2c[None] * q, axis=-1) * inv
        ok = (
            (jnp.abs(det) > _EPS)
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > t_min) & is_real[None, :]
        )
        tt = jnp.where(ok, t, jnp.inf)
        j = jnp.argmin(tt, axis=-1)  # [R]
        r_idx = jnp.arange(o.shape[0])
        t_c = tt[r_idx, j]
        closer = t_c < best_t
        best_t = jnp.where(closer, t_c, best_t)
        best_fid = jnp.where(closer, ci * c + j.astype(jnp.int32), best_fid)
        uv = jnp.stack([u[r_idx, j], v[r_idx, j]], axis=-1)
        best_uv = jnp.where(closer[:, None], uv, best_uv)
        return (best_t, best_fid, best_uv), None

    r = o.shape[0]
    init = (
        jnp.full((r,), jnp.inf, o.dtype),
        jnp.zeros((r,), jnp.int32),
        jnp.zeros((r, 2), o.dtype),
    )
    (t, fid, uv), _ = jax.lax.scan(
        body, init, (jnp.arange(n_chunks), e1, e2, p0c, real)
    )
    valid = jnp.isfinite(t) & (t < t_max)
    return valid, t, fid, uv


def occluded(
    mesh: Optional[TriangleMesh],
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_max=jnp.inf,
    t_min: float = 1e-4,
    chunk: int = 512,
) -> jnp.ndarray:
    """Shadow-ray test: any hit with t in (t_min, t_max). Any-hit scan (no
    nearest-hit bookkeeping) — this sits on prb's per-bounce NEE path."""
    if mesh is None or mesh.num_faces == 0:
        return jnp.zeros((o.shape[0],), bool)
    p0, p1, p2 = mesh.corners()
    f = mesh.num_faces
    c = min(chunk, f)
    n_pad = (-f) % c
    if n_pad:
        pad = jnp.zeros((n_pad, 3), p0.dtype)
        p0 = jnp.concatenate([p0, pad])
        p1 = jnp.concatenate([p1, pad])
        p2 = jnp.concatenate([p2, pad])
    n_chunks = p0.shape[0] // c
    e1 = (p1 - p0).reshape(n_chunks, c, 3)
    e2 = (p2 - p0).reshape(n_chunks, c, 3)
    p0c = p0.reshape(n_chunks, c, 3)
    real = (jnp.arange(n_chunks * c) < f).reshape(n_chunks, c)

    def body(any_hit, inp):
        e1c, e2c, p0cc, is_real = inp
        h = jnp.cross(d[:, None, :], e2c[None, :, :])
        det = jnp.sum(e1c[None] * h, axis=-1)
        inv = jnp.where(
            jnp.abs(det) > _EPS, 1.0 / jnp.where(det == 0, 1.0, det), 0.0
        )
        s = o[:, None, :] - p0cc[None]
        u = jnp.sum(s * h, axis=-1) * inv
        q = jnp.cross(s, e1c[None])
        v = jnp.sum(d[:, None, :] * q, axis=-1) * inv
        t = jnp.sum(e2c[None] * q, axis=-1) * inv
        ok = (
            (jnp.abs(det) > _EPS)
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > t_min) & (t < t_max) & is_real[None, :]
        )
        return any_hit | jnp.any(ok, axis=-1), None

    any_hit, _ = jax.lax.scan(
        body, jnp.zeros((o.shape[0],), bool), (e1, e2, p0c, real)
    )
    return any_hit


def sample_surface(mesh: TriangleMesh, key, n: int):
    """Area-weighted uniform surface samples (the radiosity surface
    sampler's 'equiarea' mode, surface_sampler.py:16-69).

    Returns (points [n,3], normals [n,3] (shading), fid [n], bary [n,2],
    pdf [n] = 1/total_area).
    """
    areas = mesh.face_areas()
    total = jnp.sum(areas)
    k1, k2 = jax.random.split(key)
    fid = jax.random.categorical(
        k1, jnp.log(jnp.maximum(areas, 1e-20)), shape=(n,)
    ).astype(jnp.int32)
    uv = jax.random.uniform(k2, (n, 2))
    su = jnp.sqrt(uv[:, 0])
    bary = jnp.stack([su * (1.0 - uv[:, 1]), su * uv[:, 1]], axis=-1)
    p0, p1, p2 = mesh.corners()
    pts = (
        p0[fid] * (1.0 - bary[:, 0] - bary[:, 1])[:, None]
        + p1[fid] * bary[:, 0:1]
        + p2[fid] * bary[:, 1:2]
    )
    vn = mesh.vertex_normals()
    tmp = TriangleMesh(mesh.vertices, mesh.faces, {"n": vn})
    normals = tmp.interpolate("n", fid, bary)
    normals = normals / jnp.maximum(
        jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12
    )
    pdf = jnp.full((n,), 1.0, pts.dtype) / total
    return pts, normals, fid, bary, pdf


# ---------------------------------------------------------------------------
# Builders
# ---------------------------------------------------------------------------


def make_rect(center, u_axis, v_axis, attrs=None) -> TriangleMesh:
    """Two-triangle rectangle: center +- u_axis +- v_axis."""
    c = np.asarray(center, np.float32)
    u = np.asarray(u_axis, np.float32)
    v = np.asarray(v_axis, np.float32)
    verts = np.stack([c - u - v, c + u - v, c + u + v, c - u + v])
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    a = {
        k: jnp.asarray(np.tile(np.asarray(val, np.float32), (4, 1)))
        for k, val in (attrs or {}).items()
    }
    return TriangleMesh(jnp.asarray(verts), jnp.asarray(faces), a)


def make_icosphere(center, radius: float, subdiv: int = 2, attrs=None):
    """Subdivided icosahedron (matches tooling/dataset.py's rig builder)."""
    t = (1.0 + 5.0**0.5) / 2.0
    verts = np.asarray(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    verts /= np.linalg.norm(verts, axis=-1, keepdims=True)
    faces = np.asarray(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    for _ in range(subdiv):
        mid = {}
        new_faces = []
        verts = list(map(np.asarray, verts))

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                m = verts[a] + verts[b]
                m /= np.linalg.norm(m)
                verts.append(m)
                mid[key] = len(verts) - 1
            return mid[key]

        for f in faces:
            a, b, c = int(f[0]), int(f[1]), int(f[2])
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        faces = np.asarray(new_faces, np.int64)
        verts = np.stack(verts)
    verts = verts * radius + np.asarray(center, np.float64)
    nv = verts.shape[0]
    a = {
        k: jnp.asarray(np.tile(np.asarray(val, np.float32), (nv, 1)))
        for k, val in (attrs or {}).items()
    }
    return TriangleMesh(
        jnp.asarray(verts.astype(np.float32)),
        jnp.asarray(faces.astype(np.int32)),
        a,
    )


def cornell_box(size: float = 1.0, attrs_by_wall=None) -> TriangleMesh:
    """Cornell-box-like open box (floor, ceiling, back, left red, right
    green), inward-facing normals, for integrator/radiosity tests."""
    s = size
    default = {
        "floor": {"base_color": [0.73, 0.73, 0.73]},
        "ceiling": {"base_color": [0.73, 0.73, 0.73]},
        "back": {"base_color": [0.73, 0.73, 0.73]},
        "left": {"base_color": [0.65, 0.05, 0.05]},
        "right": {"base_color": [0.12, 0.45, 0.15]},
    }
    spec = attrs_by_wall or default
    # rect normal = u x v; all normals point into the box interior
    walls = {
        "floor": ([0, -s, 0], [0, 0, s], [s, 0, 0]),
        "ceiling": ([0, s, 0], [s, 0, 0], [0, 0, s]),
        "back": ([0, 0, s], [0, s, 0], [s, 0, 0]),
        "left": ([-s, 0, 0], [0, s, 0], [0, 0, s]),
        "right": ([s, 0, 0], [0, 0, s], [0, s, 0]),
    }
    parts = []
    for name, (c, u, v) in walls.items():
        if name in spec:
            parts.append(make_rect(c, u, v, attrs=spec[name]))
    return merge(parts)
