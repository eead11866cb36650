"""Ray/primitive quadric-form coefficients — the computational core.

Every quantity the renderer needs from an anisotropic kernel primitive
(rotation R, scales s, center c) along a ray ``o + t d`` is a function of the
1-D Mahalanobis quadratic

    q(t) = a t^2 + 2 b t + c0,      with   M = R diag(s)^-2 R^T,
    a = d^T M d,   b = d^T M (o - c),   c0 = (o - c)^T M (o - c).

In particular (see :mod:`volprim_tpu.ops.kernels`):

- extent-ellipsoid intersection:  solve q(t) = extent^2
  (reference: ``ray_ellipsoid_intersection``, ``/root/reference/volprim/
  integrators/common.py:346-367``)
- Gaussian peak along the ray:    exp(-(c0 - b^2/a)/2) at t_peak = -b/a
  (reference: 3DGRT formula, ``volprim_rf.py:63-80``)
- Gaussian line integrals and inverse CDF (``common.py:173-243``)
- Epanechnikov segment integral (``common.py:287-324``)

The functions below are written component-wise over x/y/z so XLA fuses the
whole (ray-chunk × prim-chunk) evaluation into a single elementwise loop with
no ``[R, C, 3]`` intermediates. A feature-matrix (GEMM/MXU) formulation of the
same coefficients is provided for Pallas kernels via :func:`prim_features` /
:func:`ray_features`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import quaternion


class QuadricCoeffs(NamedTuple):
    """Per-(ray, primitive) quadratic coefficients, each shaped [R, C]."""

    a: jnp.ndarray
    b: jnp.ndarray
    c: jnp.ndarray


def ray_prim_coeffs(
    o: jnp.ndarray,
    d: jnp.ndarray,
    centers: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
) -> QuadricCoeffs:
    """Quadric coefficients for all (ray, primitive) pairs.

    Args:
      o, d: ray origins/directions ``[R, 3]`` (d need not be normalized; all
        formulas are exact for any parameterization of the line).
      centers, scales, quats: primitive SoA arrays ``[C, 3]``, ``[C, 3]``,
        ``[C, 4]`` (x,y,z,w quats).

    Returns:
      (a, b, c) each ``[R, C]``.
    """
    rot = quaternion.to_rotation_matrix(quats)  # [C, 3, 3], world <- local
    inv_s2 = 1.0 / (scales * scales)  # [C, 3]

    # Local-frame components: for axis i, w_i = sum_j R[j, i] d_j  (R^T d).
    # Unrolled so the broadcasted [R, C] products fuse without [R, C, 3]
    # temporaries.
    a = jnp.zeros((o.shape[0], centers.shape[0]), dtype=o.dtype)
    b = jnp.zeros_like(a)
    c = jnp.zeros_like(a)
    for i in range(3):
        r0 = rot[:, 0, i][None, :]  # [1, C]
        r1 = rot[:, 1, i][None, :]
        r2 = rot[:, 2, i][None, :]
        w_i = d[:, 0:1] * r0 + d[:, 1:2] * r1 + d[:, 2:3] * r2  # [R, C]
        p_i = (
            (o[:, 0:1] - centers[None, :, 0]) * r0
            + (o[:, 1:2] - centers[None, :, 1]) * r1
            + (o[:, 2:3] - centers[None, :, 2]) * r2
        )
        isi = inv_s2[None, :, i]
        a = a + w_i * w_i * isi
        b = b + w_i * p_i * isi
        c = c + p_i * p_i * isi
    return QuadricCoeffs(a, b, c)


def intersect_extent(
    coeffs: QuadricCoeffs, extent: float | jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Intersect rays with the extent-scaled bounding ellipsoids.

    Solves ``q(t) = extent^2``; uses the numerically stable form of the
    quadratic (the same "Ray Tracing Gems 2" robustness trick the reference
    uses at ``common.py:359-365``, expressed on the normalized coefficients).

    Returns (valid, t_near, t_far); ``valid`` requires a real intersection in
    front of the ray (t_far > 0).
    """
    a, b, c = coeffs
    e2 = extent * extent
    # Discriminant of a t^2 + 2 b t + (c - e2) = 0, scaled by 1/a^2:
    # (b/a)^2 - (c - e2)/a. Compute via the shifted form to limit cancellation:
    # q(t_peak) = c - b^2/a is the minimum of q; disc >= 0 iff q_min <= e2.
    q_min = c - (b * b) / a
    disc = (e2 - q_min) / a
    valid = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_peak = -b / a
    t_near = t_peak - sq
    t_far = t_peak + sq
    valid = valid & (t_far > 0.0)
    return valid, t_near, t_far


def pair_coeffs(
    o: jnp.ndarray,
    d: jnp.ndarray,
    centers: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
) -> QuadricCoeffs:
    """Quadric coefficients for *matched* (ray, primitive) pairs.

    All arguments broadcast over leading batch dims; last dim is 3 (or 4 for
    quats). Used after gathers, when each ray already has its own primitive
    records (e.g. the compositing scan or segment machinery).
    """
    rot = quaternion.to_rotation_matrix(quats)  # [..., 3, 3]
    rel = o - centers
    # precision=highest: these contraction dims are 3, so the MXU would run
    # them in bf16 by default and poison the Mahalanobis coefficients.
    hp = jax.lax.Precision.HIGHEST
    p_loc = jnp.einsum("...ji,...j->...i", rot, rel, precision=hp) / scales
    w_loc = jnp.einsum("...ji,...j->...i", rot, d, precision=hp) / scales
    a = jnp.sum(w_loc * w_loc, axis=-1)
    b = jnp.sum(w_loc * p_loc, axis=-1)
    c = jnp.sum(p_loc * p_loc, axis=-1)
    return QuadricCoeffs(a, b, c)


def pair_coeffs_gathered(
    o: jnp.ndarray,  # [R, 3]
    d: jnp.ndarray,  # [R, 3]
    centers: jnp.ndarray,  # [N, 3]
    scales: jnp.ndarray,  # [N, 3]
    quats: jnp.ndarray,  # [N, 4]
    ids: jnp.ndarray,  # [R, C] primitive ids per ray
) -> QuadricCoeffs:
    """Quadric coefficients for per-ray gathered primitive ids.

    Equivalent to ``pair_coeffs(o[:,None], d[:,None], centers[ids], ...)``
    but gathers one scalar column at a time: on TPU a gathered ``[R, C, 3]``
    array is laid out with the size-3 minor dimension padded to the 128-wide
    lane tile (a 42x memory expansion that OOMs at film scale); fifteen
    ``[R, C]`` gathers have no padding at all.
    """
    rot = quaternion.to_rotation_matrix(quats)  # [N, 3, 3]
    cx = centers[:, 0][ids]
    cy = centers[:, 1][ids]
    cz = centers[:, 2][ids]
    px_ = o[:, 0:1] - cx
    py_ = o[:, 1:2] - cy
    pz_ = o[:, 2:3] - cz
    a = jnp.zeros(ids.shape, o.dtype)
    b = jnp.zeros_like(a)
    c = jnp.zeros_like(a)
    for i in range(3):
        r0 = rot[:, 0, i][ids]
        r1 = rot[:, 1, i][ids]
        r2 = rot[:, 2, i][ids]
        inv_s = (1.0 / scales[:, i])[ids]
        w = (d[:, 0:1] * r0 + d[:, 1:2] * r1 + d[:, 2:3] * r2) * inv_s
        p = (px_ * r0 + py_ * r1 + pz_ * r2) * inv_s
        a = a + w * w
        b = b + w * p
        c = c + p * p
    return QuadricCoeffs(a, b, c)


# ----------------------------------------------------------------------------
# Feature-matrix (MXU) formulation, used by Pallas kernels.
# ----------------------------------------------------------------------------


def pair_coeffs_gemm(
    rayf: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],  # ray_features(o, d)
    pf: jnp.ndarray,  # [10, C] prim_features(...)
) -> QuadricCoeffs:
    """All-pairs quadric coefficients as three HIGHEST-precision GEMMs.

    The XLA twin of the fused kernels' in-VMEM coefficient GEMMs: on TPU
    the elementwise :func:`ray_prim_coeffs` broadcast costs ~45 VPU ops
    per (ray, primitive) pair, while ``[R, 10] x [10, C]`` rides the MXU.
    HIGHEST precision is required — the default bf16 passes explode the
    ``q_min = c - b^2/a`` cancellation (see the rf kernels, which pay the
    same 6-pass cost for the same reason).
    """
    fa, fb, fc = rayf
    hp = jax.lax.Precision.HIGHEST
    return QuadricCoeffs(
        jnp.matmul(fa, pf, precision=hp),
        jnp.matmul(fb, pf, precision=hp),
        jnp.matmul(fc, pf, precision=hp),
    )


def prim_features(
    centers: jnp.ndarray, scales: jnp.ndarray, quats: jnp.ndarray
) -> jnp.ndarray:
    """Pack primitives into a ``[10, C]`` feature matrix.

    Rows: (M11, M22, M33, 2*M12, 2*M13, 2*M23, (Mc)_x, (Mc)_y, (Mc)_z, c^T M c)
    where ``M = R diag(s)^-2 R^T``. Together with :func:`ray_features` the
    coefficient triple is recovered by three small GEMMs — this keeps the
    whole hot path on the MXU inside fused Pallas tiles.
    """
    rot = quaternion.to_rotation_matrix(quats)  # [C, 3, 3]
    inv_s2 = 1.0 / (scales * scales)
    # M = R diag(inv_s2) R^T
    m = jnp.einsum("cik,ck,cjk->cij", rot, inv_s2, rot)
    mc = jnp.einsum("cij,cj->ci", m, centers)
    cmc = jnp.einsum("ci,ci->c", centers, mc)
    feats = jnp.stack(
        [
            m[:, 0, 0],
            m[:, 1, 1],
            m[:, 2, 2],
            2.0 * m[:, 0, 1],
            2.0 * m[:, 0, 2],
            2.0 * m[:, 1, 2],
            mc[:, 0],
            mc[:, 1],
            mc[:, 2],
            cmc,
        ],
        axis=0,
    )
    return feats


def ray_features(o: jnp.ndarray, d: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Ray-side feature vectors for the GEMM path.

    Returns (fa ``[R, 10]``, fb ``[R, 10]``, fc ``[R, 10]``) such that with
    ``P = prim_features(...)``:  ``a = fa @ P``, ``b = fb @ P``, ``c = fc @ P``.
    """
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    zero = jnp.zeros_like(ox)
    one = jnp.ones_like(ox)
    # a = d^T M d
    fa = jnp.stack(
        [dx * dx, dy * dy, dz * dz, dx * dy, dx * dz, dy * dz, zero, zero, zero, zero],
        axis=-1,
    )
    # b = d^T M o - d^T (M c)
    fb = jnp.stack(
        [
            dx * ox,
            dy * oy,
            dz * oz,
            0.5 * (dx * oy + dy * ox),
            0.5 * (dx * oz + dz * ox),
            0.5 * (dy * oz + dz * oy),
            -dx,
            -dy,
            -dz,
            zero,
        ],
        axis=-1,
    )
    # c = o^T M o - 2 o^T (M c) + c^T M c
    fc = jnp.stack(
        [ox * ox, oy * oy, oz * oz, ox * oy, ox * oz, oy * oz, -2.0 * ox, -2.0 * oy, -2.0 * oz, one],
        axis=-1,
    )
    return fa, fb, fc
