"""Ray-tile cone culling — the TPU-native acceleration structure.

The reference leans on Embree/OptiX BVHs inside Mitsuba for every
``scene.ray_intersect`` (SURVEY.md §2.3). Pointer-chasing BVH traversal is a
poor fit for the VPU; instead, the camera-ray integrators exploit *ray
coherence*: the film is partitioned into pixel tiles, each tile's rays share
an origin and span a small cone, and primitives are culled per tile with a
cone/bounding-sphere test. This is the ray-traced analogue of 3DGS tile
rasterization and needs no tree build (refit per optimizer step is free —
the reference instead re-runs a C++ BVH refit on every params.update,
SURVEY.md §3.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tile_cones(o: jnp.ndarray, d: jnp.ndarray, tile_rays: int):
    """Bounding cones of consecutive ray tiles sharing one origin.

    Args:
      o, d: [R, 3] ray origins/directions (origins equal within each tile).
      tile_rays: rays per tile (R must be divisible).

    Returns (origins [T, 3], axes [T, 3], cos_half [T]).
    """
    r = o.shape[0]
    t = r // tile_rays
    dt = d.reshape(t, tile_rays, 3)
    axis = dt.mean(axis=1)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    cos_half = jnp.min(jnp.einsum("tri,ti->tr", dt, axis), axis=1)
    return o.reshape(t, tile_rays, 3)[:, 0], axis, jnp.clip(cos_half, -1.0, 1.0)


def cone_cull_keys(
    origin: jnp.ndarray,  # [3]
    axis: jnp.ndarray,  # [3]
    cos_half: jnp.ndarray,  # []
    centers: jnp.ndarray,  # [N, 3]
    radii: jnp.ndarray,  # [N]
) -> jnp.ndarray:
    """Depth keys for cone/bounding-sphere culling: view depth for
    intersecting primitives, +inf otherwise. Conservative (angular-sum
    test), written without transcendentals:

        theta <= half + rho
        <=> (half + rho >= pi) OR cos(theta) >= cos(half)cos(rho)
                                               - sin(half)sin(rho)
    """
    v = centers - origin
    dist2 = jnp.sum(v * v, axis=-1)
    dist = jnp.sqrt(dist2)
    safe = jnp.maximum(dist, 1e-8)
    cos_theta = (v @ axis) / safe
    sin_rho = jnp.clip(radii / safe, 0.0, 1.0)
    cos_rho = jnp.sqrt(jnp.maximum(1.0 - sin_rho * sin_rho, 0.0))
    ch = jnp.clip(cos_half, -1.0, 1.0)
    sh = jnp.sqrt(jnp.maximum(1.0 - ch * ch, 0.0))
    wraps = cos_rho <= -ch  # half + rho >= pi: cone covers everything
    inside = wraps | (cos_theta >= ch * cos_rho - sh * sin_rho)
    # cull spheres entirely behind the origin
    depth = v @ axis
    in_front = depth + radii > 1e-4
    # a sphere containing the origin always intersects
    contains = dist <= radii
    # radius < 0 marks inert padding/neutral slots: never hit (a zero-radius
    # point test would otherwise give padding centers a finite key whenever
    # a cone happens to contain them)
    hit = ((inside & in_front) | contains) & (radii >= 0.0)
    return jnp.where(hit, depth, jnp.inf)


def cone_cull_keys_batch(
    origin: jnp.ndarray,  # [3]
    axes: jnp.ndarray,  # [T, 3]
    cos_half: jnp.ndarray,  # [T]
    centers: jnp.ndarray,  # [N, 3]
    radii: jnp.ndarray,  # [N]
) -> jnp.ndarray:
    """:func:`cone_cull_keys` for T cones at once, without [T, N, 3]
    intermediates (vmapping the single-cone version materializes [T, N, 3]
    vectors, which the (8, 128) tile layout lane-pads 42x — measured
    ~25 ms/frame at [256 strips, 16k clusters]). All per-cluster terms are
    computed once as [N] columns; the only per-(cone, cluster) work is the
    depth GEMM [T, 3] x [3, N] and a few [T, N] column ops."""
    v = centers - origin  # [N, 3] (once, not per cone)
    dist = jnp.sqrt(jnp.sum(v * v, axis=-1))
    safe = jnp.maximum(dist, 1e-8)
    sin_rho = jnp.clip(radii / safe, 0.0, 1.0)
    cos_rho = jnp.sqrt(jnp.maximum(1.0 - sin_rho * sin_rho, 0.0))
    contains = dist <= radii
    depth = jax.lax.dot_general(
        axes, v, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )  # [T, N]
    cos_theta = depth / safe[None, :]
    ch = jnp.clip(cos_half, -1.0, 1.0)[:, None]
    sh = jnp.sqrt(jnp.maximum(1.0 - ch * ch, 0.0))
    wraps = cos_rho[None, :] <= -ch
    inside = wraps | (cos_theta >= ch * cos_rho[None, :] - sh * sin_rho[None, :])
    in_front = depth + radii[None, :] > 1e-4
    hit = ((inside & in_front) | contains[None, :]) & (radii[None, :] >= 0.0)
    return jnp.where(hit, depth, jnp.inf)


def shortlist(
    keys: jnp.ndarray, max_candidates: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Select the max_candidates nearest (by view depth) culled primitives.

    keys: [T, N] from cone_cull_keys. Returns (ids [T, S] depth-ascending,
    valid [T, S]). Overflow beyond S drops the farthest primitives (callers
    should size S generously; the rf compositor's beta-kill makes far
    primitives irrelevant anyway).
    """
    neg, ids = jax.lax.top_k(-keys, max_candidates)
    return ids.astype(jnp.int32), jnp.isfinite(-neg)


def shortlist_approx(
    keys: jnp.ndarray, max_candidates: int, recall: float = 0.95
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Like :func:`shortlist` but via ``lax.approx_max_k`` — the TPU-native
    partial top-k (SIMD bucketing instead of a full sort), ~recall 0.95.
    Used for the *coarse* culling stage, which over-collects anyway."""
    neg, ids = jax.lax.approx_max_k(
        -keys, max_candidates, recall_target=recall
    )
    order = jnp.argsort(-neg, axis=-1)  # approx_max_k returns unsorted-ish
    neg = jnp.take_along_axis(neg, order, axis=-1)
    ids = jnp.take_along_axis(ids, order, axis=-1)
    return ids.astype(jnp.int32), jnp.isfinite(-neg)


def cone_cull_keys_cols(
    origin: jnp.ndarray,  # [3]
    axis: jnp.ndarray,  # [..., 3] per-tile cone axes
    cos_half: jnp.ndarray,  # [...]
    cx: jnp.ndarray,  # [..., K] gathered sphere-center columns
    cy: jnp.ndarray,
    cz: jnp.ndarray,
    radii: jnp.ndarray,  # [..., K]
) -> jnp.ndarray:
    """:func:`cone_cull_keys` on pre-gathered center columns — used by the
    two-level cull, where each fine tile tests only its coarse parent's
    shortlist. Shapes broadcast: axis [..., 3] against columns [..., K]."""
    vx = cx - origin[0]
    vy = cy - origin[1]
    vz = cz - origin[2]
    dist2 = vx * vx + vy * vy + vz * vz
    dist = jnp.sqrt(dist2)
    safe = jnp.maximum(dist, 1e-8)
    depth = (
        vx * axis[..., 0:1] + vy * axis[..., 1:2] + vz * axis[..., 2:3]
    )
    cos_theta = depth / safe
    sin_rho = jnp.clip(radii / safe, 0.0, 1.0)
    cos_rho = jnp.sqrt(jnp.maximum(1.0 - sin_rho * sin_rho, 0.0))
    ch = jnp.clip(cos_half[..., None], -1.0, 1.0)
    sh = jnp.sqrt(jnp.maximum(1.0 - ch * ch, 0.0))
    wraps = cos_rho <= -ch
    inside = wraps | (cos_theta >= ch * cos_rho - sh * sin_rho)
    in_front = depth + radii > 1e-4
    contains = dist <= radii
    # r < 0 marks padding/neutral member slots (suprows convention): never
    # hit — without this, any cone containing a padding center (0,0,0) got a
    # finite key and composited garbage clusters at a fake depth.
    hit = ((inside & in_front) | contains) & (radii >= 0.0)
    return jnp.where(hit, depth, jnp.inf)
