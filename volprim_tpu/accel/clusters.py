"""Morton-ordered primitive clusters — the two-level culling hierarchy.

The per-tile shortlist selection must not scan all N primitives (a top-k
over [tiles, N] keys dominates the frame at truck scale). Instead the scene
is sorted once along a Morton curve and grouped into fixed-size clusters
with bounding spheres; tiles cull and depth-sort *clusters* (N/64 keys) and
expand the surviving clusters to contiguous primitive ranges. This is the
TPU-native stand-in for the reference's C++ BVH (SURVEY.md §2.3): flat,
fixed-shape, rebuilt in microseconds per optimizer step (the reference
refits its BVH on every ``params.update``, SURVEY.md §3.2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..scene.ellipsoids import EllipsoidScene


def _spread_bits_10(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x so there are two zero bits between each
    (standard Morton encoding step), int32."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton_codes(centers: jnp.ndarray, num_real: int | None = None) -> jnp.ndarray:
    """30-bit Morton codes from quantized positions [N, 3] -> [N] int32.

    ``num_real``: quantize against the bounding box of the first num_real
    rows only — inert padding primitives live far outside the scene and
    would otherwise collapse the quantization range (every real primitive
    would get the same code). Padding clamps to the max code and sorts last.
    """
    ref = centers if num_real is None else centers[:num_real]
    lo = jnp.min(ref, axis=0)
    hi = jnp.max(ref, axis=0)
    q = (centers - lo) / jnp.maximum(hi - lo, 1e-8)
    q = jnp.clip((q * 1023.0).astype(jnp.int32), 0, 1023)
    return (
        _spread_bits_10(q[:, 0])
        | (_spread_bits_10(q[:, 1]) << 1)
        | (_spread_bits_10(q[:, 2]) << 2)
    )


class ClusterIndex(NamedTuple):
    """Morton-sorted scene + cluster bounding spheres."""

    prims: EllipsoidScene  # primitives reordered along the Morton curve
    perm: jnp.ndarray  # [N] original index of each sorted primitive
    centers: jnp.ndarray  # [Ncl, 3] cluster bounding-sphere centers
    radii: jnp.ndarray  # [Ncl]
    cluster_size: int


def build_clusters(
    prims: EllipsoidScene,
    cluster_size: int = 64,
    num_real: int | None = None,
) -> ClusterIndex:
    """Sort primitives along the Morton curve and bound groups of
    ``cluster_size``. Requires num_prims to be a multiple of cluster_size
    (pad first with models.base.pad_primitives); pass the unpadded count as
    ``num_real`` so padding primitives neither distort the Morton
    quantization nor inflate the bounds of the (single, trailing) cluster
    they share with real primitives."""
    n = prims.num_prims
    assert n % cluster_size == 0, "pad primitives to a cluster multiple first"
    nr = n if num_real is None else num_real
    order = jnp.argsort(morton_codes(prims.centers, nr))
    sorted_prims = prims.select(order)
    n_cl = n // cluster_size
    real = (order < nr).reshape(n_cl, cluster_size)
    c = sorted_prims.centers.reshape(n_cl, cluster_size, 3)
    prim_r = prims.extent * jnp.max(sorted_prims.scales, axis=-1).reshape(
        n_cl, cluster_size
    )
    # masked mean/max so padding members don't blow up the bounds; clusters
    # with no real members get a far tiny bound (never culled in).
    cnt = jnp.maximum(jnp.sum(real, axis=1), 1)
    centers = jnp.sum(jnp.where(real[..., None], c, 0.0), axis=1) / cnt[:, None]
    dist = jnp.linalg.norm(c - centers[:, None, :], axis=-1) + prim_r
    radii = jnp.max(jnp.where(real, dist, 0.0), axis=1)
    empty = jnp.sum(real, axis=1) == 0
    centers = jnp.where(empty[:, None], 1e7, centers)
    radii = jnp.where(empty, 1e-3, radii)
    return ClusterIndex(sorted_prims, order, centers, radii, cluster_size)


def build_super_spheres(
    centers: jnp.ndarray,  # [Ncl, 3] cluster bounding-sphere centers
    radii: jnp.ndarray,  # [Ncl]
    group: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Bounding spheres of ``group`` consecutive (Morton-adjacent) clusters
    — the third level of the cull hierarchy. A strip-level top-k over
    [strips, Ncl] keys is selection-bound at truck scale (lax.approx_max_k
    on [256, 16k] measured ~25 ms/frame); culling Ncl/group superclusters
    first cuts the selection width by ``group``. Far/empty padding clusters
    (centers ~1e7, see :func:`build_clusters`) only meet other padding in a
    super (Morton order puts them last), and a super with no near member
    gets the same far/tiny never-culled-in bound."""
    ncl = centers.shape[0]
    nsup = -(-ncl // group)
    pad = nsup * group - ncl
    c = jnp.pad(centers, ((0, pad), (0, 0)), constant_values=1e7)
    r = jnp.pad(radii, (0, pad), constant_values=1e-3)
    cg = c.reshape(nsup, group, 3)
    rg = r.reshape(nsup, group)
    near = jnp.max(jnp.abs(cg), axis=-1) < 1e6
    cnt = jnp.maximum(jnp.sum(near, axis=1), 1)
    sc = jnp.sum(jnp.where(near[..., None], cg, 0.0), axis=1) / cnt[:, None]
    dist = jnp.linalg.norm(cg - sc[:, None, :], axis=-1) + rg
    sr = jnp.max(jnp.where(near, dist, 0.0), axis=1)
    empty = jnp.sum(near, axis=1) == 0
    sc = jnp.where(empty[:, None], 1e7, sc)
    sr = jnp.where(empty, 1e-3, sr)
    return sc, sr


def expand_cluster_ids(
    cluster_ids: jnp.ndarray, cluster_valid: jnp.ndarray, cluster_size: int
):
    """[T, K] cluster shortlist -> ([T, K*cs] primitive ids, valid) into the
    Morton-sorted arrays (clusters are contiguous ranges)."""
    t, k = cluster_ids.shape
    offs = jnp.arange(cluster_size, dtype=cluster_ids.dtype)
    ids = (cluster_ids[..., None] * cluster_size + offs).reshape(t, k * cluster_size)
    valid = jnp.broadcast_to(
        cluster_valid[..., None], (t, k, cluster_size)
    ).reshape(t, k * cluster_size)
    return ids, valid
