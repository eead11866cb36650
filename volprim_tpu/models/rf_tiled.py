"""Tiled radiance-field renderer — the performance path for camera rays.

Same light transport as :mod:`volprim_tpu.models.rf` (3DGRT peak
transmittance + SH emission, reference ``volprim_rf.py:63-100,135-146``) but
architected like a TPU rasterizer instead of a ray marcher:

1. **per-scene preparation** (:func:`build_state`): primitives are Morton-
   sorted into bounded clusters and packed into feature tables (quadric
   feature matrix, SH table, opacities) — the analogue of the reference's
   C++ BVH build at scene load (SURVEY.md §2.3), re-run after each optimizer
   step like the reference's ``params.update`` BVH refit;
2. **per-frame culling**: the film is split into pixel tiles, each tile's
   rays share an origin and span a small cone; clusters are cone-culled and
   depth-sorted per tile, then expanded to primitive shortlists whose order
   is refined to per-primitive view depth (the 3DGS tile-rasterization
   ordering approximation — the reference's BVH march gives exact per-ray
   order; PSNR impact is validated in tests/test_rf_tiled.py);
3. **compositing**: each tile accumulates its shortlist front-to-back —
   the fused v3 Pallas kernel (``backend='fused'``: transposed blocks,
   in-kernel ray features, cancellation-free closest-approach q, custom
   VJP), the v1/v2 kernels, or a differentiable XLA pipeline
   (``backend='xla'``) with identical math.

Round-2 additions: two-level culling (``coarse_group``), residual-driven
tile refinement (``refine_fraction``), tile-axis sharding over a device
mesh (``render_state(mesh=...)``), and in-block per-primitive depth resort
for the fused path. This is the renderer bench.py measures; the exact-order
integrator remains available for parity checks and secondary rays.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..accel import clusters
from ..accel import tiles as tiling
from ..ops import quadric, sh
from ..ops import srgb_to_linear
from ..ops.kernels import Kernel
from ..scene.cameras import CameraSpecs
from ..scene.ellipsoids import EllipsoidScene


@dataclasses.dataclass(frozen=True)
class RFTiledConfig:
    max_depth: int = 64  # max composited primitives per ray
    kernel_type: str = "gaussian"
    srgb_primitives: bool = True
    tile_pixels: int = 1024  # rays per tile (e.g. 32x32)
    # Explicit (tile_h, tile_w) override: render_state factors tile_pixels
    # greedily from sqrt and can land on a shape that doesn't divide an odd
    # film — callers that computed divisors themselves pass them here.
    tile_shape: Optional[tuple] = None
    max_candidates: int = 4096  # culled shortlist size per tile
    segment: int = 256  # shortlist chunk per compositing step
    tile_group: int = 8  # tiles batched per map step (xla backend)
    beta_kill: float = 0.01  # rf:172-174
    use_clusters: bool = True  # two-level Morton-cluster culling
    cluster_size: int = 64
    # Skip remaining shortlist segments once every ray in the tile group is
    # saturated (beta < beta_kill). Uses lax.while_loop, which XLA cannot
    # reverse-differentiate — leave False for training, True for inference.
    early_exit: bool = False
    # 'xla' (any backend), 'pallas' (fused TPU kernel), 'pallas2'
    # (experimental: camera-relative features + in-kernel ray features/SH
    # basis, ~7% faster) or 'fused' (v3: camera-relative + cancellation-free
    # closest-approach q + in-kernel early exit + cluster-blocked gather
    # without the per-primitive depth resort — the inference/bench AND
    # training path: all four backends are differentiable (v3 via its own
    # custom-VJP backward kernel). Caution: pallas2
    # precomputes the constant quadric term c0, whose f32 rounding decouples
    # from the ray-side GEMMs — at extreme scale ratios (primitive scales
    # ~1e-3 of the scene) the q_min cancellation amplifies this into visible
    # pixel differences vs xla/pallas (which share identical rounding);
    # 'fused' eliminates that cancellation instead (composite3.py).
    backend: str = "xla"
    # Refine the cluster shortlist to exact per-primitive view depth (a
    # [T, S] sort + re-gather). None = backend default: on for
    # xla/pallas/pallas2 (parity with round-1 behavior), off for 'fused'
    # (clusters are compact and already depth-sorted; PSNR impact is
    # validated in tests/test_rf_tiled.py and the sort dominated the frame).
    prim_resort: Optional[bool] = None
    # Two-level culling: strips of `coarse_group` consecutive tiles first
    # cull the full cluster set with an approximate top-k (over-collecting
    # coarse_factor * the per-tile budget), then each tile cone-culls only
    # its strip's survivors. Avoids per-tile [T, Ncl] exact top-k (sort
    # bound) and lets small tiles (tighter cones -> better shortlists) stay
    # cheap. 0 disables (single-level exact top-k).
    coarse_group: int = 0
    coarse_factor: int = 4
    # Clusters per supercluster (third cull level): the strip-coarse stage
    # selects superclusters (Ncl/super_group keys) instead of clusters —
    # top-k over [strips, 16k] cluster keys was selection-bound (~25 ms).
    super_group: int = 16
    # Residual-driven tile refinement (fused backend): after the base pass,
    # the refine_fraction of tiles most likely truncated (full cluster list
    # AND rays left unsaturated at the end of it) are re-rendered with a
    # refine_factor-times-larger shortlist. Fixed shapes: the refined tile
    # count is static; tiles without truncation signal keep their base
    # result. 0.0 disables. Note: under a mesh the per-shard selection makes
    # sharded renders statistically (not bitwise) equal to single-device.
    refine_fraction: float = 0.0
    refine_factor: int = 4
    # Subtiles per Pallas program (fused backend): with small tiles
    # (tile_pixels <= 64) the film cuts into thousands of tiles and grid
    # sizes that large crash the remote compile helper; batching keeps the
    # grid near T / kernel_batch while each program walks its subtiles
    # sequentially (own shortlist + early exit each).
    kernel_batch: int = 1
    # Adaptive per-tile budgets (fused backend): tiles sorted by measured
    # need (finite cull keys) are split into static-fraction classes, each
    # rendered with its own cluster budget. ((frac, k_clusters), ...) with
    # fractions summing to 1, ascending budgets. Round-3 measurement: the
    # kernel walk is already need-proportional (per-tile dynamic trip
    # counts), but gather rows / relayouts / kernel DMA scale with the
    # STATIC budget — classes give the 90th-percentile tiles full coverage
    # (zero truncation -> exact-order-limited quality) while easy tiles
    # keep small gathers. Empty = single fixed budget (max_candidates).
    # Mutually exclusive with refine_fraction.
    budget_classes: tuple = ()
    # In-kernel column compaction (fused backend): the kernel drops
    # shortlist columns whose bounding sphere misses each subtile's ray
    # cone before the per-ray walk (exact: removed columns cannot hit any
    # ray). Cuts walked pairs by the intra-cluster miss fraction.
    kernel_compact: bool = False
    # Feature-major kernel tables (fused backend): pf/sh enter the kernel
    # as [F, T, S] (tile axis in the middle), built by a middle-axis
    # jnp.take of [F, Ncl, cs] tables. Removes the per-frame [16, N] ->
    # [Ncl, 16*cs] pack relayout AND the per-tile [Tb, K, 16, cs] ->
    # [Tb, 16, S] transposes (the two relayouts in the measured ~8 ms
    # XLA-side pack+gather stage). Same kernel math; new Mosaic variants.
    feat_major: bool = False
    # Pack-time intra-cluster depth sort (fused backend, needs
    # feat_major): each cluster's cs columns are ordered by distance to
    # the camera origin once per frame (a [Ncl, cs] argsort + one
    # last-axis permute of the pf/sh tables, shared by every tile) —
    # fixes the arbitrary Morton order WITHIN clusters that the
    # cluster-gather stream otherwise composites in. Measured (CPU,
    # xla-path probe vs exact): 31.16 -> 31.90 dB at 262k zero
    # truncation (full per-tile resort: 32.88), +0.2 dB at 2M. The
    # in-kernel compaction preserves stream order, so the sort survives
    # kernel_compact.
    cluster_sort: bool = False
    # Per-ray banded order correction (round-4 quality mode): composite
    # with the transmittance prefix CORRECTED by comparing each pair's
    # per-ray entry distance within a +-order_band window of the stream —
    # for stream positions i < j with t_entry[j] < t_entry[i], j's
    # (1 - alpha) moves from i's suffix into i's prefix and drops out of
    # j's. Exact (equals the fully per-ray-sorted composite) whenever
    # every inversion spans <= order_band stream slots; after
    # cluster_sort the residual inversions sit at cluster boundaries, so
    # a band of ~0.5-1x cluster_size captures most of them. Pure
    # elementwise compares/selects (no per-ray sort, no data-dependent
    # control flow); a [RT, band] tail carries comparisons across
    # segment boundaries. 0 disables. This is the per-ray route past the
    # shared-axis ordering ceiling (~31.1 dB at 262k / ~25.9 dB at 2M);
    # the reference composites every ray in exact depth order via its
    # BVH march (volprim_rf.py:124-146). Supported by the 'xla' backend
    # (plain-AD differentiable) and the 'fused' kernel (log-space
    # pltpu.roll form; differentiable — the backward kernel applies the
    # transposed band operator, test_order_band_fused_gradients_match_xla;
    # note training THROUGH the band converges worse than exact-trained,
    # tools/convergence_eval --band). With kernel_compact the band applies
    # to the compacted stream. NOTE (TPU cost): order_band > 0 is a NEW
    # Mosaic kernel variant per (class tile-count, S) pair — warm it
    # deliberately, never right before a driver bench.
    order_band: int = 0
    # Per-CLASS banding (round-5, r4 verdict #5: banding everywhere costs
    # ~3x because every tile pays it; the inversions the band fixes
    # concentrate in high-need tiles — exactly the tiles the high-budget
    # classes already own). When set, one entry per budget_classes entry;
    # each overrides order_band for that class (None = inherit). E.g.
    # with 4 classes, (0, 0, 0, 16) bands only the deepest-need class.
    # Banded classes are their own Mosaic variants — same warming
    # discipline as order_band.
    band_classes: tuple = ()

    @property
    def kernel(self) -> Kernel:
        return Kernel(self.kernel_type, normalized=True, full_range=True)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RFTiledState:
    """Per-scene render state (rebuild when primitive parameters change)."""

    prims: EllipsoidScene  # Morton-sorted (or original when not clustered)
    cull_centers: jnp.ndarray  # [Ncl or N, 3]
    cull_radii: jnp.ndarray  # [Ncl or N]
    feats16: jnp.ndarray  # [N, 16] quadric features (10 used)
    opac: jnp.ndarray  # [N]
    sh48: jnp.ndarray  # [N, 48] channel-major SH blocks of 16 (xla/pallas
    #                      backends gather this; the fused path uses shrows)
    # [Ncl, 3k*cs] bf16 cluster rows, each a feature-major [3k, cs] block
    # (k live coefficients x 3 channels): the fused path gathers these and
    # feeds the kernel the [T, 3k, S] rows layout (lanes = S, so no 48-wide
    # lane padding; a per-frame [..., :k] slice relayout of a 48-wide bf16
    # table cost ~14 ms/frame in-frame).
    shrows: jnp.ndarray = None
    sup_centers: jnp.ndarray = None  # [Nsup, 3] supercluster spheres
    sup_radii: jnp.ndarray = None  # [Nsup]
    # [Nsup + 1, 4*sg] cluster-sphere rows, each a feature-major [4, sg]
    # block (cx, cy, cz, r) of the sup's member clusters; trailing neutral
    # row has r = -1 (never hits). The two-level cull gathers these wide
    # rows instead of 4 scalar-column gathers (~5 ns/element -> ~5 ms/frame
    # at [256 strips, 1024 candidates]).
    suprows: jnp.ndarray = None
    extent: float = dataclasses.field(default=3.0, metadata=dict(static=True))
    clustered: bool = dataclasses.field(default=True, metadata=dict(static=True))
    cluster_size: int = dataclasses.field(default=64, metadata=dict(static=True))
    super_group: int = dataclasses.field(default=16, metadata=dict(static=True))


def build_state(primitives: EllipsoidScene, cfg: RFTiledConfig) -> RFTiledState:
    """Morton-sort, cluster and pack the scene for tiled rendering."""
    if cfg.use_clusters:
        from .base import pad_primitives

        index = clusters.build_clusters(
            pad_primitives(primitives, cfg.cluster_size), cfg.cluster_size,
            num_real=primitives.num_prims,
        )
        work = index.prims
        cull_centers, cull_radii = index.centers, index.radii
    else:
        work = primitives
        cull_centers = primitives.centers
        cull_radii = primitives.extent * jnp.max(primitives.scales, axis=-1)

    n = work.num_prims
    feats16 = (
        jnp.zeros((n, 16), jnp.float32)
        .at[:, :10]
        .set(quadric.prim_features(work.centers, work.scales, work.quats).T)
    )
    # neutral quadric for padded slots is installed at gather time
    sh_coeffs = work.sh_coeffs_3d()  # [N, K, 3]
    k = sh_coeffs.shape[1]
    sh48 = jnp.zeros((n, 48), jnp.float32)
    for ch in range(3):
        sh48 = sh48.at[:, ch * 16:ch * 16 + k].set(sh_coeffs[:, :, ch])
    if cfg.use_clusters:
        cs = cfg.cluster_size
        ncl = n // cs
        # Fused-kernel table: composite3's basis column 0 is exactly 1.0,
        # so the DC row stores Y00 * dc + 0.5 — the rf emission offset
        # (+0.5 per channel, rf.py parity) folds into the GEMM at no
        # bf16 precision cost and the kernel saves one add per
        # (ray, primitive, channel). composite3 applies NO offset itself.
        sh_fold = sh_coeffs.at[:, 0, :].set(
            sh_coeffs[:, 0, :] * 0.28209479177387814 + 0.5
        )
        shr = sh_fold.transpose(0, 2, 1).reshape(n, 3 * k)  # ch-major
        if getattr(cfg, "feat_major", False):
            # [3k, Ncl, cs]: a middle-axis take of this table yields the
            # kernel's [3k, Tb, S] blocks with no transpose relayout
            shrows = (
                shr.reshape(ncl, cs, 3 * k)
                .transpose(2, 0, 1)
                .astype(jnp.bfloat16)
            )
        else:
            shrows = (
                shr.reshape(ncl, cs, 3 * k)
                .transpose(0, 2, 1)
                .reshape(ncl, 3 * k * cs)
                .astype(jnp.bfloat16)
            )
    else:
        shrows = None
    sup_centers, sup_radii = clusters.build_super_spheres(
        cull_centers, cull_radii, cfg.super_group
    )
    sg = cfg.super_group
    nsup = sup_centers.shape[0]
    pad_cl = nsup * sg - cull_centers.shape[0]
    def _col(x, fill):
        x = jnp.pad(x, (0, pad_cl), constant_values=fill)
        return x.reshape(nsup, sg)
    suprows = jnp.concatenate(
        [
            _col(cull_centers[:, 0], 0.0), _col(cull_centers[:, 1], 0.0),
            _col(cull_centers[:, 2], 0.0), _col(cull_radii, -1.0),
        ],
        axis=1,
    )  # [Nsup, 4*sg], feature-major [4, sg] blocks
    suprows = jnp.concatenate(
        [
            suprows,
            jnp.zeros((1, 4 * sg)).at[0, 3 * sg:].set(-1.0),
        ],
        axis=0,
    )
    return RFTiledState(
        prims=work,
        cull_centers=cull_centers,
        cull_radii=cull_radii,
        feats16=feats16,
        opac=work.attrs["opacities"][:, 0],
        sh48=sh48,
        shrows=shrows,
        sup_centers=sup_centers,
        sup_radii=sup_radii,
        suprows=suprows,
        extent=float(primitives.extent),
        clustered=cfg.use_clusters,
        cluster_size=cfg.cluster_size,
        super_group=cfg.super_group,
    )


# Profiling hook (tools/profile_rf.py): when set to 'cull' or 'gather',
# _render_tiles returns a cheap stand-in right after that stage (keeping
# data dependencies alive) so the real in-frame stage cost can be timed —
# standalone re-implementations of the stages measure different layouts.
_DEBUG_STOP = None


def _neutral_feature():
    """Quadric feature row with M = I, c = 0: keeps a > 0 for masked slots."""
    import numpy as np

    out = np.zeros((16,), np.float32)
    out[:3] = 1.0
    return out


def _composite_tile_xla(
    o, d, pf, opac, sh48, valid, basis_k, extent, cfg: RFTiledConfig
):
    """Differentiable per-tile compositor (same math as the Pallas kernel).

    pf [S, 16], opac [S], sh48 [S, 48], valid [S]; o, d [RT, 3].
    """
    kern = cfg.kernel
    rt = o.shape[0]
    s = pf.shape[0]
    c = min(cfg.segment, s)
    n_seg = s // c

    fa, fb, fc = quadric.ray_features(o, d)  # [RT, 10]
    basis = sh.eval_basis(d, sh.degree_from_coeffs(basis_k))  # [RT, K]
    hp = jax.lax.Precision.HIGHEST
    e2 = extent * extent

    band = min(int(cfg.order_band), c - 1)  # offsets beyond the segment are empty

    def seg_step(carry, si):
        l_acc, beta, count = carry
        sl = jax.lax.dynamic_slice_in_dim
        pf_s = sl(pf, si * c, c, 0)  # [C, 16]
        opac_s = sl(opac, si * c, c, 0)
        vld = sl(valid, si * c, c, 0)
        a = jnp.dot(fa, pf_s[:, :10].T, precision=hp)
        b = jnp.dot(fb, pf_s[:, :10].T, precision=hp)
        cc = jnp.dot(fc, pf_s[:, :10].T, precision=hp)
        q_min = jnp.maximum(cc - b * b / a, 0.0)
        disc = (e2 - q_min) / a
        t_near = -b / a - jnp.sqrt(jnp.maximum(disc, 0.0))
        hit = (disc >= 0.0) & (t_near > 0.0) & vld[None, :]

        density = kern.eval_q(q_min)
        alpha = jnp.minimum(opac_s[None, :] * density, 0.9999)
        alpha = jnp.where(hit, alpha, 0.0)

        new_count = count[:, None] + jnp.cumsum(
            (alpha > 0.0).astype(jnp.int32), axis=-1
        )
        if cfg.max_depth > 0:
            alpha = jnp.where(new_count <= cfg.max_depth, alpha, 0.0)

        trans = 1.0 - alpha
        cp = jnp.cumprod(trans, axis=-1)
        excl = jnp.concatenate(
            [jnp.ones((rt, 1), cp.dtype), cp[:, :-1]], axis=-1
        )
        if band > 0:
            # Banded per-ray order correction (cfg.order_band docstring):
            # entry-keyed, because the exact integrator composites by
            # entry t. Dead columns (alpha = 0) carry trans = 1, so their
            # moves are no-ops regardless of their (garbage) t key. Ties
            # and pairs beyond the band keep stream order. The band is
            # strictly INTRA-segment: a pair straddling the segment
            # boundary would get only the later column's (backward)
            # half-correction — the earlier column's weight is already
            # emitted — and an inverted pair corrected on one side only
            # OVERCOUNTS (both columns composite as if in front of the
            # other); measured, that half-correction LOSES dB
            # monotonically with band size. Boundary pairs therefore
            # keep consistent stream order (both sides padded inert).
            # Interleaved mul/div keeps the running value near its true
            # <= 1 magnitude (trans >= 1e-4, one guarded step each way).
            tkey = jnp.where(alpha > 0.0, t_near, jnp.inf)
            inf_b = jnp.full((rt, 1), jnp.inf, tkey.dtype)
            one_b = jnp.ones((rt, 1), trans.dtype)
            for s_ in range(1, band + 1):
                # j = i + s later in stream but nearer: joins i's prefix
                t_f = jnp.concatenate(
                    [tkey[:, s_:], jnp.broadcast_to(inf_b, (rt, s_))], axis=1
                )
                tr_f = jnp.concatenate(
                    [trans[:, s_:], jnp.broadcast_to(one_b, (rt, s_))], axis=1
                )
                excl = excl * jnp.where(t_f < tkey, tr_f, 1.0)
                # j = i - s earlier in stream but farther: leaves i's
                # prefix (pad head with -inf keys: never "farther")
                t_b = jnp.concatenate(
                    [
                        jnp.broadcast_to(-inf_b, (rt, s_)),
                        tkey[:, :c - s_],
                    ], axis=1
                )
                tr_b = jnp.concatenate(
                    [jnp.broadcast_to(one_b, (rt, s_)), trans[:, :c - s_]],
                    axis=1,
                )
                excl = excl / jnp.where(t_b > tkey, tr_b, 1.0)
        weight = beta[:, None] * excl * alpha
        weight = jnp.where(beta[:, None] * excl > cfg.beta_kill, weight, 0.0)

        emission = []
        for ch in range(3):
            sh_ch = sl(sh48, si * c, c, 0)[:, ch * 16:ch * 16 + basis_k]
            e_ch = jnp.maximum(jnp.dot(basis, sh_ch.T) + 0.5, 0.0)
            emission.append(jnp.sum(weight * e_ch, axis=-1))
        l_acc = l_acc + jnp.stack(emission, axis=-1)

        beta = beta * cp[:, -1]
        count = new_count[:, -1]
        return (l_acc, beta, count), None

    init = (
        jnp.zeros((rt, 3), o.dtype),
        jnp.ones((rt,), o.dtype),
        jnp.zeros((rt,), jnp.int32),
    )
    if cfg.early_exit:

        def cond(state):
            si, carry = state
            return (si < n_seg) & jnp.any(carry[1] > cfg.beta_kill)

        def body(state):
            si, carry = state
            carry, _ = seg_step(carry, si)
            return si + 1, carry

        _, fin = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
    else:
        fin, _ = jax.lax.scan(seg_step, init, jnp.arange(n_seg))
    return fin[0], fin[1]


def _tile_layout(camera: CameraSpecs, cfg: RFTiledConfig):
    """Block-major tile grid for a camera: returns ``(px0, py0, tile_ids,
    unshuffle)`` where ``px0/py0`` are [T, RT] pixel coordinates in coarse-
    strip block-major order, and ``unshuffle(acc)`` folds a [T, RT, 3]
    accumulator back into the [H, W, 3] film. Shared by :func:`render_state`
    and the scaling diagnostics (tools/scaling_attrib.py), which time the
    same per-tile frame function under different execution layouts."""
    h, w = camera.height, camera.width
    if cfg.tile_shape is not None:
        th, tw = cfg.tile_shape
    else:
        tp = cfg.tile_pixels
        th = int(tp**0.5)
        while tp % th or h % th:
            th -= 1
        tw = tp // th
    assert h % th == 0 and w % tw == 0, (
        f"film {w}x{h} not divisible into {tw}x{th} tiles"
    )
    n_ty, n_tx = h // th, w // tw
    n_tiles = n_ty * n_tx
    rt = th * tw

    # Tile ordering: consecutive `coarse_group` tiles form one coarse cull
    # strip, so order tiles so each strip is a near-SQUARE gb_y x gb_x block
    # of tiles (row-consecutive strips are elongated — e.g. 16 8x8 tiles =
    # a 128x8-pixel sliver whose bounding cone covers ~4x the solid angle
    # of the 32x32 block, wasting the strip's coarse candidate budget).
    gc = max(1, cfg.coarse_group)
    gb_y = max(1, int(round(gc ** 0.5)))
    while gb_y > 1 and (gc % gb_y or n_ty % gb_y or n_tx % (gc // gb_y)):
        gb_y -= 1
    gb_x = gc // gb_y if gc % gb_y == 0 and n_tx % (gc // gb_y) == 0 else 1
    if gb_x == 1:
        gb_y = 1  # fall back to row-consecutive strips
    n_gy, n_gx = n_ty // gb_y, n_tx // gb_x
    import numpy as onp

    ty_blk = onp.arange(n_ty).reshape(n_gy, gb_y)
    tx_blk = onp.arange(n_tx).reshape(n_gx, gb_x)
    ty_of = onp.broadcast_to(
        ty_blk[:, None, :, None], (n_gy, n_gx, gb_y, gb_x)
    ).reshape(-1)
    tx_of = onp.broadcast_to(
        tx_blk[None, :, None, :], (n_gy, n_gx, gb_y, gb_x)
    ).reshape(-1)

    # pixel coordinates in (block-major) tile order: [T, RT]
    ys = jnp.arange(h).reshape(n_ty, th)[ty_of]  # [T, th]
    xs = jnp.arange(w).reshape(n_tx, tw)[tx_of]  # [T, tw]
    py0 = jnp.broadcast_to(
        ys[:, :, None], (n_tiles, th, tw)
    ).reshape(n_tiles, rt).astype(jnp.float32)
    px0 = jnp.broadcast_to(
        xs[:, None, :], (n_tiles, th, tw)
    ).reshape(n_tiles, rt).astype(jnp.float32)
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)

    def unshuffle(acc):
        return (
            acc.reshape(n_gy, n_gx, gb_y, gb_x, th, tw, 3)
            .transpose(0, 2, 4, 1, 3, 5, 6)
            .reshape(h, w, 3)
        )

    return px0, py0, tile_ids, unshuffle


def render_state(
    state: RFTiledState,
    camera: CameraSpecs,
    cfg: RFTiledConfig,
    emitter=None,
    spp: int = 1,
    seed=0,
    jitter: bool = True,
    mesh=None,
) -> jnp.ndarray:
    """Render one camera from prepared state. Returns [H, W, 3].

    With ``mesh`` (a 1-D ``jax.sharding.Mesh``), the tile axis is sharded
    over the mesh's first axis via ``shard_map`` — the whole per-frame
    pipeline (cull, gather, composite) is an independent map over tiles, so
    devices never communicate until the caller reduces the image (SURVEY
    §2.2 "rays/pixels/cameras sharded along data"). Images are bitwise
    identical to the single-device render (per-tile RNG keys).
    """
    px0, py0, tile_ids, unshuffle = _tile_layout(camera, cfg)
    n_tiles = px0.shape[0]

    basis_k = state.sh48.shape[1] and _basis_count(state)

    from .base import _as_key

    base_key = _as_key(seed)
    frame = functools.partial(
        _render_tiles,
        cfg=cfg,
        cam=(
            camera.to_world[:3, 3], camera.to_world[:3, :3],
            float(camera.focal_length),
            float(camera.width / 2.0 - camera.cx),
            float(camera.height / 2.0 - camera.cy),
        ),
        basis_k=basis_k, spp=spp, jitter=jitter,
    )
    if mesh is None:
        acc = frame(state, emitter, px0, py0, tile_ids, base_key)
    else:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]
        assert n_tiles % mesh.devices.size == 0, (
            f"{n_tiles} tiles not divisible over {mesh.devices.size} devices"
        )
        acc = shard_map(
            frame, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P()),
            out_specs=P(axis),
            check_vma=False,
        )(state, emitter, px0, py0, tile_ids, base_key)
    return unshuffle(acc)


def _render_tiles(
    state: RFTiledState,
    emitter,
    px0: jnp.ndarray,  # [T, RT]
    py0: jnp.ndarray,
    tile_ids: jnp.ndarray,  # [T] global tile indices (per-tile RNG)
    base_key,
    *,
    cfg: RFTiledConfig,
    cam,
    basis_k: int,
    spp: int,
    jitter: bool,
):
    """Cull, gather and composite a block of tiles. Returns [T, RT, 3]."""
    origin_np, rot_np, focal_f, ppx_f, ppy_f = cam
    n_tiles, rt = px0.shape
    g = cfg.tile_group
    while n_tiles % g:
        g -= 1

    work = state.prims
    s = min(cfg.max_candidates, work.num_prims)
    s = max(cfg.segment, (s // cfg.segment) * cfg.segment) if s >= cfg.segment else s

    origin = jnp.asarray(origin_np, jnp.float32)
    rot = jnp.asarray(rot_np, jnp.float32)
    focal = jnp.float32(focal_f)
    ppx = jnp.float32(ppx_f)
    ppy = jnp.float32(ppy_f)

    def dirs_cols(px, py):
        """Normalized ray directions as three [T, RT] component arrays —
        a [T, RT, 3] array is lane-padded 42x by the TPU layout."""
        dlx = -(px - ppx) / focal
        dly = -(py - ppy) / focal
        ddx = rot[0, 0] * dlx + rot[0, 1] * dly + rot[0, 2]
        ddy = rot[1, 0] * dlx + rot[1, 1] * dly + rot[1, 2]
        ddz = rot[2, 0] * dlx + rot[2, 1] * dly + rot[2, 2]
        inv = 1.0 / jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
        return ddx * inv, ddy * inv, ddz * inv

    def dirs_from(px, py):
        dnx, dny, dnz = dirs_cols(px, py)
        return jnp.stack([dnx, dny, dnz], axis=-1)

    # ---- per-frame culling (componentwise: no [T, RT, 3] temporaries) -----
    dnx, dny, dnz = dirs_cols(px0 + 0.5, py0 + 0.5)
    ax = jnp.stack(
        [dnx.mean(axis=1), dny.mean(axis=1), dnz.mean(axis=1)], axis=-1
    )
    axis = ax / jnp.linalg.norm(ax, axis=-1, keepdims=True)
    cos_half = jnp.min(
        dnx * axis[:, 0:1] + dny * axis[:, 1:2] + dnz * axis[:, 2:3], axis=1
    )
    half = jnp.arccos(jnp.clip(cos_half, -1.0, 1.0)) + 1.5 / focal
    cos_half = jnp.cos(half)

    use_fused = cfg.backend == "fused"
    resort = cfg.prim_resort if cfg.prim_resort is not None else not use_fused
    if use_fused:
        assert state.clustered, "backend='fused' requires use_clusters=True"
    use_classes = bool(cfg.budget_classes) and use_fused
    if use_classes:
        assert cfg.refine_fraction == 0.0, (
            "budget_classes replaces refine_fraction"
        )
    keys_full = id_map = None
    if state.clustered:
        cs = state.cluster_size
        k_cl = max(1, s // cs)
        gc = cfg.coarse_group
        if gc and n_tiles % gc == 0 and gc > 1:
            # ---- two-level cull: strip cones -> per-tile refinement ------
            n_coarse = n_tiles // gc
            ax_g = axis.reshape(n_coarse, gc, 3)
            c_axis = ax_g.mean(axis=1)
            c_axis = c_axis / jnp.linalg.norm(c_axis, axis=-1, keepdims=True)
            # strip half-angle covers every member tile's cone
            cos_between = jnp.einsum("cgi,ci->cg", ax_g, c_axis)
            ang = jnp.arccos(jnp.clip(cos_between, -1.0, 1.0)) + jnp.arccos(
                jnp.clip(cos_half.reshape(n_coarse, gc), -1.0, 1.0)
            )
            c_cos = jnp.cos(jnp.max(ang, axis=1))
            # third level: exact top-k over Nsup = Ncl/super_group keys,
            # then expansion back to Morton-contiguous cluster ranges (the
            # fine stage re-culls and re-orders with exact cluster keys)
            sg = state.super_group
            ncl_total = state.cull_centers.shape[0]
            keys_s = tiling.cone_cull_keys_batch(
                origin, c_axis, c_cos, state.sup_centers, state.sup_radii
            )
            k_sup = min(
                max(1, -(-cfg.coarse_factor * k_cl // sg)),
                state.sup_centers.shape[0],
            )
            sup_ids, sup_valid = tiling.shortlist(keys_s, k_sup)
            offs_s = jnp.arange(sg, dtype=sup_ids.dtype)
            cl_c = (sup_ids[..., None] * sg + offs_s).reshape(
                n_coarse, k_sup * sg
            )
            cl_c = jnp.minimum(cl_c, ncl_total - 1)
            k_c = k_sup * sg
            # per-tile keys against the strip's survivors only; member
            # cluster spheres come as wide [4, sg] supercluster rows (one
            # gather + relayout — scalar-column gathers cost ~5 ns/element)
            nsup_t = state.suprows.shape[0] - 1
            sup_safe = jnp.where(sup_valid, sup_ids, nsup_t)
            rows_c = jnp.take(
                state.suprows, sup_safe.reshape(-1), axis=0, mode="clip"
            )
            cc = (
                rows_c.reshape(n_coarse, k_sup, 4, sg)
                .transpose(0, 2, 1, 3)
                .reshape(n_coarse, 4, k_c)
            )
            ccx, ccy, ccz, ccr = cc[:, 0], cc[:, 1], cc[:, 2], cc[:, 3]
            rep = lambda a: jnp.repeat(a, gc, axis=0)
            keys = tiling.cone_cull_keys_cols(
                origin, axis, cos_half,
                rep(ccx), rep(ccy), rep(ccz), rep(ccr),
            )
            keys_full, id_map = keys, rep(cl_c)
            if not use_classes:
                loc_ids, cl_valid = tiling.shortlist(keys, min(k_cl, k_c))
                cl_ids = jnp.take_along_axis(rep(cl_c), loc_ids, axis=-1)
                if k_cl > k_c:
                    pad = ((0, 0), (0, k_cl - k_c))
                    cl_ids = jnp.pad(cl_ids, pad)
                    cl_valid = jnp.pad(cl_valid, pad)
            strip_cand = (cl_c, ccx, ccy, ccz, ccr, gc)
        else:
            strip_cand = None
            keys = tiling.cone_cull_keys_batch(
                origin, axis, cos_half, state.cull_centers, state.cull_radii
            )
            keys_full, id_map = keys, None
            if not use_classes:
                cl_ids, cl_valid = tiling.shortlist(keys, k_cl)
        if not use_fused:
            ids, valid = clusters.expand_cluster_ids(cl_ids, cl_valid, cs)
            s = ids.shape[1]
        if resort and not use_fused:
            depth = jnp.einsum("tsi,ti->ts", work.centers[ids] - origin, axis)
            if resort in ("entry", "cluster-entry"):
                # entry-biased key: center depth minus the ellipsoid's
                # support along the tile axis (the exact integrator orders
                # by ENTRY t, not center depth — probe for a better sort
                # key). support = extent * ||diag(s) R^T a||.
                from ..ops import quaternion

                rot_g = quaternion.to_rotation_matrix(
                    work.quats[ids.reshape(-1)]
                ).reshape(ids.shape + (3, 3))  # [T, S, 3, 3]
                ra_g = jnp.einsum("tsji,tj->tsi", rot_g, axis)
                sup = float(work.extent) * jnp.sqrt(
                    jnp.sum((work.scales[ids] * ra_g) ** 2, axis=-1)
                )
                depth = depth - sup
            depth = jnp.where(valid, depth, jnp.inf)
            if resort in ("cluster", "cluster-entry"):
                # intra-cluster depth sort only: keeps the cluster-gather
                # stream order (what the fused path walks) but fixes the
                # arbitrary Morton order WITHIN each cs-block — the probe
                # for the pack-time per-cluster sort (quality ceiling is
                # ordering-limited: 31.1 dB at 262k, 25.9 dB at 2M)
                t_, s_ = ids.shape
                dep_c = depth.reshape(t_, s_ // cs, cs)
                order = jnp.argsort(dep_c, axis=-1).reshape(t_, s_)
                order = order + (
                    jnp.arange(s_, dtype=order.dtype) // cs * cs
                )[None, :]
            else:
                # refine to per-primitive view depth ([T, S] sort)
                order = jnp.argsort(depth, axis=-1)
            ids = jnp.take_along_axis(ids, order, axis=-1)
            valid = jnp.take_along_axis(valid, order, axis=-1)
    else:
        keys = tiling.cone_cull_keys_batch(
            origin, axis, cos_half, state.cull_centers, state.cull_radii
        )
        ids, valid = tiling.shortlist(keys, s)

    # ---- per-sample rendering --------------------------------------------
    use_pallas = cfg.backend == "pallas"
    use_pallas2 = cfg.backend == "pallas2"

    if use_fused:
        from ..pallas_kernels import composite3

        ncl = work.num_prims // cs
        ptab = composite3.pack_fused_features(work, origin)  # [16, N]
        sh_table = state.shrows
        if cfg.feat_major:
            # [16, Ncl, cs]: a FREE reshape (no relayout) — the per-tile
            # middle-axis take below produces the kernel's [16, Tb, S]
            # blocks directly
            ptab_rows = ptab.reshape(16, ncl, cs)
            if cfg.cluster_sort:
                # order each cluster's columns by the ENTRY-distance key
                # (pack row 15: |w| - support along w_hat; the exact
                # integrator composites by entry t, and the entry key
                # measured +0.2-0.3 dB over center distance); one global
                # permute serves every tile's gathers
                order = jnp.argsort(ptab_rows[15], axis=-1)
                ptab_rows = jnp.take_along_axis(
                    ptab_rows, order[None], axis=2
                )
                sh_table = jnp.take_along_axis(sh_table, order[None], axis=2)
        else:
            # cluster-row layout [Ncl, 16*cs]: ONE wide gather per tile
            # block instead of 16 narrow plane gathers (row-gathers cost
            # ~10 ns each on v5e regardless of width — 2M narrow rows took
            # ~28 ms/frame, 131k wide rows take ~2 ms + one relayout)
            planes = ptab.reshape(16, ncl, cs)
            if cfg.cluster_sort:
                # round-5: cluster_sort decoupled from feat_major (r4
                # verdict #10 — the band quality mode rode the fm layout
                # only because csort lived in the fm pack path). Same
                # entry-key intra-cluster permute, applied to the plane
                # view before the wide-row relayout; the sh table gets
                # the matching per-cluster column permute.
                kl = _basis_count(state)
                order = jnp.argsort(planes[15], axis=-1)  # [Ncl, cs]
                planes = jnp.take_along_axis(planes, order[None], axis=2)
                sh_table = jnp.take_along_axis(
                    sh_table.reshape(ncl, 3 * kl, cs),
                    order[:, None, :], axis=2,
                ).reshape(ncl, 3 * kl * cs)
            ptab_rows = planes.transpose(1, 0, 2).reshape(ncl, 16 * cs)

        if _DEBUG_STOP == "pack":
            probe = jnp.sum(keys_full, where=jnp.isfinite(keys_full)) * (
                1e-12
            ) + jnp.sum(ptab_rows) * 1e-12
            return jnp.broadcast_to(probe, (n_tiles, rt, 3))

        if _DEBUG_STOP == "cull":
            probe = jnp.sum(
                keys_full, where=jnp.isfinite(keys_full)
            ) * 1e-12
            return jnp.broadcast_to(probe, (n_tiles, rt, 3))

        def fused_block(cl_i, cl_v, k_here, px_b, py_b, tid_b, ax_b,
                        band=None):
            """Pad/gather/composite a tile block. Returns (sum-of-samples
            [Tb, RT, 3], sample-0 beta [Tb, RT]). ``band`` overrides
            cfg.order_band for this block (per-class banding)."""
            band_here = int(cfg.order_band if band is None else band)
            tb = tb0 = px_b.shape[0]
            if cfg.feat_major and tb % 8:
                # Mosaic tiling: feat-major pf/sh blocks are [F, kb, S],
                # kb second-to-last -> must be a multiple of 8 dividing
                # tb. Class tile counts rarely are; PAD the block with
                # inert tiles (cl_v all-False -> n_seg 0, the kernel
                # skips them; geometry edge-replicated so ray-gen stays
                # finite) instead of falling back to kb = tb, whose
                # [F, tb, S] blocks are ~6-9 MB and overflow VMEM
                # (round-4 advisor, rf_tiled kb fallback).
                pad_t = 8 - tb % 8
                ep = ((0, pad_t), (0, 0))
                cl_i = jnp.pad(cl_i, ep, mode="edge")
                cl_v = jnp.pad(cl_v, ep)  # False: padded tiles do no work
                px_b = jnp.pad(px_b, ep, mode="edge")
                py_b = jnp.pad(py_b, ep, mode="edge")
                tid_b = jnp.pad(tid_b, (0, pad_t), mode="edge")
                ax_b = jnp.pad(ax_b, ep, mode="edge")
                tb += pad_t
            seg = min(cfg.segment, k_here * cs)
            per_seg = max(1, seg // cs)
            if k_here % per_seg:
                pad_k = per_seg - k_here % per_seg
                cl_i = jnp.pad(cl_i, ((0, 0), (0, pad_k)))
                cl_v = jnp.pad(cl_v, ((0, 0), (0, pad_k)))
                k_here += pad_k
            s_here = k_here * cs
            # live segments per tile (valid clusters sort first); a cluster
            # wider than a segment spans cs/seg segments
            n_seg_t = -(-(jnp.sum(cl_v, axis=-1) * cs) // seg)
            # cluster-blocked gather: one wide row per cluster from the
            # [Ncl, 16*cs] table, relaid out to the kernel's native
            # [Tb, 16, S] block; invalid clusters' slots become neutral
            neutral = composite3.neutral_fused_row()
            valid_row = jnp.repeat(cl_v, cs, axis=-1)  # [Tb, S]
            if cfg.feat_major:
                # middle-axis take: [16, Tb, K, cs] -> [16, Tb, S] is a
                # free reshape (K, cs adjacent) — no transpose relayout
                pf_t = jnp.take(
                    ptab_rows, cl_i, axis=1, mode="clip"
                ).reshape(16, tb, s_here)
                pf_t = jnp.where(
                    valid_row[None, :, :], pf_t, neutral[:, None, None]
                )
            else:
                rows = jnp.take(
                    ptab_rows, cl_i.reshape(-1), axis=0, mode="clip"
                )  # [Tb*K, 16*cs]
                pf_t = (
                    rows.reshape(tb, k_here, 16, cs)
                    .transpose(0, 2, 1, 3)
                    .reshape(tb, 16, s_here)
                )
                pf_t = jnp.where(
                    valid_row[:, None, :], pf_t, neutral[None, :, None]
                )
            if _DEBUG_STOP == "gather_pf":
                probe = (
                    jnp.sum(pf_t) + jnp.sum(n_seg_t).astype(jnp.float32)
                ) * 1e-12
                return (
                    jnp.broadcast_to(probe, (tb, rt, 3)),
                    jnp.ones((tb, rt), jnp.float32),
                )
            # SH: cluster rows of live coefficients from the prebuilt
            # feature-major table (state.shrows [Ncl, 3k*cs]) — one wide
            # gather + one [tb, K, 3k, cs] -> [tb, 3k, S] transpose. Invalid
            # slots need no masking: their pf rows are neutral (opacity 0),
            # so their emission weight is exactly zero.
            k_live = _basis_count(state)
            if cfg.feat_major:
                sh_t = jnp.take(
                    sh_table, cl_i, axis=1, mode="clip"
                ).reshape(3 * k_live, tb, s_here)
            else:
                sh_small = jnp.take(
                    sh_table, cl_i.reshape(-1), axis=0, mode="clip"
                )
                sh_t = (
                    sh_small.reshape(tb, k_here, 3 * k_live, cs)
                    .transpose(0, 2, 1, 3)
                    .reshape(tb, 3 * k_live, s_here)
                )
            if resort:
                # exact per-primitive view depth from the packed rows
                # (w = o - c lives at rows 9:12 — no extra gathers); the
                # tile axis approximates every ray's direction
                if cfg.feat_major:
                    # entry-distance key (pack row 15) — per-prim exact
                    # camera direction, entry-biased (beats the shared
                    # tile-axis center depth on the probe)
                    depth = jnp.where(valid_row, pf_t[15], jnp.inf)
                    order = jnp.argsort(depth, axis=-1)
                    pf_t = jnp.take_along_axis(
                        pf_t, order[None, :, :], axis=2
                    )
                    sh_t = jnp.take_along_axis(
                        sh_t, order[None, :, :], axis=2
                    )
                else:
                    depth = jnp.where(valid_row, pf_t[:, 15], jnp.inf)
                    order = jnp.argsort(depth, axis=-1)
                    pf_t = jnp.take_along_axis(
                        pf_t, order[:, None, :], axis=2
                    )
                    sh_t = jnp.take_along_axis(
                        sh_t, order[:, None, :], axis=2
                    )

            if _DEBUG_STOP == "gather":
                probe = (
                    jnp.sum(pf_t)
                    + jnp.sum(sh_t.astype(jnp.float32))
                    + jnp.sum(n_seg_t).astype(jnp.float32)
                ) * 1e-12
                return (
                    jnp.broadcast_to(probe, (tb, rt, 3)),
                    jnp.ones((tb, rt), jnp.float32),
                )

            kb = cfg.kernel_batch
            while tb % kb:
                kb -= 1
            if cfg.feat_major:
                # Mosaic tiling rule: the feat-major pf/sh blocks are
                # [F, kb, S], so kb sits in the second-to-last block dim
                # and must be a multiple of 8. CPU interpret mode never
                # checks this — the (8,128) divisibility error only fires
                # on real TPU lowering. tb is padded to a multiple of 8
                # above, so a multiple-of-8 divisor always exists.
                # Round-3 measurement: kernel_batch 8 is timing-neutral.
                kb8 = max(kb - kb % 8, 8)
                while kb8 > 8 and tb % kb8:
                    kb8 -= 8
                assert tb % kb8 == 0, (tb, kb8)
                kb = kb8
            # spp folding: stack `fold` samples' rays on the kernel's ray
            # axis — one shortlist walk serves all folded samples (pf/sh
            # DMA and per-segment fixed costs amortize; GEMM rows grow
            # toward the 128-row MXU sweet spot). Cap folded rows at 512
            # to bound the kernel's VMEM intermediates.
            fold = max(1, min(spp, 512 // rt))
            while spp % fold:
                fold -= 1

            def sample_group(g):
                offs = [
                    _tile_offsets(base_key, g * fold + j, tid_b, rt, jitter)
                    for j in range(fold)
                ]
                cols = [
                    dirs_cols(px_b + off[..., 0], py_b + off[..., 1])
                    for off in offs
                ]
                dnx = jnp.concatenate([c[0] for c in cols], axis=1)
                dny = jnp.concatenate([c[1] for c in cols], axis=1)
                dnz = jnp.concatenate([c[2] for c in cols], axis=1)
                # Rows 3-7: the subtile's bounding cone (unit axis,
                # cos/sin half-angle), computed HERE with XLA's correctly
                # rounded sqrt — the in-kernel compaction mask reads it
                # instead of re-deriving it through Mosaic's approximate
                # rsqrt (which perturbed the cone by ~its own half-width
                # and leaked ~1 dB dropping borderline columns).
                mx = jnp.mean(dnx, axis=1)
                my = jnp.mean(dny, axis=1)
                mz = jnp.mean(dnz, axis=1)
                nrm = jnp.sqrt(mx * mx + my * my + mz * mz)
                ax0 = mx / jnp.maximum(nrm, 1e-12)
                ax1 = my / jnp.maximum(nrm, 1e-12)
                ax2 = mz / jnp.maximum(nrm, 1e-12)
                ch = jnp.min(
                    dnx * ax0[:, None] + dny * ax1[:, None]
                    + dnz * ax2[:, None],
                    axis=1,
                )
                # slack covers f32 rounding of the in-kernel FMA-only test
                ch = jnp.clip(ch - 1e-6, -1.0, 1.0)
                sh_ = jnp.sqrt(jnp.maximum(1.0 - ch * ch, 0.0))
                rows = [
                    jnp.broadcast_to(v[:, None], dnx.shape)
                    for v in (ax0, ax1, ax2, ch, sh_)
                ]
                d8 = jnp.stack([dnx, dny, dnz] + rows, axis=1)
                # [Tb, 8, fold*RT]
                l, beta = composite3.composite_tiles3_ad(
                    d8, pf_t, sh_t, n_seg_t,
                    seg,
                    state.extent**2,
                    cfg.max_depth if cfg.max_depth > 0 else 10**6,
                    cfg.beta_kill,
                    sh.degree_from_coeffs(basis_k),
                    basis_k,
                    cfg.early_exit,
                    True,
                    jax.default_backend() != "tpu",
                    kb,
                    cfg.kernel_compact,
                    cfg.feat_major,
                    band_here,
                )
                if emitter is not None:
                    d = jnp.stack([dnx, dny, dnz], axis=-1)
                    l = l + beta[..., None] * emitter.eval(d)
                if cfg.srgb_primitives:
                    l = srgb_to_linear(l)  # per sample (rf:188-190)
                # sum folded samples: [Tb, fold*RT, 3] -> [Tb, RT, 3]
                l = jnp.sum(l.reshape(tb, fold, rt, 3), axis=1)
                return l, beta[:, :rt]

            acc0, beta0 = sample_group(0)

            def body(a, g):
                return a + sample_group(g)[0], None

            n_groups = spp // fold
            if n_groups > 1:
                acc_b, _ = jax.lax.scan(
                    body, acc0, jnp.arange(1, n_groups)
                )
            else:
                acc_b = acc0
            return acc_b[:tb0], beta0[:tb0]

        if use_classes:
            # ---- adaptive per-tile budgets: static-fraction classes ------
            # Tiles sorted by exact need (finite cull keys against the
            # strip candidates); class c's tiles get budget k_c clusters.
            # The whole-film pair count tracks the NEED distribution
            # instead of a fixed worst-case budget; under a mesh the
            # per-shard ordering makes sharded renders statistically (not
            # bitwise) equal to single-device, like refine_fraction.
            kcap = keys_full.shape[1]
            n_fin = jnp.sum(jnp.isfinite(keys_full), axis=-1)
            order = jnp.argsort(n_fin)
            fracs = [f for f, _ in cfg.budget_classes]
            assert abs(sum(fracs) - 1.0) < 1e-6, (
                f"budget_classes fractions sum to {sum(fracs)}"
            )
            counts = [int(round(n_tiles * f)) for f in fracs]
            counts[-1] = n_tiles - sum(counts[:-1])
            assert min(counts) >= 1, (
                f"budget class with no tiles: {counts} (n_tiles {n_tiles})"
            )
            bands = cfg.band_classes or (None,) * len(cfg.budget_classes)
            assert len(bands) == len(cfg.budget_classes), (
                "band_classes must match budget_classes per class"
            )
            acc = jnp.zeros((n_tiles, rt, 3), jnp.float32)
            start = 0
            for cnt, (_, kb), bnd in zip(
                counts, cfg.budget_classes, bands
            ):
                sel = jax.lax.slice_in_dim(order, start, start + cnt)
                start += cnt
                k_eff = min(kb, kcap)
                loc, val = tiling.shortlist(
                    jnp.take(keys_full, sel, axis=0), k_eff
                )
                if id_map is not None:
                    ids_c = jnp.take_along_axis(
                        jnp.take(id_map, sel, axis=0), loc, axis=-1
                    )
                else:
                    ids_c = loc
                acc_c, _ = fused_block(
                    ids_c, val, k_eff,
                    px0[sel], py0[sel], tile_ids[sel], axis[sel],
                    band=bnd,
                )
                acc = acc.at[sel].set(acc_c)
            return acc / spp

        n_valid0 = jnp.sum(cl_valid, axis=-1)
        acc, beta0 = fused_block(
            cl_ids, cl_valid, k_cl, px0, py0, tile_ids, axis
        )

        if cfg.refine_fraction > 0.0:
            # Residual-driven refinement: tiles whose cluster list was FULL
            # and whose rays still carried transmittance at its end are
            # truncation suspects; re-render the worst refine_fraction of
            # them with a refine_factor-times-larger shortlist.
            m = max(1, int(round(n_tiles * cfg.refine_fraction)))
            trunc = jnp.sum(beta0 > cfg.beta_kill, axis=1)
            score = jnp.where(n_valid0 >= k_cl, trunc, 0)
            score_sel, sel_t = jax.lax.top_k(score, m)
            k2 = min(cfg.refine_factor * k_cl, state.cull_centers.shape[0])
            if strip_cand is not None:
                # re-cull against the tile's strip candidates (already
                # collected, coarse_factor x the base budget) instead of
                # every cluster: the full [m, Ncl] keys + top-k was the
                # refine pass's dominant cost
                cl_c_, ccx_, ccy_, ccz_, ccr_, gc_ = strip_cand
                strip_of = sel_t // gc_
                keys_r = tiling.cone_cull_keys_cols(
                    origin, axis[sel_t], cos_half[sel_t],
                    ccx_[strip_of], ccy_[strip_of], ccz_[strip_of],
                    ccr_[strip_of],
                )
                k2 = min(k2, keys_r.shape[1])
                loc_r, cl_valid_r = tiling.shortlist(keys_r, k2)
                cl_ids_r = jnp.take_along_axis(
                    cl_c_[strip_of], loc_r, axis=-1
                )
            else:
                keys_r = tiling.cone_cull_keys_batch(
                    origin, axis[sel_t], cos_half[sel_t],
                    state.cull_centers, state.cull_radii,
                )
                cl_ids_r, cl_valid_r = tiling.shortlist(keys_r, k2)
            acc_r, _ = fused_block(
                cl_ids_r, cl_valid_r, k2,
                px0[sel_t], py0[sel_t], tile_ids[sel_t], axis[sel_t],
            )
            use_r = (score_sel > 0)[:, None, None]
            acc = acc.at[sel_t].set(jnp.where(use_r, acc_r, acc[sel_t]))
        return acc / spp

    # The compositors consume the shortlist in fixed-width segments; pad the
    # shortlist up to a segment multiple so small scenes (s < segment, or
    # cluster expansion widths that don't divide) work on every backend.
    seg = min(cfg.segment, s)
    if s % seg:
        pad_n = seg - s % seg
        ids = jnp.pad(ids, ((0, 0), (0, pad_n)))
        valid = jnp.pad(valid, ((0, 0), (0, pad_n)))
        s = s + pad_n

    # ---- shortlist gathers (natural [T, S, F] layout) --------------------
    pf_t = jnp.where(
        valid[..., None], state.feats16[ids], _neutral_feature()
    )  # [T, S, 16]
    opac_t = jnp.where(valid, state.opac[ids], 0.0)  # [T, S]
    sh_t = state.sh48[ids]  # [T, S, 48]
    if use_pallas:
        from ..pallas_kernels import composite_vjp as pallas_composite
    if use_pallas2:
        from ..pallas_kernels import composite2 as pallas2

        cam_feats = pallas2.camera_relative_features_from_prims(
            state.prims, origin
        )
        # neutral camera-relative feature (M = I, c = 0) keeps a > 0
        neutral2 = jnp.concatenate(
            [
                jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0, 0.0], jnp.float32),
                origin,
                jnp.zeros((7,), jnp.float32),
            ]
        )
        pf2_t = jnp.where(valid[..., None], cam_feats[ids], neutral2)
        sh2_t = state.sh48[ids]  # [T, S, 48]
        opac2_t = jnp.where(valid, state.opac[ids], 0.0)
        c02_t = jnp.where(
            valid, cam_feats[:, 9][ids], jnp.sum(origin * origin)
        )
        aux2_t = jnp.stack([opac2_t, c02_t], axis=1)  # [T, 2, S]

    def render_sample(i):
        off = _tile_offsets(base_key, i, tile_ids, rt, jitter)
        px = px0 + off[..., 0]
        py = py0 + off[..., 1]
        d = dirs_from(px, py)  # [T, RT, 3]

        if use_pallas2:
            d8 = jnp.concatenate(
                [d, jnp.zeros(d.shape[:-1] + (5,), d.dtype)], axis=-1
            )
            l, beta = pallas2.composite_tiles2(
                d8, pf2_t, aux2_t, sh2_t,
                seg,
                state.extent**2,
                cfg.max_depth if cfg.max_depth > 0 else 10**6,
                cfg.beta_kill,
                sh.degree_from_coeffs(basis_k),
                basis_k,
                jax.default_backend() != "tpu",
            )
        elif use_pallas:
            d_flat = d.reshape(-1, 3)
            o_flat = jnp.broadcast_to(origin, d_flat.shape)
            fa, fb, fc = quadric.ray_features(o_flat, d_flat)
            pad = jnp.zeros((n_tiles * rt, 6), jnp.float32)
            fa = jnp.concatenate([fa, pad], -1).reshape(n_tiles, rt, 16)
            fb = jnp.concatenate([fb, pad], -1).reshape(n_tiles, rt, 16)
            fc = jnp.concatenate([fc, pad], -1).reshape(n_tiles, rt, 16)
            basis = sh.eval_basis(d_flat, sh.degree_from_coeffs(basis_k))
            basis = jnp.concatenate(
                [basis, jnp.zeros((n_tiles * rt, 16 - basis_k))], -1
            ).reshape(n_tiles, rt, 16)
            l, beta = pallas_composite.composite_tiles_ad(
                fa, fb, fc, basis, pf_t, opac_t[:, None, :], sh_t,
                seg,
                state.extent**2,
                cfg.max_depth if cfg.max_depth > 0 else 10**6,
                cfg.beta_kill,
                jax.default_backend() != "tpu",
            )
        else:
            def group_fn(args):
                d_g, pf_g, op_g, sh_g, v_g = args
                return jax.vmap(
                    lambda dg, pfg, opg, shg, vg: _composite_tile_xla(
                        jnp.broadcast_to(origin, dg.shape), dg, pfg, opg,
                        shg, vg, basis_k, state.extent, cfg,
                    )
                )(d_g, pf_g, op_g, sh_g, v_g)

            l, beta = jax.lax.map(
                group_fn,
                (
                    d.reshape(-1, g, rt, 3),
                    pf_t.reshape(-1, g, s, 16),
                    opac_t.reshape(-1, g, s),
                    sh_t.reshape(-1, g, s, 48),
                    valid.reshape(-1, g, s),
                ),
            )
            l = l.reshape(n_tiles, rt, 3)
            beta = beta.reshape(n_tiles, rt)

        if emitter is not None:
            l = l + beta[..., None] * emitter.eval(d)
        if cfg.srgb_primitives:
            l = srgb_to_linear(l)  # per-sample like the reference (rf:188-190)
        return l

    def body(acc, i):
        return acc + render_sample(i), None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((n_tiles, rt, 3), jnp.float32), jnp.arange(spp)
    )
    return acc / spp


def _tile_offsets(base_key, i, tile_ids, rt, jitter):
    """Per-tile jitter offsets [T, RT, 2] keyed by *global* tile id, so a
    sharded render is bitwise identical to the single-device one."""
    if not jitter:
        return jnp.full((tile_ids.shape[0], rt, 2), 0.5)
    key_i = jax.random.fold_in(base_key, i)
    return jax.vmap(
        lambda t: jax.random.uniform(jax.random.fold_in(key_i, t), (rt, 2))
    )(tile_ids)


def _basis_count(state: RFTiledState) -> int:
    """Number of live SH basis functions in the packed table."""
    # sh48 packs K coefficients per channel block; recover K from the prims.
    return state.prims.sh_coeffs_3d().shape[1]


def render(
    primitives: EllipsoidScene,
    camera: CameraSpecs,
    cfg: RFTiledConfig,
    emitter=None,
    spp: int = 1,
    seed=0,
    jitter: bool = True,
) -> jnp.ndarray:
    """Convenience: build the state and render (rebuilds the cluster index
    every call — use build_state + render_state for repeated frames)."""
    state = build_state(primitives, cfg)
    return render_state(state, camera, cfg, emitter, spp, seed, jitter)
