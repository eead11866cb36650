"""Volumetric-primitive path tracer with NEE (physically-based scattering).

Functional rebuild of the reference's ``volprim_prb`` plugin
(``/root/reference/volprim/integrators/volprim_prb.py``) and of the
Primitive Tracing algorithm it drives (``common.py:374-562``). The
reference's architecture — per-lane ``dr.Local`` stacks of overlapping
primitives, nested traced while-loops over boundary crossings, per-segment
callbacks — is replaced by fixed-shape wavefront stages:

free-flight sampling (reference ``primitive_tracing`` + ``sample_segment``,
prb:513-557):
  1. *Interval gathering*: a streaming top-K selects, per ray, the K nearest
     [entry, exit) intervals of extent ellipsoids (entries clamped to the
     window start; primitives already containing the origin keep their real
     exits — the overlap-set carry of common.py:428-441).
  2. *Segment scan*: the sorted union of interval boundaries forms segments;
     a ``lax.scan`` walks them, accumulating per-segment optical depth
     tau_s = sum_j sigma_t_j * D_j(seg) over the covering primitives
     (prb:523-536) and testing the sampling condition T * seg_tr < xi
     (prb:540-543). On success the exact distance is solved by the same
     fixed-iteration bisection on the segment CDF (prb:559-654).
  3. *Window continuation*: rays whose K-interval window is exhausted
     continue from the window end — the analogue of the reference's
     unbounded march with its ``max_depth_primitive`` cap (prb:60,456-459).

At an interaction the collision albedo is the sigma_t-pdf-weighted average
over covering primitives (``eval_albedo``, prb:434-511 — the manual 3-term
adjoint there is replaced by exact XLA AD). NEE samples the environment
emitter with transmittance re-evaluation along the shadow ray
(prb:195-235); escaping rays pick up the emitter with MIS against the NEE
pdf (prb:165-187). Transmittance along a ray is order-independent
(exp of a sum of per-primitive segment integrals, prb:303-432), so it is a
chunked masked reduction like the tomography integrator.

Since round 2, triangle-mesh surfaces with vertex BSDFs are supported
(prb:262-282): the march is capped at the nearest surface hit, surface
vertices run BSDF NEE/sampling with MIS, and the radiosity suite builds on
them (see :func:`radiance` and tests/test_surfaces.py). Interval gathering
is collected once per bounce, and bounces run on activity-compacted ray
chunks.
"""

from __future__ import annotations

import functools
import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from . import register_integrator
from ..ops import quadric
from ..ops.kernels import Kernel
from ..scene.ellipsoids import EllipsoidScene
from .base import pad_primitives

_BIG_T = 1e7  # effective infinity for shadow-ray segment integrals

# Stage-attribution debug stop for free_flight (None | "collect" |
# "escape" | "sort"): truncates the path after the named stage with
# DCE-proof outputs ("collect" = the jump path's streaming decision pass,
# or the non-jump path's interval collection). Read at TRACE time —
# profilers must re-jit (and jax.clear_caches()) after changing it.
_FF_STOP = None


@dataclasses.dataclass(frozen=True)
class PRBConfig:
    max_depth: int = -1  # -1 = unlimited (prb:39-42); capped by bounce_cap
    rr_depth: int = -1
    use_nee: bool = True  # prb:48
    use_indirect: bool = True  # prb:49
    hide_emitters: bool = False
    kernel_type: str = "gaussian"
    max_overlaps: int = 32  # interval-window size (prb:59)
    max_windows: int = 8  # window continuations over the collected set
    solver_max_iterations: int = 4  # prb:63
    solver_type: str = "bisection"  # 'bisection' | 'disabled' (prb:64-65)
    phase: str = "isotropic"  # prb:51-53
    phase_g: float = 0.0  # Henyey-Greenstein g when phase == 'hg'
    bounce_cap: int = 64  # static bound when max_depth == -1
    chunk_size: int = 1024  # shadow-ray transmittance chunking
    ray_chunk: int = 65536  # wavefront rays per path-trace chunk (bounds
    #                         the per-bounce working set at large films)
    compact_chunk: int = 1024  # active-ray compaction granularity: each
    #                            bounce sorts live rays to the front and
    #                            processes fixed chunks, skipping all-dead
    #                            chunks entirely (lax.cond). 0 disables.
    # Per-ray Morton-cluster culling for interval collection: candidates
    # come from the nearest intersected clusters instead of scanning every
    # primitive. The round-1 tied-entry-key stall is fixed (collection
    # happens ONCE per bounce and windows select by raw-entry rank with
    # guaranteed progress; see _window_from_collected) and the path is
    # exact up to the collection budget — but it is OFF by default on
    # measured grounds: TPU per-element gathers cost ~5 ns/element, so the
    # gather-based candidate evaluation loses to the regular chunked scan
    # (_gather_intervals) up to ~1M primitives (345 ms vs 35 ms per bounce
    # at 16k rays on smoke). Enable for multi-million-primitive media.
    use_clusters: bool = False
    cluster_size: int = 32
    cluster_candidates: int = 0  # clusters collected per ray per bounce;
    #                              0 = auto (sized to cover collect_budget)
    collect_budget: int = 0  # intervals collected per ray per bounce;
    #                          0 = auto: max(256, max_overlaps*max_windows)
    #                          — 256 is the reference's max_depth_primitive
    #                          default (prb:60). Rays needing more die
    #                          (prb:456-459), exactly like the reference's
    #                          budget kill.
    # Re-collection rounds (round 4, non-jump walk only — the jump path
    # decides escape from the complete streamed density and never needs
    # them): rays pinned at the collection budget RESUME — collection
    # restarts at the pinned distance (straddling intervals re-enter with
    # clamped entries; the window walk already integrates [t_min, t_limit)
    # exactly) and the walk continues with the carried transmittance,
    # like the reference's BVH march which keeps querying as it advances.
    # Rounds with no pinned rays are lax.cond-skipped (one any() reduce),
    # so benign scenes pay nothing; the body is traced once (lax.scan).
    # COMPILE cost (round-4 advisor): the traced graph carries a second
    # full collection+walk (the scan body) on top of the initial one —
    # on remote-compile backends that roughly doubles the prb compile.
    # Set collect_rounds=1 for compile-sensitive configs (restores the
    # single-shot round-3 behavior); each round re-collects over the full
    # chunk wavefront (pending-ray compaction would need a second
    # dynamic-shape machinery for a path that usually cond-skips).
    # Without this, a collect_budget=128 walk on an ~80x-overlapped scene
    # budget-killed 100% of rays (round-4 bench kill metric).
    collect_rounds: int = 8
    # Adaptive per-bounce capacity (round 3): bounces >= tail_after run
    # with these smaller caps (0 = inherit the main cap). Cost per bounce
    # is proportional to collected intervals + walked window capacity;
    # scattered rays (bounce >= 1) start inside the medium and resolve in
    # far fewer intervals than camera rays, so shrinking the tail caps
    # buys large speedups at the price of budget-killing the rare deep
    # ray — the same approximation knob as the reference's
    # max_depth_primitive (prb:60,456-459), applied per bounce.
    tail_after: int = 1
    tail_overlaps: int = 0
    tail_windows: int = 0
    tail_budget: int = 0
    # Block-jump free flight (round 3): collection carries each interval's
    # full optical depth, whose entry-ordered cumulative sum upper-bounds
    # F(t) at block boundaries; the walk jumps straight to the block where
    # exp(-F) crosses the sample and runs only jump_windows windows from
    # there (the 16-window sequential walk's per-window selections +
    # gathers dominated prb, round-3 profiling: free flight was 1.84 s of
    # a 1.5 s frame). Exact: the jump transmittance is the closed-form
    # F(b) (entered full taus minus open-interval tail corrections).
    # Gaussian fast-path + brute collection only; off -> sequential walk.
    jump: bool = True
    jump_windows: int = 4
    # Escape-aware free flight (round 3): with the collected full taus,
    # chi > F(t_eff) decides escape/budget-death in closed form BEFORE any
    # window runs (97% of bench-smoke camera rays escape); the remaining
    # crossing rays are stable-sorted to the front and walked in fixed
    # ff_chunk-ray chunks whose all-escape chunks skip entirely. 0 runs
    # the walk unchunked over the full wavefront.
    ff_chunk: int = 8192
    # Window-walk backend (round 4): "pallas" fuses the whole window loop
    # (selection, segment taus, bisection) into one VMEM-resident kernel
    # (pallas_kernels/ffwalk.py) instead of the per-window XLA pipeline of
    # top-k + gathers + event sort + segment scan. Sampling decisions come
    # from the kernel (stop-gradient by the PRB convention); albedo /
    # density / transmittance are recomputed differentiably at the sample
    # point. Gaussian fast-path kernels only (erf antiderivative); other
    # kernels fall back to "xla". k and the window count are traced SMEM
    # scalars, so capacity configs share ONE Mosaic variant — including
    # the exact no-truncation mode (max_overlaps >= interval_budget,
    # max_windows=1: the whole collected set walks as a single window,
    # infeasible for the XLA path whose segment tensor is [R, 2K-1, K]).
    walk_backend: str = "xla"
    # Coefficient GEMMs (round 4): compute the chunked all-pairs quadric
    # coefficients in the streaming scans (optical_depth escape decision,
    # interval collection, need counting) as [R, 10] x [10, C] HIGHEST-
    # precision matmuls (quadric.pair_coeffs_gemm) instead of the ~45-op
    # elementwise broadcast — the same MXU formulation the fused rf
    # kernels use. Off by default until the TPU A/B (profile_prb
    # coeff=gemm row): numerically it is the fused kernels' precision
    # (HIGHEST = 6 bf16 passes), which can flip rare boundary samples vs
    # the elementwise f32 path.
    coeff_gemm: bool = False

    def tail_cfg(self) -> "PRBConfig":
        if not (self.tail_overlaps or self.tail_windows or self.tail_budget):
            return self
        return dataclasses.replace(
            self,
            max_overlaps=self.tail_overlaps or self.max_overlaps,
            max_windows=self.tail_windows or self.max_windows,
            collect_budget=self.tail_budget or self.collect_budget,
        )

    @property
    def kernel(self) -> Kernel:
        # Forced by the integrator (prb:55-57).
        return Kernel(self.kernel_type, normalized=False, full_range=False)

    @property
    def num_bounces(self) -> int:
        return self.max_depth if self.max_depth > 0 else self.bounce_cap

    @property
    def interval_budget(self) -> int:
        """Intervals collected per ray per bounce (K'); the reference's
        max_depth_primitive budget (prb:60, default 256)."""
        return self.collect_budget or max(
            256, self.max_overlaps * self.max_windows
        )

    @property
    def use_rr(self) -> bool:
        return 0 <= self.rr_depth < (
            self.max_depth if self.max_depth > 0 else 2**31
        )


def _mis_weight(pdf_a: jnp.ndarray, pdf_b: jnp.ndarray) -> jnp.ndarray:
    """Power heuristic (mitsuba.ad.integrators.common.mis_weight)."""
    a2 = pdf_a * pdf_a
    w = a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-30)
    return jnp.where(pdf_a > 0.0, w, 0.0)


def _score_ratio(x: jnp.ndarray, active: jnp.ndarray) -> jnp.ndarray:
    """``x / stop_grad(x)`` — numerically 1, but carries the score gradient
    ``grad(x)/x``.

    This is the JAX-native form of the reference's detached-ratio PRB
    estimators (``dr.replace_grad(1.0, tr) * detach(L/tr)`` at prb:342-344
    and the 'pdf term that cancels out in the weight' at prb:496-497): the
    primal free-flight estimator cancels transmittance and sampling pdf
    analytically, so their parameter derivatives must be re-attached
    explicitly or AD would silently return zero transmittance gradients.
    """
    safe = jnp.where(active, x, 1.0)
    return jnp.where(
        active, safe / jnp.maximum(jax.lax.stop_gradient(safe), 1e-30), 1.0
    )


def _safe_rcp(x: jnp.ndarray) -> jnp.ndarray:
    """common.py:337-338."""
    return jnp.where(x != 0.0, 1.0 / jnp.where(x == 0.0, 1.0, x), 0.0)


def _gather_intervals(
    prims: EllipsoidScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_min: jnp.ndarray,
    k: int,
    chunk_size: int,
    kern: Optional[Kernel] = None,
    coeff_gemm: bool = False,
):
    """Per-ray K nearest [entry, exit) extent-ellipsoid intervals with
    entry >= t_min (entries clamped to t_min for overlapping primitives).

    Returns (entry [R, k] ascending, exit [R, k], ids [R, k], count [R],
    full_tau [R, k] or None). With ``kern`` (Gaussian fast path),
    ``full_tau`` carries each interval's WHOLE optical depth
    sigma_t * D(entry, exit) — one erf pair per candidate at collection
    time — enabling the block-jump free flight (cumulative upper bounds
    on F(t) without per-window re-gathers).
    """
    # pad to a lane tile, not a whole chunk (chunk_size on a smaller
    # scene would multiply the scanned pair count)
    eff_c = min(chunk_size, -(-prims.num_prims // 256) * 256)
    padded = pad_primitives(prims, eff_c)
    n = padded.num_prims
    c = min(eff_c, n)
    n_chunks = n // c
    centers = padded.centers.reshape(n_chunks, c, 3)
    scales = padded.scales.reshape(n_chunks, c, 3)
    quats = padded.quats.reshape(n_chunks, c, 4)
    real = jnp.arange(n).reshape(n_chunks, c) < prims.num_prims
    with_tau = kern is not None
    if with_tau:
        from ..ops import kernels as kernel_ops

        sig_pad = padded.attrs["sigma_t"][:, 0].reshape(n_chunks, c)
        sprod_pad = (
            padded.scales[:, 0] * padded.scales[:, 1] * padded.scales[:, 2]
        ).reshape(n_chunks, c)

    r = o.shape[0]
    inf = jnp.inf
    if coeff_gemm:
        pf_chunks = quadric.prim_features(
            padded.centers, padded.scales, padded.quats
        ).reshape(10, n_chunks, c).transpose(1, 0, 2)
        rayf = quadric.ray_features(o, d)

    def body(carry, inputs):
        best_t, best_exit, best_id, best_tau = carry
        if coeff_gemm:
            chunk_idx, ctr, scl, qt, is_real, sig_c, sp_c, pfc = inputs
            coeffs = quadric.pair_coeffs_gemm(rayf, pfc)
        else:
            chunk_idx, ctr, scl, qt, is_real, sig_c, sp_c = inputs
            coeffs = quadric.ray_prim_coeffs(o, d, ctr, scl, qt)
        valid, t_near, t_far = quadric.intersect_extent(coeffs, padded.extent)
        valid = valid & is_real[None, :]
        # Segment partitions are detached (PRB convention: sampling geometry
        # carries no parameter derivatives; the partition-point gradients
        # telescope away anyway).
        t_near = jax.lax.stop_gradient(t_near)
        t_far = jax.lax.stop_gradient(t_far)
        entry = jnp.maximum(t_near, t_min[:, None])
        valid = valid & (t_far > t_min[:, None])
        entry = jnp.where(valid, entry, inf)
        # ONE top_k per chunk over [best | chunk] directly — a per-chunk
        # pre-select + merge doubled the (sort-bound) top_k call count,
        # which dominated collection at smoke scale (round-3 profiling)
        ids = jnp.broadcast_to(
            chunk_idx * c + jnp.arange(c, dtype=jnp.int32), entry.shape
        )
        cand_t = jnp.concatenate([best_t, entry], axis=-1)
        cand_exit = jnp.concatenate(
            [best_exit, jnp.where(valid, t_far, inf)], axis=-1
        )
        cand_id = jnp.concatenate([best_id, ids], axis=-1)
        neg_t2, sel = jax.lax.top_k(-cand_t, k)
        if with_tau:
            tau_c = sig_c[None, :] * kernel_ops.gaussian_integral_segment(
                coeffs, sp_c[None, :], entry, t_far, valid
            )
            cand_tau = jnp.concatenate([best_tau, tau_c], axis=-1)
            tau_out = jnp.take_along_axis(cand_tau, sel, axis=-1)
        else:
            tau_out = best_tau
        return (
            -neg_t2,
            jnp.take_along_axis(cand_exit, sel, axis=-1),
            jnp.take_along_axis(cand_id, sel, axis=-1),
            tau_out,
        ), None

    init = (
        jnp.full((r, k), inf, o.dtype),
        jnp.full((r, k), inf, o.dtype),
        jnp.zeros((r, k), jnp.int32),
        jnp.zeros((r, k), o.dtype),
    )
    if with_tau:
        xs = (jnp.arange(n_chunks), centers, scales, quats, real,
              sig_pad, sprod_pad)
    else:
        zero_c = jnp.zeros((n_chunks, c), o.dtype)
        xs = (jnp.arange(n_chunks), centers, scales, quats, real,
              zero_c, zero_c)
    if coeff_gemm:
        xs = xs + (pf_chunks,)
    (entry, exit_t, ids, full_tau), _ = jax.lax.scan(body, init, xs)
    count = jnp.sum(jnp.isfinite(entry), axis=-1)
    return entry, exit_t, ids, count, (full_tau if with_tau else None)


def _collect_intervals(
    primitives: EllipsoidScene,
    index,
    o: jnp.ndarray,
    d: jnp.ndarray,
    cfg: "PRBConfig",
    t_start: Optional[jnp.ndarray] = None,
):
    """All per-bounce interval collection, ONCE per bounce (round-2 design).

    Collects the ``kp = cfg.interval_budget`` nearest [entry, exit)
    extent-ellipsoid intervals per ray from t = 0, either through the
    Morton-cluster hierarchy (per-ray sphere culling of [R, N/cs] clusters,
    expansion of the nearest clusters, exact quadrics on the candidates) or
    by the brute-force streaming top-k. Windows then *select* from this set
    (:func:`_window_from_collected`) instead of rescanning primitives.

    Returns (entry [R, kp] ascending by raw entry, exit [R, kp], ids
    [R, kp] into the work scene, t_budget [R], full_tau [R, kp] or None).
    ``t_budget`` is the distance beyond which the collection is incomplete
    (the budget overflow bound — finite only when more geometry exists
    than fits the budget; rays that reach it unresolved die, like the
    reference's max_depth_primitive cap, prb:456-459). ``full_tau``
    (brute path + Gaussian fast kernel only) carries per-interval whole
    optical depths for the block-jump walk.
    """
    kp = cfg.interval_budget
    r = o.shape[0]
    inf = jnp.inf
    # Resumable collection (round 4): t_start [R] collects the kp nearest
    # intervals with exit > t_start, entries clamped to t_start —
    # re-collection rounds continue a budget-pinned walk from where it
    # stopped. None/zeros = the original from-the-origin collection.
    if t_start is None:
        t_start = jnp.zeros((r,), o.dtype)

    if not cfg.use_clusters:
        kern = cfg.kernel
        fast = (
            kern.type == "gaussian" and not kern.normalized
            and not kern.full_range
        )
        entry, exit_t, ids, count, full_tau = _gather_intervals(
            primitives, o, d, t_start, kp, cfg.chunk_size,
            kern=kern if fast else None, coeff_gemm=cfg.coeff_gemm,
        )
        t_budget = jnp.where(count >= kp, entry[:, -1], inf)
        return entry, exit_t, ids, t_budget, full_tau

    prims = index.prims
    cs = index.cluster_size
    ncl = index.centers.shape[0]

    # ---- cluster culling (component-wise; no [R, Ncl, 3] temporary) ------
    vx = index.centers[None, :, 0] - o[:, 0:1]
    vy = index.centers[None, :, 1] - o[:, 1:2]
    vz = index.centers[None, :, 2] - o[:, 2:3]
    depth = vx * d[:, 0:1] + vy * d[:, 1:2] + vz * d[:, 2:3]
    closest2 = vx * vx + vy * vy + vz * vz - depth * depth
    radii = index.radii[None, :]
    ts = t_start[:, None]
    hit = (closest2 <= radii * radii) & (depth + radii > ts)
    ekey = jnp.where(hit, jnp.maximum(depth - radii, ts), inf)

    # Auto-sizing (round-4 rework): two lower bounds matter.
    # (a) Interval coverage: the kp nearest intervals spread over
    #     ~kp/(cs * hit-fraction) clusters — but the per-cluster hit
    #     fraction is scene-dependent and can be ~0.6% (80x-overlapped
    #     smoke copies: tiny prims, fat cluster spheres), not the ~1/3 a
    #     compact scene gives, so a coverage-only formula collected ZERO
    #     intervals there (round-4 bench kill metric).
    # (b) March progress: re-collection rounds advance past t only when
    #     every cluster sphere STRADDLING t is selected (an excluded
    #     straddler pins t_budget_cl at t); measured straddler maxima are
    #     68 (66k stress scene) / 126 (1M), so the floor buys 4096//cs
    #     = 128 clusters (cs 32). Denser media stall honestly (the
    #     rounds' no-progress guard kills those rays — visible in the
    #     kill-fraction metrics, not silently biased). Candidates stream
    #     in bounded groups, so a generous floor costs compute linear in
    #     k_cl, never memory; cluster_candidates overrides.
    k_cl = cfg.cluster_candidates or max(
        8, -(-3 * kp // cs), -(-4096 // cs)
    )
    k_cl = min(k_cl, ncl)
    kk = min(k_cl + 1, ncl)  # +1 row learns the exact overflow bound
    neg, sel_all = jax.lax.top_k(-ekey, kk)
    keys_sorted = -neg
    cl_sel = sel_all[:, :k_cl]
    cl_valid = jnp.isfinite(keys_sorted[:, :k_cl])
    if kk > k_cl:
        # entry bound of the nearest culled-out cluster (a lower bound on
        # its members' entries -> a valid conservative budget)
        t_budget_cl = keys_sorted[:, k_cl]
    else:
        t_budget_cl = jnp.full((r,), inf, o.dtype)

    # ---- exact intervals, streamed over cluster groups -------------------
    # A one-shot [R, k_cl*cs] candidate evaluation materializes [R, C, 3, 3]
    # rotation matrices and OOMs at film scale; stream groups of ~256
    # candidates with a running top-kp merge instead (bounded memory).
    g = max(1, 256 // cs)
    n_groups = -(-k_cl // g)
    if k_cl % g:
        pad_k = n_groups * g - k_cl
        cl_sel = jnp.pad(cl_sel, ((0, 0), (0, pad_k)))
        cl_valid = jnp.pad(cl_valid, ((0, 0), (0, pad_k)))
    offs = jnp.arange(cs, dtype=cl_sel.dtype)

    def group_body(carry, gi):
        entry_k, exit_k, ids_k = carry
        sel_g = jax.lax.dynamic_slice_in_dim(cl_sel, gi * g, g, 1)
        val_g = jax.lax.dynamic_slice_in_dim(cl_valid, gi * g, g, 1)
        cand = (sel_g[..., None] * cs + offs).reshape(r, g * cs)
        cand_valid = jnp.broadcast_to(
            val_g[..., None], (r, g, cs)
        ).reshape(r, g * cs)
        coeffs = quadric.pair_coeffs_gathered(
            o, d, prims.centers, prims.scales, prims.quats, cand
        )
        valid, t_near, t_far = quadric.intersect_extent(coeffs, prims.extent)
        t_near = jax.lax.stop_gradient(t_near)
        t_far = jax.lax.stop_gradient(t_far)
        valid = valid & cand_valid & (t_far > ts[:, 0:1])
        entry = jnp.where(valid, jnp.maximum(t_near, ts[:, 0:1]), inf)
        cat_e = jnp.concatenate([entry_k, entry], axis=-1)
        cat_x = jnp.concatenate(
            [exit_k, jnp.where(valid, t_far, inf)], axis=-1
        )
        cat_i = jnp.concatenate([ids_k, cand], axis=-1)
        neg_t, sel = jax.lax.top_k(-cat_e, kp)
        return (
            -neg_t,
            jnp.take_along_axis(cat_x, sel, axis=-1),
            jnp.take_along_axis(cat_i, sel, axis=-1),
        ), None

    init = (
        jnp.full((r, kp), inf, o.dtype),
        jnp.full((r, kp), inf, o.dtype),
        jnp.zeros((r, kp), cl_sel.dtype),
    )
    (entry_k, exit_k, ids_k), _ = jax.lax.scan(
        group_body, init, jnp.arange(n_groups)
    )
    count = jnp.sum(jnp.isfinite(entry_k), axis=-1)
    t_budget = jnp.minimum(
        jnp.where(count >= kp, entry_k[:, kp - 1], inf), t_budget_cl
    )
    return entry_k, exit_k, ids_k, t_budget, None


def _window_from_collected(
    entry_all: jnp.ndarray,  # [R, K'] ascending by raw entry
    exit_all: jnp.ndarray,  # [R, K']
    t_min: jnp.ndarray,  # [R]
    k: int,
):
    """Select one window of K intervals from the precollected set.

    The window set is the first K *open* intervals (exit > t_min) in raw
    entry order — which equals the (clamped-entry, raw-entry) lexicographic
    order, so the round-1 tied-entry-key stall cannot occur: selection is by
    rank, not by clamped key. The window end is the entry of the (K+1)-th
    open interval; when that interval already overlaps t_min (more than K
    simultaneous overlaps — beyond the reference's dr.Local overlap-stack
    capacity too, common.py:428-441), its density is dropped until the
    earliest kept exit so the walk always advances strictly past t_min.

    Returns (entry [R,K] clamped to t_min, exit [R,K], sel [R,K] positions
    into the collected arrays, valid_sel [R,K], t_limit [R], has_more [R]).
    """
    kp = entry_all.shape[1]
    inf = jnp.inf
    open_ = jnp.isfinite(entry_all) & (exit_all > t_min[:, None])
    pos = jnp.cumsum(open_.astype(jnp.int32), axis=-1)
    rank = jnp.where(open_, pos, kp + 2)
    selkey = jnp.where(rank <= k, rank, kp + 2)
    neg, sel = jax.lax.top_k(-selkey, k)  # ranks 1..k ascending
    valid_sel = (-neg) <= k
    entry_w = jnp.where(
        valid_sel,
        jnp.maximum(
            jnp.take_along_axis(entry_all, sel, axis=-1), t_min[:, None]
        ),
        inf,
    )
    exit_w = jnp.where(
        valid_sel, jnp.take_along_axis(exit_all, sel, axis=-1), inf
    )
    nxt = jnp.min(jnp.where(rank == k + 1, entry_all, inf), axis=-1)
    has_more = jnp.isfinite(nxt)
    min_exit = jnp.min(exit_w, axis=-1)  # > t_min whenever anything selected
    t_limit = jnp.where(
        has_more, jnp.where(nxt > t_min, nxt, min_exit), inf
    )
    return entry_w, exit_w, sel, valid_sel, t_limit, has_more


def _free_flight_window(
    kern: Kernel,
    entry: jnp.ndarray,  # [R, K] ascending
    exit_t: jnp.ndarray,  # [R, K]
    coeffs: quadric.QuadricCoeffs,  # [R, K] per gathered pair
    sigma_t: jnp.ndarray,  # [R, K]
    s_prod: jnp.ndarray,  # [R, K]
    t_limit: jnp.ndarray,  # [R] window end (inf when window complete)
    trans: jnp.ndarray,  # [R] running transmittance at window start
    xi: jnp.ndarray,  # [R] free-flight sample
    active: jnp.ndarray,  # [R]
    solver_iters: int,
    solver_type: str,
):
    """Walk the sorted boundary segments of one interval window.

    Returns (trans_out, found, t_sampled, trans_at_sample). Mirrors
    sample_segment (prb:513-557) + the bisection solver (prb:559-654),
    but fully vectorized: all 2K-1 segments' optical depths are evaluated
    at once ([R, S, K] broadcast), the crossing segment is located with a
    cumulative sum + argmax, and the bisection runs once per ray on the
    selected segment — instead of the reference's (and a naive wavefront's)
    sequential per-segment march.

    ``trans_at_sample`` is the *differentiable* transmittance T(0 -> t_s)
    needed for the score-ratio gradient estimator.
    """
    k = entry.shape[1]
    s = 2 * k - 1
    events = jnp.sort(jnp.concatenate([entry, exit_t], axis=-1), axis=-1)
    # Clamp segments at the window end rather than dropping them: t_limit is
    # usually an event boundary (an interval entry/exit), but it can also be
    # a cluster-budget bound or a surface hit distance that falls strictly
    # inside a segment — the walk must still cover [start, t_limit) exactly.
    t0s = jnp.minimum(events[:, :-1], t_limit[:, None])  # [R, S]
    t1s = jnp.minimum(events[:, 1:], t_limit[:, None])
    valid_seg = (
        jnp.isfinite(t1s) & (t1s > t0s) & active[:, None]
    )

    # tau of every segment at once. Gaussian fast path: shared-boundary
    # antiderivative (1 erf per event-pair, per-pair constants hoisted off
    # the segment axis) instead of broadcasting density_integral to
    # [R, S, K] (2 erf + exp + sqrt per segment-pair); also integrates
    # partial segment coverage exactly instead of by midpoint membership.
    fast = kern.type == "gaussian" and not kern.normalized \
        and not kern.full_range
    if fast:
        from ..ops import kernels as kernel_ops

        ev = jnp.minimum(events, t_limit[:, None])  # [R, 2K]
        tau_seg = jnp.where(
            valid_seg,
            jnp.maximum(
                kernel_ops.gaussian_segment_taus(
                    coeffs, s_prod, sigma_t, entry, exit_t, ev
                ),
                0.0,
            ),
            0.0,
        )  # [R, S]

        def tau_partial(t0, tt):
            # same clamped antiderivative as tau_seg, so the in-segment CDF
            # integrates exactly to the segment total used for selection
            return kernel_ops.gaussian_segment_taus(
                coeffs, s_prod, sigma_t, entry, exit_t,
                jnp.stack([t0, tt], axis=-1),
            )[:, 0]
    else:
        mids = 0.5 * (t0s + t1s)
        cover = (entry[:, None, :] <= mids[:, :, None]) & (
            exit_t[:, None, :] >= mids[:, :, None]
        )  # [R, S, K]
        c3 = quadric.QuadricCoeffs(
            coeffs.a[:, None, :], coeffs.b[:, None, :], coeffs.c[:, None, :]
        )
        dens = kern.density_integral(
            c3, s_prod[:, None, :], None, 0.0,
            t0s[:, :, None], t1s[:, :, None], cover,
        )
        tau_seg = jnp.where(
            valid_seg, jnp.sum(dens * sigma_t[:, None, :], axis=-1), 0.0
        )  # [R, S]

    cum_excl = jnp.cumsum(tau_seg, axis=-1) - tau_seg
    t_start = trans[:, None] * jnp.exp(-cum_excl)  # T at segment start
    t_end = t_start * jnp.exp(-tau_seg)
    success_s = valid_seg & (jax.lax.stop_gradient(t_end) < xi[:, None])
    found = jnp.any(success_s, axis=-1)
    sel = jnp.argmax(success_s, axis=-1)  # first crossing segment

    # running transmittance after the whole window (for unfound rays)
    trans_out = jnp.where(
        active, trans * jnp.exp(-jnp.sum(tau_seg, axis=-1)), trans
    )

    # ---- solve within the selected segment (prb:559-654) -----------------
    r_idx = jnp.arange(entry.shape[0])
    t0 = t0s[r_idx, sel]
    t1 = t1s[r_idx, sel]
    trans_c = t_start[r_idx, sel]
    chi = -jnp.log(
        jnp.maximum(
            xi / jnp.maximum(jax.lax.stop_gradient(trans_c), 1e-30), 1e-30
        )
    )

    if not fast:
        cover_sel = cover[r_idx, sel]  # [R, K]

        def tau_partial(t0_, tt):
            dpart = kern.density_integral(
                coeffs, s_prod, None, 0.0, t0_[:, None], tt[:, None],
                cover_sel,
            )
            return jnp.sum(dpart * sigma_t, axis=-1)

    if solver_type == "disabled":
        ts = 0.5 * (t0 + t1)  # prb:545-548
    else:
        def body(i, tt):
            tau = tau_partial(t0, tt)
            step = (t1 - t0) / (2.0 ** (i.astype(t0.dtype) + 2.0))
            tt = jnp.where(tau > chi, tt - step, tt + step)
            return jnp.clip(tt, t0, t1)

        ts = jax.lax.fori_loop(0, solver_iters, body, 0.5 * (t0 + t1))
    ts = jax.lax.stop_gradient(jnp.where(found, ts, 0.0))

    # Differentiable partial transmittance T(0 -> t_s) for the score.
    tau_part = tau_partial(t0, ts)
    trans_samp = jnp.where(found, trans_c * jnp.exp(-tau_part), 1.0)
    t_samp = jnp.where(found, ts, jnp.inf)
    trans_out = jnp.where(found, trans_c, trans_out)
    return trans_out, found, t_samp, trans_samp


def count_intervals(
    primitives: EllipsoidScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    chunk_size: int = 65536,
    coeff_gemm: bool = False,
) -> jnp.ndarray:
    """Per-ray count of entered extent ellipsoids — the quantity
    ``collect_budget`` caps. A pure chunked counting scan (no gathers, no
    top-k): ~10x cheaper than a collection pass, used to SIZE the budgets
    (see :func:`suggest_budgets`)."""
    eff_c = min(chunk_size, -(-primitives.num_prims // 256) * 256)
    padded = pad_primitives(primitives, eff_c)
    n = padded.num_prims
    c = min(eff_c, n)
    centers = padded.centers.reshape(n // c, c, 3)
    scales = padded.scales.reshape(n // c, c, 3)
    quats = padded.quats.reshape(n // c, c, 4)
    real = jnp.arange(n).reshape(n // c, c) < primitives.num_prims
    if coeff_gemm:
        pf_chunks = quadric.prim_features(
            padded.centers, padded.scales, padded.quats
        ).reshape(10, n // c, c).transpose(1, 0, 2)
        rayf = quadric.ray_features(o, d)

    def body(acc, inputs):
        if coeff_gemm:
            ctr, scl, qt, is_real, pfc = inputs
            coeffs = quadric.pair_coeffs_gemm(rayf, pfc)
        else:
            ctr, scl, qt, is_real = inputs
            coeffs = quadric.ray_prim_coeffs(o, d, ctr, scl, qt)
        valid, _, t_far = quadric.intersect_extent(coeffs, padded.extent)
        valid = valid & is_real[None, :] & (t_far > 0.0)
        return acc + jnp.sum(valid, axis=-1, dtype=jnp.int32), None

    xs = (centers, scales, quats, real)
    if coeff_gemm:
        xs = xs + (pf_chunks,)
    acc, _ = jax.lax.scan(
        body, jnp.zeros((o.shape[0],), jnp.int32), xs
    )
    return acc


def suggest_budgets(
    primitives: EllipsoidScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    cfg: PRBConfig,
    percentile: float = 99.9,
    sample_rays: int = 4096,
    seed: int = 0,
) -> PRBConfig:
    """Auto-size collection budgets from MEASURED per-ray need (round-4
    verdict #7 — the same need-fit discipline that fixed the 2M rf budget
    ladder). Counts entered ellipsoids on a ray subsample and returns a
    config copy with

    - ``collect_budget`` >= the given need percentile (rounded up to a
      multiple of 16 — replacing any hand-set value in either direction:
      oversized budgets are pure walked-capacity cost), and
    - ``max_windows`` sized so the window walk can consume the whole
      budget (ceil(budget / max_overlaps) + 2 slack — windows advance by
      at least one interval each).

    Rays above the percentile still budget-die exactly like the
    reference's ``max_depth_primitive`` cap (prb:60, 456-459); the kill
    fraction is at most 1 - percentile/100 by construction on primary
    rays, and scattered bounces need strictly less (tail caps,
    PRBConfig.tail_*). Measured on the smoke bench scene (256^2 primary):
    need p50=0 p99=47 p99.9=59 max=71 -> budget 64 vs the hand-set 128 —
    the same value round 3 found by manual sweep (budget 128 -> 64 saved
    130 of 462 ms of bounce-chunk collection).
    """
    import numpy as np

    r = o.shape[0]
    if r > sample_rays:
        idx = np.random.default_rng(seed).choice(r, sample_rays, False)
        o, d = o[idx], d[idx]
    need = np.asarray(
        count_intervals(
            primitives, o, d, cfg.chunk_size, coeff_gemm=cfg.coeff_gemm
        )
    )
    b = int(np.percentile(need, percentile))
    budget = max(16, -(-b // 16) * 16)
    windows = max(cfg.max_windows, -(-budget // cfg.max_overlaps) + 2)
    return dataclasses.replace(
        cfg, collect_budget=budget, max_windows=windows
    )


def _chunk_for(r: int, cap: int) -> int:
    """Largest divisor of ``r`` that is <= min(cap, r // 8) (>= 128), or 0
    when no useful chunking exists. Sub-wavefront compaction pays only
    when several chunks can skip; processing fewer than 8 chunks of at
    least 128 rays keeps the vector units busy while letting ~7/8 of the
    wavefront skip the walk."""
    if not cap or r < 1024:
        return 0
    target = min(cap, r // 8)
    for w in range(target, 127, -1):
        if r % w == 0:
            return w
    return 0


def build_ff_index(primitives: EllipsoidScene, cfg: PRBConfig):
    """Morton-cluster index for free-flight interval gathering (build once
    per scene/bounce-loop, not per window)."""
    from ..accel import clusters as cl
    from .base import pad_primitives

    return cl.build_clusters(
        pad_primitives(primitives, cfg.cluster_size), cfg.cluster_size,
        num_real=primitives.num_prims,
    )


def free_flight(
    primitives: EllipsoidScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    xi: jnp.ndarray,
    cfg: PRBConfig,
    active: jnp.ndarray,
    index=None,
    t_max=None,
):
    """Sample a medium interaction along each ray (exact inverse-CDF over the
    piecewise multi-primitive density).

    Returns (found [R], dead [R], t_samp [R], albedo [R, 3],
    score_found [R], score_escape [R]).

    ``dead`` marks rays that exhausted the window budget before resolving
    (the reference kills such paths via max_depth_primitive, prb:456-459).
    The two score factors are numerically 1 but carry the gradients of the
    sampling density / survival probability (see :func:`_score_ratio`).

    ``t_max`` [R] (optional) caps the march at a surface hit: rays reaching
    it unresolved count as *escaped* with the transmittance integrated over
    exactly [0, t_max] — the reference's march-to-``si.t`` behavior
    (common.py:461-466, volprim_prb.py:134-137).
    """
    primitives.require_attrs(["sigma_t", "albedo"])
    # Two paths (round 3): the default jump path (Gaussian fast kernel +
    # brute scan) decides escape from a streaming complete-density sweep
    # and collects intervals only inside needy-ray chunks; every other
    # configuration (clusters, Epanechnikov, jump=False) pre-collects
    # once and runs the sequential window walk.
    kern = cfg.kernel
    k = cfg.max_overlaps
    r = o.shape[0]

    if cfg.use_clusters and index is None:
        index = build_ff_index(primitives, cfg)
    work = index.prims if cfg.use_clusters else primitives

    sig_all = work.attrs["sigma_t"][:, 0]
    alb_all = work.attrs["albedo"]
    sprod_all = work.scales[:, 0] * work.scales[:, 1] * work.scales[:, 2]
    t_cap = jnp.full((r,), jnp.inf, o.dtype) if t_max is None else t_max

    # Path selection (round 3): the jump path (brute collection + Gaussian
    # fast kernel) no longer pre-collects intervals at all — escape is
    # decided from a streaming complete-density sweep and collection
    # happens per needy-ray chunk below. Every other configuration
    # collects ONCE per bounce and windows select from the precollected
    # set (round-2 design; see _collect_intervals).
    kern_fast = (
        kern.type == "gaussian" and not kern.normalized
        and not kern.full_range
    )
    use_jump = cfg.jump and not cfg.use_clusters and kern_fast
    if not use_jump:
        entry_all, exit_all, ids_all, t_budget, full_tau = (
            _collect_intervals(primitives, index, o, d, cfg)
        )

    # ---- generic window walk over an (optionally chunked) wavefront ------
    def _run_windows(
        o_w, d_w, xi_w, entry_w, exit_w, ids_w, t_budget_w, t_cap_w,
        act_w, t_min0, trans0, n_windows,
    ):
        rw = o_w.shape[0]

        def window_step(carry, _):
            # Skip the whole window (selection + segment scan) once every
            # ray is resolved or budget-dead — the common case after the
            # first window.
            pred = jnp.any(act_w & ~carry[3] & ~carry[4])
            return jax.lax.cond(pred, _window_body, lambda c: c, carry), None

        def _window_body(carry):
            (t_min, trans, found, resolved, bdead, t_samp, albedo,
             density_at_sample) = carry
            win_active = act_w & ~resolved & ~bdead
            entry, exit_t, sel, valid_sel, t_limit, has_more = (
                _window_from_collected(entry_w, exit_w, t_min, k)
            )
            ids = jnp.take_along_axis(ids_w, sel, axis=-1)
            coeffs = quadric.pair_coeffs_gathered(
                o_w, d_w, work.centers, work.scales, work.quats, ids
            )
            sigma_t = jnp.where(valid_sel, sig_all[ids], 0.0)
            s_prod = sprod_all[ids]
            # The walk may not pass the collection budget: density beyond
            # it is unknown. Rays pinned at the budget die (reference
            # max_depth_primitive semantics). A surface cap (t_cap) instead
            # *resolves* the ray when reached.
            t_limit = jnp.minimum(t_limit, t_budget_w)
            hit_cap = t_limit >= t_cap_w
            t_limit = jnp.minimum(t_limit, t_cap_w)
            full = has_more | jnp.isfinite(t_budget_w)

            trans_new, found_w, ts_w, trans_samp = _free_flight_window(
                kern, entry, exit_t, coeffs, sigma_t, s_prod, t_limit,
                trans, xi_w, win_active,
                cfg.solver_max_iterations, cfg.solver_type,
            )

            # Albedo at newly found interactions (prb:434-511, primal
            # estimator; the reference's 3-term manual adjoint is exact AD
            # here plus the score factor below).
            new_found = win_active & found_w
            q_at = (
                coeffs.a * ts_w[:, None] + 2.0 * coeffs.b
            ) * ts_w[:, None] + coeffs.c
            cover = (entry <= ts_w[:, None]) & (exit_t >= ts_w[:, None])
            pdf_j = jnp.where(cover, kern.pdf_q(q_at, s_prod) * sigma_t, 0.0)
            accum_pdf = jnp.sum(pdf_j, axis=-1)
            # per-channel gathers: a gathered [R, K, 3] pads 42x on TPU
            accum_alb = jnp.stack(
                [jnp.sum(pdf_j * alb_all[:, ch][ids], axis=-1)
                 for ch in range(3)],
                axis=-1,
            )
            alb_w = accum_alb * _safe_rcp(accum_pdf)[:, None]

            trans = jnp.where(win_active, trans_new, trans)
            t_samp = jnp.where(new_found, ts_w, t_samp)
            albedo = jnp.where(new_found[:, None], alb_w, albedo)
            # Sampling density at the interaction: sum_j sigma_t_j pdf_j(t_s)
            # times T(0 -> t_s) — both differentiable.
            density_at_sample = jnp.where(
                new_found, accum_pdf * trans_samp, density_at_sample
            )
            found = found | new_found
            resolved = resolved | found | (
                win_active & ~found_w & (~full | hit_cap)
            )
            # pinned at the budget: no further progress is possible
            # within THIS collection (re-collection rounds resume there)
            bdead = bdead | (
                win_active & ~found_w & full & ~hit_cap
                & (t_limit >= t_budget_w)
            )
            # advance unresolved rays INCLUDING newly-pinned ones: trans
            # is integrated to t_limit either way, so t_min is the exact
            # resume point for the re-collection rounds
            t_min = jnp.where(win_active & ~resolved, t_limit, t_min)
            return (
                t_min, trans, found, resolved, bdead, t_samp, albedo,
                density_at_sample,
            )

        init = (
            t_min0,  # t_min (0, or the jump block's boundary)
            trans0,  # trans (1, or exp(-F) at the jump boundary)
            jnp.zeros((rw,), bool),  # found
            jnp.zeros((rw,), bool),  # resolved (found or confirmed escape)
            jnp.zeros((rw,), bool),  # bdead (pinned at collection budget)
            jnp.full((rw,), jnp.inf, o_w.dtype),  # t_samp
            jnp.zeros((rw, 3), o_w.dtype),  # albedo
            jnp.ones((rw,), o_w.dtype),  # density_at_sample (diff. pdf)
        )
        (t_min, trans, found, resolved, bdead, t_samp, albedo,
         density_at_sample), _ = (
            jax.lax.scan(window_step, init, None, length=n_windows)
        )
        # t_min is the exact stop position of every unresolved ray (trans
        # is integrated to it) — the re-collection rounds' resume point.
        return (
            found, resolved, bdead, t_samp, albedo, density_at_sample,
            trans, t_min,
        )

    # ---- exact F(t) at a point: entered full taus minus the still-open
    # intervals' beyond-t tails (the open set is the <= K intervals a
    # window would select; >K simultaneous overlaps lose their tail here
    # exactly like the walk drops their density) ------------------------
    def _f_exact_at(o_w, d_w, entry_w, exit_w, ids_w, tau_fin_w, t_pt):
        from ..ops import kernels as kernel_ops

        fin_w = jnp.isfinite(entry_w)
        entered = fin_w & (entry_w < t_pt[:, None])
        f_entered = jnp.sum(jnp.where(entered, tau_fin_w, 0.0), axis=-1)
        _, _, sel_w, valid_w, _, _ = _window_from_collected(
            entry_w, exit_w, t_pt, k
        )
        raw_entry_w = jnp.take_along_axis(entry_w, sel_w, axis=-1)
        opened = valid_w & (raw_entry_w < t_pt[:, None])
        ids_s = jnp.take_along_axis(ids_w, sel_w, axis=-1)
        coeffs_w = quadric.pair_coeffs_gathered(
            o_w, d_w, work.centers, work.scales, work.quats, ids_s
        )
        sig_w = jnp.where(opened, sig_all[ids_s], 0.0)
        sp_w = sprod_all[ids_s]
        tau_full_w = jnp.where(
            opened,
            jnp.take_along_axis(tau_fin_w, sel_w, axis=-1), 0.0,
        )
        tau_part_w = sig_w * kernel_ops.gaussian_integral_segment(
            coeffs_w, sp_w, raw_entry_w,
            jnp.broadcast_to(t_pt[:, None], raw_entry_w.shape), opened,
        )
        return f_entered - jnp.sum(
            jnp.maximum(tau_full_w - tau_part_w, 0.0), axis=-1
        )

    # ---- fused Pallas window walk (round 4, opt-in) ----------------------
    # Same signature/outputs as _run_windows; the sequential window loop
    # (selection + gathers + event sort + segment scan + bisection,
    # reference volprim_prb.py:513-654) runs as ONE VMEM-resident kernel
    # over the precollected table. The kernel returns sampling decisions
    # only (stop-gradient, PRB convention); albedo / sampling density /
    # transmittance are recomputed differentiably at the sample point via
    # the same closed forms the jump path uses (_f_exact_at).
    def _run_windows_pallas(
        o_w, d_w, xi_w, entry_w, exit_w, ids_w, t_budget_w, t_cap_w,
        act_w, t_min0, trans0, n_windows,
    ):
        from ..ops import kernels as kernel_ops
        from ..pallas_kernels import ffwalk

        fin = jnp.isfinite(entry_w)
        # Per-interval antiderivative columns: tau over [x, y] of interval
        # j is cp_j * (erf(alpha_j*y + beta_j) - erf(alpha_j*x + beta_j))
        # (ops.kernels.gaussian_segment_taus form). Differentiable here;
        # the kernel stop-grads its copies.
        coeffs_all = quadric.pair_coeffs_gathered(
            o_w, d_w, work.centers, work.scales, work.quats, ids_w
        )
        sig_w = jnp.where(fin, sig_all[ids_w], 0.0)
        sp_w = sprod_all[ids_w]
        a = coeffs_all.a
        cp = jnp.where(
            fin,
            jnp.exp(-0.5 * kernel_ops.gaussian_q_min(coeffs_all))
            / (4.0 * jnp.pi * sp_w * jnp.sqrt(a))
            * sig_w,
            0.0,
        )
        alpha = jnp.where(fin, jnp.sqrt(0.5 * a), 1.0)
        beta = jnp.where(fin, coeffs_all.b / jnp.sqrt(2.0 * a), 0.0)
        chi = jnp.log(
            jnp.maximum(jax.lax.stop_gradient(trans0), 1e-30)
        ) - jnp.log(jnp.maximum(jax.lax.stop_gradient(xi_w), 1e-30))

        found, resolved, bdead, capres, t_samp = ffwalk.walk(
            entry_w, exit_w, cp, alpha, beta, chi, t_budget_w, t_cap_w,
            act_w, t_min0,
            k=k, n_windows=n_windows,
            solver_iters=cfg.solver_max_iterations,
            solver_disabled=cfg.solver_type == "disabled",
            interpret=jax.default_backend() != "tpu",
        )
        found = found & act_w
        resolved = resolved & act_w
        bdead = bdead & act_w

        # Differentiable full-interval taus for _f_exact_at (same quantity
        # collection's full_tau carries; recomputed so gradients flow).
        e_safe = jnp.where(fin, entry_w, 0.0)
        x_safe = jnp.where(fin, exit_w, 0.0)
        tau_fin = jnp.where(
            fin,
            jnp.maximum(
                cp * (
                    jax.scipy.special.erf(alpha * x_safe + beta)
                    - jax.scipy.special.erf(alpha * e_safe + beta)
                ),
                0.0,
            ),
            0.0,
        )

        # Albedo + sampling density at the sample point (mirrors
        # _window_body's accumulation over the covering window).
        ts_safe = jnp.where(found, t_samp, 1.0)
        entry_s, exit_s, sel_s, valid_s, _, _ = _window_from_collected(
            entry_w, exit_w, ts_safe, k
        )
        ids_s = jnp.take_along_axis(ids_w, sel_s, axis=-1)
        coeffs_s = quadric.pair_coeffs_gathered(
            o_w, d_w, work.centers, work.scales, work.quats, ids_s
        )
        sig_s = jnp.where(valid_s, sig_all[ids_s], 0.0)
        sp_s = sprod_all[ids_s]
        q_at = (
            coeffs_s.a * ts_safe[:, None] + 2.0 * coeffs_s.b
        ) * ts_safe[:, None] + coeffs_s.c
        cover = (entry_s <= ts_safe[:, None]) & (exit_s >= ts_safe[:, None])
        pdf_j = jnp.where(cover, kern.pdf_q(q_at, sp_s) * sig_s, 0.0)
        accum_pdf = jnp.sum(pdf_j, axis=-1)
        accum_alb = jnp.stack(
            [jnp.sum(pdf_j * alb_all[:, ch][ids_s], axis=-1)
             for ch in range(3)],
            axis=-1,
        )
        alb_w = accum_alb * _safe_rcp(accum_pdf)[:, None]
        f_ts = _f_exact_at(o_w, d_w, entry_w, exit_w, ids_w, tau_fin, ts_safe)
        trans_samp = jnp.exp(-jnp.maximum(f_ts, 0.0))
        density_at_sample = jnp.where(found, accum_pdf * trans_samp, 1.0)
        albedo = jnp.where(found[:, None], alb_w, 0.0)

        # Escape transmittance: F at the resolve point (t_cap for surface-
        # capped rays, beyond every interval for full escapes).
        esc = resolved & ~found
        t_res = jnp.where(capres, t_cap_w, 1e15)
        f_res = _f_exact_at(
            o_w, d_w, entry_w, exit_w, ids_w, tau_fin,
            jnp.where(esc, t_res, 1.0),
        )
        trans = jnp.where(esc, jnp.exp(-jnp.maximum(f_res, 0.0)), 1.0)
        # 8th output (resume point): the kernel does not expose its final
        # walk position, and this wrapper's trans/escape recomputation
        # assumes the table covers the density from t = 0 — so the
        # re-collection rounds are gated off for this backend (see the
        # non-jump branch) and the slot only mirrors the XLA signature.
        return (
            found, resolved, bdead,
            jnp.where(found, t_samp, jnp.inf),
            albedo, density_at_sample, trans,
            jnp.where(bdead, t_budget_w, jnp.inf),
        )

    run_windows = (
        _run_windows_pallas
        if cfg.walk_backend == "pallas" and kern_fast
        else _run_windows
    )

    def _ff_stop_out(*vals):
        """Debug-stop return: same structure as free_flight, values wired
        to the computed arrays so XLA cannot DCE the stage under test."""
        chk = sum(jnp.sum(jnp.where(jnp.isfinite(v), v, 0.0)) for v in vals)
        z = jnp.zeros((r,), bool)
        return (
            z, z, jnp.full((r,), jnp.inf, o.dtype) + chk,
            jnp.zeros((r, 3), o.dtype), jnp.ones((r,), o.dtype) + chk,
            jnp.ones((r,), o.dtype),
        )

    if not use_jump:
        if _FF_STOP == "collect":
            return _ff_stop_out(entry_all, exit_all, t_budget)
        # round 1: sequential walk from t = 0 over the full wavefront
        (found, resolved, bdead, t_samp, albedo, density_at_sample, trans,
         t_stop) = run_windows(
            o, d, xi, entry_all, exit_all, ids_all, t_budget, t_cap,
            active, jnp.zeros((r,), o.dtype), jnp.ones((r,), o.dtype),
            cfg.max_windows,
        )
        # Re-collection rounds (round 4): unresolved rays RESUME — the
        # walk stopped at a known position (t_stop: t_budget for
        # collection-pinned rays, the last window boundary for
        # window-exhausted ones) with the transmittance integrated
        # exactly to it, so collection restarts there (straddling
        # intervals re-enter with clamped entries) and the walk
        # continues, like the reference's BVH march which keeps querying
        # geometry as it advances. Escape then resolves exactly in the
        # first round whose collection no longer saturates. Rays whose
        # re-collection cannot advance (>= budget intervals or >= k_cl
        # straddling clusters at the pinned point) die honestly. Rounds
        # with no pending rays cost one any() reduce (lax.cond skip).
        # The opt-in pallas walk keeps single-round semantics: its
        # wrapper recomputes escape transmittance assuming the table
        # covers the density from t = 0, which resumed tables violate.
        n_extra = (
            max(0, int(cfg.collect_rounds) - 1)
            if run_windows is _run_windows else 0
        )
        if n_extra:
            def _round(c):
                (found, resolved, t_samp, albedo, dens, trans, t_from,
                 pending) = c
                e2, x2, i2, tb2, _ = _collect_intervals(
                    primitives, index, o, d, cfg, t_start=t_from
                )
                f2, res2, bd2, ts2, alb2, dens2, tr2, tstop2 = run_windows(
                    o, d, xi, e2, x2, i2, tb2, t_cap, pending,
                    t_from, trans, cfg.max_windows,
                )
                nf = pending & f2
                found = found | nf
                resolved = resolved | (pending & res2)
                t_samp = jnp.where(nf, ts2, t_samp)
                albedo = jnp.where(nf[:, None], alb2, albedo)
                dens = jnp.where(nf, dens2, dens)
                trans = jnp.where(pending, tr2, trans)
                still = pending & ~res2 & (tstop2 > t_from)
                t_from = jnp.where(still, tstop2, t_from)
                return (found, resolved, t_samp, albedo, dens, trans,
                        t_from, still)

            def round_step(carry, _):
                return jax.lax.cond(
                    jnp.any(carry[-1]), _round, lambda c: c, carry
                ), None

            init = (
                found, resolved, t_samp, albedo, density_at_sample, trans,
                t_stop, active & ~resolved & jnp.isfinite(t_stop),
            )
            (found, resolved, t_samp, albedo, density_at_sample, trans,
             _, _), _ = jax.lax.scan(round_step, init, None, length=n_extra)
        dead = active & ~resolved  # window/collection budget exhausted
        escaped = active & resolved & ~found
        score_found = _score_ratio(density_at_sample, found)
        score_escape = _score_ratio(trans, escaped)
        return found, dead, t_samp, albedo, score_found, score_escape

    # ---- jump path (round-3 streaming redesign) -------------------------
    # The escape/crossing DECISION needs only the complete optical depth
    # F(inf) = sum of every primitive's whole-interval tau — an order-free
    # VPU-bound chunked stream (optical_depth: no top-k, no gathers;
    # measured 31 ms where budgeted collection + its tail correction cost
    # 600+ ms at 65k rays). Rays with chi >= F(inf) escape in closed form
    # with the EXACT transmittance exp(-F(inf)) (the reference marches all
    # overlaps to the same product, prb:303-432). Only crossing or
    # surface-capped rays (3-6% of a bench camera wavefront) are compacted
    # into fixed chunks, and interval collection itself runs per chunk —
    # all-escape chunks never materialize an interval table at all.
    # Collection-budget truncation surfaces as the walk's budget death,
    # matching the reference's max_depth_primitive kill (prb:456-459).
    kp = cfg.interval_budget
    chi = -jnp.log(jnp.maximum(jax.lax.stop_gradient(xi), 1e-30))
    f_total = optical_depth(primitives, o, d, cfg)
    if _FF_STOP == "collect":  # decision-pass cost (jump path)
        return _ff_stop_out(f_total, chi)
    surface_capped = jnp.isfinite(t_cap)
    will_cross = jax.lax.stop_gradient(f_total) > chi
    no_cross = active & ~will_cross & ~surface_capped
    trans_jump = jnp.exp(-jnp.maximum(f_total, 0.0))
    needy = active & (will_cross | surface_capped)

    if _FF_STOP == "escape":
        return _ff_stop_out(f_total, trans_jump, needy.astype(o.dtype))

    def _jump_walk(o_c, d_c, xi_c, e_c, x_c, i_c, tf_c, tb_c, tc_c, ny_c):
        """Block-jump + windows for one (compacted) ray chunk."""
        rc_ = o_c.shape[0]
        n_blocks = max(1, kp // k)
        cum = jnp.cumsum(tf_c, axis=-1)  # inclusive, entry order
        # F upper bound at boundary j (= entry of interval j*k): full taus
        # of every interval entering before it
        bidx = jnp.arange(1, n_blocks) * k
        f_ub = cum[:, bidx - 1] if n_blocks > 1 else jnp.zeros((rc_, 0))
        chi_c = -jnp.log(jnp.maximum(jax.lax.stop_gradient(xi_c), 1e-30))
        jb = jnp.sum(f_ub <= chi_c[:, None], axis=-1)  # crossing-safe
        count = jnp.sum(jnp.isfinite(e_c), axis=-1)
        jb = jnp.minimum(jb, jnp.maximum((count - 1) // k, 0))
        b_t = jnp.take_along_axis(
            e_c, jnp.minimum(jb * k, kp - 1)[:, None], axis=-1
        )[:, 0]
        b_t = jnp.where((jb > 0) & jnp.isfinite(b_t), b_t, 0.0)
        b_t = jnp.minimum(b_t, jnp.minimum(tc_c, tb_c))
        b_t = jnp.maximum(b_t, 0.0)
        f_b = _f_exact_at(o_c, d_c, e_c, x_c, i_c, tf_c, b_t)
        trans0 = jnp.exp(-jnp.maximum(f_b, 0.0))
        return run_windows(
            o_c, d_c, xi_c, e_c, x_c, i_c, tb_c, tc_c, ny_c,
            b_t, trans0, min(cfg.max_windows, cfg.jump_windows),
        )

    wc = _chunk_for(r, cfg.ff_chunk)
    if wc:
        # Needy-ray compaction: stable-sort crossing rays to the front and
        # walk fixed chunks; all-escape chunks skip selection + gathers +
        # the segment scan entirely (lax.cond).
        order = jnp.argsort(~needy, stable=True)
        nc = r // wc

        if _FF_STOP == "sort":
            return _ff_stop_out(order.astype(o.dtype), trans_jump)

        def chunk_fn(args):
            (oc, dc, xc, tcc, nyc) = args

            def skip(_):
                return (
                    jnp.zeros((wc,), bool), jnp.zeros((wc,), bool),
                    jnp.zeros((wc,), bool),
                    jnp.full((wc,), jnp.inf, o.dtype),
                    jnp.zeros((wc, 3), o.dtype),
                    jnp.ones((wc,), o.dtype), jnp.ones((wc,), o.dtype),
                    jnp.full((wc,), jnp.inf, o.dtype),
                )

            def walk(_):
                # Interval COLLECTION runs here, per needy chunk: chunks
                # whose rays all escape never pay the top-k merge or
                # materialize an interval table (the collection itself
                # was 244 of free flight's 600 ms at 65k rays).
                e_c, x_c, i_c, cnt_c, ft_c = _gather_intervals(
                    primitives, oc, dc, jnp.zeros((wc,), o.dtype),
                    kp, cfg.chunk_size, kern=kern,
                    coeff_gemm=cfg.coeff_gemm,
                )
                tb_c = jnp.where(cnt_c >= kp, e_c[:, -1], jnp.inf)
                tf_c = jnp.where(jnp.isfinite(e_c), ft_c, 0.0)
                return _jump_walk(
                    oc, dc, xc, e_c, x_c, i_c, tf_c, tb_c, tcc, nyc
                )

            return jax.lax.cond(jnp.any(nyc), walk, skip, 0)

        perm = lambda a: jnp.take(a, order, axis=0)
        outs = jax.lax.map(
            chunk_fn,
            (
                perm(o).reshape(nc, wc, 3), perm(d).reshape(nc, wc, 3),
                perm(xi).reshape(nc, wc),
                perm(t_cap).reshape(nc, wc),
                perm(needy).reshape(nc, wc),
            ),
        )
        inv = jnp.argsort(order)
        (w_found, w_resolved, w_bdead, w_tsamp, w_alb, w_dens, w_trans,
         _w_tstop) = (
            jnp.take(x.reshape((r,) + x.shape[2:]), inv, axis=0)
            for x in outs
        )
    else:
        e_f, x_f, i_f, cnt_f, ft_f = _gather_intervals(
            primitives, o, d, jnp.zeros((r,), o.dtype),
            kp, cfg.chunk_size, kern=kern, coeff_gemm=cfg.coeff_gemm,
        )
        tb_f = jnp.where(cnt_f >= kp, e_f[:, -1], jnp.inf)
        tf_f = jnp.where(jnp.isfinite(e_f), ft_f, 0.0)
        (w_found, w_resolved, w_bdead, w_tsamp, w_alb, w_dens, w_trans,
         _w_tstop) = (
            _jump_walk(
                o, d, xi, e_f, x_f, i_f, tf_f, tb_f, t_cap, needy,
            )
        )

    # merge: walk outputs for crossing rays, closed-form escape otherwise
    found = needy & w_found
    resolved = jnp.where(needy, w_resolved, no_cross)
    trans = jnp.where(needy, w_trans, trans_jump)
    t_samp = jnp.where(needy, w_tsamp, jnp.inf)
    albedo = jnp.where(needy[:, None], w_alb, 0.0)
    density_at_sample = jnp.where(needy, w_dens, 1.0)

    dead = active & ~resolved  # window/collection budget exhausted
    escaped = active & resolved & ~found
    score_found = _score_ratio(density_at_sample, found)
    score_escape = _score_ratio(trans, escaped)
    return found, dead, t_samp, albedo, score_found, score_escape


def optical_depth(
    primitives: EllipsoidScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    cfg: PRBConfig,
    t_max: float = _BIG_T,
) -> jnp.ndarray:
    """Total optical depth F along [0, t_max] — order-independent chunked
    reduction over every primitive (reference eval_transmittance,
    prb:303-432, whose march multiplies exp(-sigma_t * integral) per
    primitive; here the masked sum). Differentiable; VPU-bound streaming
    (no top-k, no gathers) — the free-flight escape decision runs on this
    (measured 31 ms at 65k rays x 262k-prim-class scenes vs 244 ms for
    budgeted interval collection)."""
    kern = cfg.kernel
    # pad to a lane tile, not a whole chunk: chunk_size=4096 on an
    # 835-prim scene would 4.9x the streamed pair count
    eff = min(cfg.chunk_size, -(-primitives.num_prims // 256) * 256)
    prims = pad_primitives(primitives, eff)
    n = prims.num_prims
    c = min(eff, n)
    n_chunks = n // c
    centers = prims.centers.reshape(n_chunks, c, 3)
    scales = prims.scales.reshape(n_chunks, c, 3)
    quats = prims.quats.reshape(n_chunks, c, 4)
    sigma_t = prims.attrs["sigma_t"].reshape(n_chunks, c)
    real = jnp.arange(n).reshape(n_chunks, c) < primitives.num_prims
    if cfg.coeff_gemm:
        pf_chunks = quadric.prim_features(
            prims.centers, prims.scales, prims.quats
        ).reshape(10, n_chunks, c).transpose(1, 0, 2)
        rayf = quadric.ray_features(o, d)

    @jax.checkpoint
    def chunk_tau(chunk):
        if cfg.coeff_gemm:
            ctr, scl, qt, sig, is_real, pfc = chunk
            coeffs = quadric.pair_coeffs_gemm(rayf, pfc)
        else:
            ctr, scl, qt, sig, is_real = chunk
            coeffs = quadric.ray_prim_coeffs(o, d, ctr, scl, qt)
        valid, _, t_far = quadric.intersect_extent(coeffs, prims.extent)
        valid = valid & (t_far > 0.0) & is_real[None, :]
        s_prod = (scl[:, 0] * scl[:, 1] * scl[:, 2])[None, :]
        t0 = jnp.zeros((o.shape[0], 1), o.dtype)
        t1 = jnp.full((o.shape[0], 1), t_max, o.dtype)
        dens = kern.density_integral(
            coeffs, s_prod, None, 0.0, t0, t1, valid
        )
        return jnp.sum(dens * sig[None, :], axis=-1)

    def body(tau, chunk):
        return tau + chunk_tau(chunk), None

    xs = (centers, scales, quats, sigma_t, real)
    if cfg.coeff_gemm:
        xs = xs + (pf_chunks,)
    tau, _ = jax.lax.scan(
        body, jnp.zeros((o.shape[0],), o.dtype), xs
    )
    return tau


def transmittance(
    primitives: EllipsoidScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    cfg: PRBConfig,
    t_max: float = _BIG_T,
) -> jnp.ndarray:
    """Transmittance along [0, t_max]: exp(-optical_depth)."""
    return jnp.exp(-optical_depth(primitives, o, d, cfg, t_max))


def _sample_phase(key, d_in, cfg: PRBConfig):
    """Sample an outgoing direction. Returns (wo, phase_pdf). phase weight is
    1 for both isotropic and HG (perfect importance sampling)."""
    k1, k2 = jax.random.split(key)
    r = d_in.shape[0]
    u1 = jax.random.uniform(k1, (r,))
    u2 = jax.random.uniform(k2, (r,))
    if cfg.phase == "isotropic":
        z = 1.0 - 2.0 * u1
        pdf = jnp.full((r,), 1.0 / (4.0 * jnp.pi))
    else:  # Henyey-Greenstein
        g = cfg.phase_g
        if abs(g) < 1e-3:
            z = 1.0 - 2.0 * u1
        else:
            sq = (1.0 - g * g) / (1.0 - g + 2.0 * g * u1)
            z = (1.0 + g * g - sq * sq) / (2.0 * g)
        # z is cos(theta) w.r.t. the *forward* direction; _hg_pdf follows the
        # Mitsuba convention (cos w.r.t. wi, which points backward).
        pdf = _hg_pdf(-z, g)
    r_xy = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u2
    local = jnp.stack([r_xy * jnp.cos(phi), r_xy * jnp.sin(phi), z], axis=-1)
    # Build an orthonormal frame around the scattering axis. Mitsuba's phase
    # convention: wi = -d_in, wo sampled around the frame of wi; isotropic is
    # frame-independent, HG measures cos(theta) w.r.t. the forward direction.
    wo = _to_frame(d_in, local)
    return wo, pdf


def _hg_pdf(cos_theta, g):
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return (1.0 - g * g) / (4.0 * jnp.pi * denom * jnp.sqrt(jnp.maximum(denom, 1e-12)))


def eval_phase_pdf(d_in: jnp.ndarray, wo: jnp.ndarray, cfg: PRBConfig):
    if cfg.phase == "isotropic":
        return jnp.full(d_in.shape[:-1], 1.0 / (4.0 * jnp.pi))
    cos_theta = jnp.sum(d_in * wo, axis=-1)
    return _hg_pdf(cos_theta, cfg.phase_g)


def _to_frame(n: jnp.ndarray, local: jnp.ndarray) -> jnp.ndarray:
    """Transform local coords (z along n) to world (branchless ONB)."""
    nz = n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + sign * n[..., 0] ** 2 * a, sign * b, -sign * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, sign + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return (
        local[..., 0:1] * t + local[..., 1:2] * bt + local[..., 2:3] * n
    )


@register_integrator("volprim_prb")
def radiance(
    primitives: EllipsoidScene,
    emitter,
    o: jnp.ndarray,
    d: jnp.ndarray,
    cfg: PRBConfig,
    key: Optional[jax.Array] = None,
    mesh=None,
    bsdf=None,
) -> jnp.ndarray:
    """Path-traced radiance for a wavefront of rays (prb:74-301).

    ``mesh`` (a :class:`volprim_tpu.scene.mesh.TriangleMesh`) adds opaque
    surfaces with per-vertex-attribute BSDFs: the march is capped at the
    nearest surface hit and the path continues with a BSDF vertex — the
    reference's ``active_surface`` branch (volprim_prb.py:134-137,195-235,
    262-282). ``bsdf`` is an :mod:`volprim_tpu.ops.bsdf` model (default
    Diffuse); its attributes are interpolated from the mesh's vertex attrs.
    """
    if emitter is None:
        raise ValueError(
            "volprim_prb requires an environment emitter (prb:76-80)"
        )
    key = key if key is not None else jax.random.PRNGKey(0)
    r = o.shape[0]
    rc = cfg.ray_chunk
    if rc and r > rc:
        # Bound the per-bounce working set: path-trace fixed-size ray
        # chunks sequentially (lax.map), each with its own RNG stream.
        n_pad = (-r) % rc
        o_p = jnp.concatenate([o, jnp.ones((n_pad, 3), o.dtype)], axis=0)
        d_p = jnp.concatenate([d, jnp.ones((n_pad, 3), d.dtype)], axis=0)
        n_chunks = o_p.shape[0] // rc

        def chunk_fn(args):
            idx, o_c, d_c = args
            return radiance(
                primitives, emitter, o_c, d_c,
                dataclasses.replace(cfg, ray_chunk=0),
                jax.random.fold_in(key, idx),
                mesh=mesh, bsdf=bsdf,
            )

        out = jax.lax.map(
            chunk_fn,
            (
                jnp.arange(n_chunks),
                o_p.reshape(n_chunks, rc, 3),
                d_p.reshape(n_chunks, rc, 3),
            ),
        )
        return out.reshape(-1, 3)[:r]
    n_steps = cfg.num_bounces
    ff_index = build_ff_index(primitives, cfg) if cfg.use_clusters else None

    use_surfaces = mesh is not None
    if use_surfaces:
        from ..ops import bsdf as bsdf_ops
        from ..scene import mesh as mesh_mod

        if bsdf is None:
            bsdf = bsdf_ops.Diffuse()
        # shading normals as an interpolatable attribute (computed once)
        mesh_sh = mesh_mod.TriangleMesh(
            mesh.vertices, mesh.faces,
            {**mesh.attrs, "_vn": mesh.vertex_normals()},
        )
        attr_names = getattr(bsdf, "attr_names", lambda: ["base_color"])()

    cc = cfg.compact_chunk
    use_compact = bool(cc) and r > cc and r % cc == 0

    def _bounce_body(carry, i, cfg_b):
        if not use_compact:
            o_c, d_c, beta, l_acc, active, prev_pdf, ray_id = carry
            out = _bounce_core(
                (o_c, d_c, beta, l_acc, active, prev_pdf),
                i, jax.random.fold_in(key, i), cfg_b,
            )
            return out + (ray_id,)
        # Active-ray compaction: sort live rays to the front (stable), then
        # process fixed chunks — all-dead chunks skip the whole bounce body
        # (free flight, NEE, sampling) via lax.cond. ray_id carries each
        # row's original film index for the final unpermute.
        o_c, d_c, beta, l_acc, active, prev_pdf, ray_id = carry
        order = jnp.argsort(~active, stable=True)
        o_c, d_c, beta, l_acc, prev_pdf = (
            o_c[order], d_c[order], beta[order], l_acc[order],
            prev_pdf[order],
        )
        active = active[order]
        ray_id = ray_id[order]
        nc = r // cc
        ki = jax.random.fold_in(key, i)

        def chunk_fn(args):
            ci, oc, dc, bc, lc, ac, pc = args

            def go(_):
                return _bounce_core(
                    (oc, dc, bc, lc, ac, pc), i,
                    jax.random.fold_in(ki, ci), cfg_b,
                )

            return jax.lax.cond(
                jnp.any(ac), go, lambda _: (oc, dc, bc, lc, ac, pc), 0
            )

        o2, d2, b2, l2, a2, p2 = jax.lax.map(
            chunk_fn,
            (
                jnp.arange(nc),
                o_c.reshape(nc, cc, 3), d_c.reshape(nc, cc, 3),
                beta.reshape(nc, cc, 3), l_acc.reshape(nc, cc, 3),
                active.reshape(nc, cc), prev_pdf.reshape(nc, cc),
            ),
        )
        return (
            o2.reshape(r, 3), d2.reshape(r, 3), b2.reshape(r, 3),
            l2.reshape(r, 3), a2.reshape(r), p2.reshape(r), ray_id,
        )

    @functools.partial(jax.checkpoint, static_argnums=(2,))
    def bounce(carry, i, cfg_b):
        # Skip dead bounces entirely (all paths terminated/escaped).
        return jax.lax.cond(
            jnp.any(carry[4]),
            lambda c: _bounce_body(c, i, cfg_b),
            lambda c: c,
            carry,
        ), None

    def _bounce_core(carry, i, kb, cfg_b):
        o_c, d_c, beta, l_acc, active, prev_pdf = carry
        rl = o_c.shape[0]
        k_ff, k_nee, k_phase, k_rr, k_bsdf = jax.random.split(kb, 5)

        # --- surface intersection caps the march (common.py:461-466) ---
        if use_surfaces:
            s_valid, t_surf, fid, uv = mesh_mod.intersect(
                mesh_sh, o_c, d_c, t_min=1e-4
            )
            t_cap = jnp.where(s_valid, t_surf, jnp.inf)
        else:
            s_valid = jnp.zeros((rl,), bool)
            t_cap = None

        xi = jax.random.uniform(k_ff, (rl,), minval=1e-7, maxval=1.0)
        found, dead, t_samp, albedo, score_found, score_escape = free_flight(
            primitives, o_c, d_c, xi, cfg_b, active, index=ff_index,
            t_max=t_cap,
        )
        escaped = active & ~found & ~dead
        at_surface = escaped & s_valid
        escaped_env = escaped & ~s_valid
        active_medium = active & found
        if cfg.max_depth > 0:
            # depth is incremented before the depth test (prb:141-143).
            active_medium = active_medium & ((i + 1) < cfg.max_depth)
            at_surface = at_surface & ((i + 1) < cfg.max_depth)

        # --- environment hit with MIS (prb:165-187) ---
        if cfg.use_indirect:
            if cfg.use_nee:
                emitter_pdf = jnp.where(
                    i > 0, emitter.pdf_direction(d_c), 0.0
                )
            else:
                emitter_pdf = jnp.zeros((rl,))
            vis = escaped_env & ~((i == 0) & cfg.hide_emitters)
            lr_dir = (
                beta
                * score_escape[:, None]  # survival-probability score grads
                * _mis_weight(prev_pdf, emitter_pdf)[:, None]
                * emitter.eval(d_c)
            )
            l_acc = l_acc + jnp.where(vis[:, None], lr_dir, 0.0)

        # --- collision albedo (prb:158-159) + sampling-density score ---
        beta = jnp.where(
            active_medium[:, None],
            beta * albedo * score_found[:, None],
            beta,
        )
        p_int = o_c + d_c * jnp.where(found, t_samp, 0.0)[:, None]

        # --- surface vertex: shading frame + attributes (prb:262-282) ---
        if use_surfaces:
            # transmittance-to-surface score gradients enter the throughput
            beta = jnp.where(
                at_surface[:, None], beta * score_escape[:, None], beta
            )
            n_sh = mesh_sh.interpolate("_vn", fid, uv)
            n_sh = n_sh / jnp.maximum(
                jnp.linalg.norm(n_sh, axis=-1, keepdims=True), 1e-12
            )
            p_surf = (
                o_c + d_c * jnp.where(s_valid, t_surf, 0.0)[:, None]
                + 1e-4 * n_sh
            )
            wi_loc = bsdf_ops.to_local(n_sh, -d_c)
            attrs_s = {}
            for name in attr_names:
                v = mesh_sh.interpolate(name, fid, uv)
                attrs_s[name] = v if v.shape[-1] > 1 else v[:, 0]

        # --- NEE (prb:195-235), unified medium/surface ---
        if cfg.use_nee:
            s2 = jax.random.uniform(k_nee, (rl, 2))
            ds_dir, ds_val, ds_pdf = emitter.sample_direction(s2)
            p_nee = (
                jnp.where(at_surface[:, None], p_surf, p_int)
                if use_surfaces else p_int
            )

            def _tr_fn(p_c, dir_c):
                t = transmittance(primitives, p_c, dir_c, cfg)
                if use_surfaces:
                    t = t * (1.0 - mesh_mod.occluded(mesh_sh, p_c, dir_c))
                return t

            # Shadow transmittance only matters at interaction vertices
            # (~3% of a camera wavefront): compact those to the front and
            # skip all-escape chunks (round 3, same pattern as the
            # free-flight walk).
            need_tr = (active_medium | at_surface) & (ds_pdf > 0.0)
            wc_n = _chunk_for(rl, cfg.ff_chunk)
            if wc_n:
                order_n = jnp.argsort(~need_tr, stable=True)
                nc_n = rl // wc_n

                def tr_chunk(args):
                    nd_c, p_c, dir_c = args
                    return jax.lax.cond(
                        jnp.any(nd_c), lambda _: _tr_fn(p_c, dir_c),
                        lambda _: jnp.zeros((wc_n,), o.dtype), 0,
                    )

                tr_p = jax.lax.map(
                    tr_chunk,
                    (
                        need_tr[order_n].reshape(nc_n, wc_n),
                        p_nee[order_n].reshape(nc_n, wc_n, 3),
                        ds_dir[order_n].reshape(nc_n, wc_n, 3),
                    ),
                )
                tr = jnp.take(
                    tr_p.reshape(rl), jnp.argsort(order_n), axis=0
                )
            else:
                tr = _tr_fn(p_nee, ds_dir)
            phase_val = eval_phase_pdf(-d_c, ds_dir, cfg)
            nee_val = phase_val[:, None] * jnp.ones((rl, 3))
            nee_pdf = phase_val
            if use_surfaces:
                wl = bsdf_ops.to_local(n_sh, ds_dir)
                b_val = bsdf.eval(attrs_s, wi_loc, wl, at_surface)
                b_pdf = bsdf.pdf(attrs_s, wi_loc, wl, at_surface)
                nee_val = jnp.where(at_surface[:, None], b_val, nee_val)
                nee_pdf = jnp.where(at_surface, b_pdf, nee_pdf)
            nee_pdf_mis = (
                nee_pdf if cfg.use_indirect else jnp.zeros_like(nee_pdf)
            )
            lr_nee = (
                beta
                * nee_val
                * _mis_weight(ds_pdf, nee_pdf_mis)[:, None]
                * tr[:, None]
                * ds_val
                / jnp.maximum(ds_pdf, 1e-30)[:, None]
            )
            lr_nee = jnp.where(
                ((active_medium | at_surface) & (ds_pdf > 0.0))[:, None],
                lr_nee, 0.0,
            )
            l_acc = l_acc + lr_nee

        # --- phase sampling (prb:243-256) ---
        wo, phase_pdf_s = _sample_phase(k_phase, d_c, cfg)
        o_c = jnp.where(active_medium[:, None], p_int, o_c)
        d_c = jnp.where(active_medium[:, None], wo, d_c)
        prev_pdf = jnp.where(active_medium, phase_pdf_s, prev_pdf)
        active = active_medium

        # --- BSDF sampling (prb:262-282) ---
        if use_surfaces:
            wo_l, bs_pdf, bs_w = bsdf.sample(attrs_s, wi_loc, k_bsdf, at_surface)
            surf_cont = at_surface & (bs_pdf > 0.0)
            o_c = jnp.where(surf_cont[:, None], p_surf, o_c)
            d_c = jnp.where(
                surf_cont[:, None], bsdf_ops.to_world(n_sh, wo_l), d_c
            )
            beta = jnp.where(surf_cont[:, None], beta * bs_w, beta)
            prev_pdf = jnp.where(surf_cont, bs_pdf, prev_pdf)
            active = active | surf_cont

        # --- RR + throughput kill (prb:288-298) ---
        if cfg.use_rr:
            q = jnp.minimum(jnp.max(beta, axis=-1), 0.99)
            perform = (i + 1) > cfg.rr_depth  # traced scalar
            u = jax.random.uniform(k_rr, (rl,))
            active = active & ((u < q) | ~perform)
            beta = jnp.where(perform, beta / jnp.maximum(q, 1e-6)[:, None], beta)
        active = active & jnp.any(beta > 0.005, axis=-1)

        return (o_c, d_c, beta, l_acc, active, prev_pdf)

    init = (
        o,
        d,
        jnp.ones((r, 3), o.dtype),
        jnp.zeros((r, 3), o.dtype),
        jnp.ones((r,), bool),
        jnp.ones((r,), o.dtype),  # prev_event_pdf = 1 (prb:95)
        jnp.arange(r, dtype=jnp.int32),  # original film index (compaction)
    )
    cfg_tail = cfg.tail_cfg()
    if cfg_tail is cfg or n_steps <= cfg.tail_after:
        (_, _, _, l_acc, _, _, ray_id), _ = jax.lax.scan(
            lambda c, i: bounce(c, i, cfg),
            init, jnp.arange(n_steps),
        )
    else:
        # adaptive capacity: full caps for the first tail_after bounces
        # (camera rays cross the whole medium), reduced caps after
        carry = init
        for i0 in range(cfg.tail_after):
            carry, _ = bounce(carry, jnp.int32(i0), cfg)
        (_, _, _, l_acc, _, _, ray_id), _ = jax.lax.scan(
            lambda c, i: bounce(c, i, cfg_tail),
            carry, jnp.arange(cfg.tail_after, n_steps),
        )
    return jnp.zeros((r, 3), o.dtype).at[ray_id].set(l_acc)
