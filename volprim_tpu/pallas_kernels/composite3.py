"""Fused tile compositor v3 — camera-relative, cancellation-free, early-exit.

Third-generation rf compositor (light transport identical to v1/v2 and the
reference ``volprim_rf.py:63-146``), built for the bench-scale regime where
v2 was parked:

1. **Cancellation-free peak response.** v2 evaluated ``q_min = c0 - b^2/a``
   with a precomputed ``c0 = (o-c)^T M (o-c)``; at bench scene ratios
   (primitive scales ~0.004, camera distance ~3) ``c0`` is O(1e5) while
   ``q_min`` matters only below extent^2 = 9 — f32 rounding of ``c0``
   decorrelated from the in-kernel ``b^2/a`` produced O(10%) alpha errors.
   v3 instead forms the closest-approach point explicitly:

       t* = -b / a,     p = w + t* d,     q_min = p^T M p        (w = o - c)

   The quadratic form is evaluated on the small vector ``p`` (|p| ~ extent
   * scale wherever the response is non-negligible), so the result carries
   *relative* f32 accuracy instead of absolute error eps * c0.

2. **In-kernel ray features** (from v2): only the direction block [T, RT, 8]
   crosses HBM per sample; F6(d) and the SH basis are built in-register.

3. **Early exit**: the segment walk is a ``while_loop`` that stops once
   every ray in the tile is saturated (max log beta < log beta_kill). On
   dense scenes rays saturate after a handful of hits, so most of the
   shortlist is never touched. Differentiable: composite_tiles3_ad carries
   a custom-VJP backward kernel (two-sweep, closest-approach q adjoints).

Primitive-side packing (per frame, :func:`pack_fused_features`):
    row = [M11, M22, M33, 2*M12, 2*M13, 2*M23, u(3), w(3), opac, pad(3)]
    with u = M w,  w = o - c.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .composite2 import _ray_blocks

_FEAT = 16

# Timing-ablation switches (tools/profile_rf.py kernel_abl stage): entries
# among {'nodepth', 'noemis', 'notrans', 'nocum', 'nowalk'} disable pieces
# of the forward segment walk AT TRACE TIME to attribute kernel cost.
# 'nowalk' skips phase 2 after the compact phase (measures compaction cost
# alone). Results are WRONG with any flag set — never enable outside
# profiling. VOLPRIM_ABL=flag1,flag2 seeds the set from the environment so
# bench.py sweeps can measure ablations without code edits.
_ABL = frozenset(
    f for f in os.environ.get("VOLPRIM_ABL", "").split(",") if f
)

# Static-prefix fraction for the compacted walk (q10 A/B: LOST — 47 vs
# 30 ms frame at 0.4; the per-walked-segment cost is invariant to loop
# form, so masked extra segments are pure cost. Kept at 0 for
# re-testing; the compact walk instead uses a dynamic-bound fori with no
# early-exit cond, the best measured variant at 29.3 ms vs the
# while_loop's 30.1).
_WALK_STATIC = float(os.environ.get("VOLPRIM_WALK_STATIC", "0"))

# Full-static compact-phase scan: q9b implies extra compact segments
# cost only ~0.6 us each, so scanning all n_seg buys nothing — off.
_COMPACT_STATIC = os.environ.get("VOLPRIM_COMPACT_STATIC", "0") == "1"

# [RT, K] x [C, K] -> [RT, C]
_DN_T = (((1,), (1,)), ((), ()))


def _dot3_t(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """bf16x3 emulated-f32 GEMM contracting the last dims ([RT,K]x[C,K]).

    Mosaic offers only DEFAULT (1 bf16 pass) or HIGHEST (6 passes); the
    quadric coefficients need ~f32 accuracy but not the full 6-pass split.
    Splitting each operand into bf16 hi+lo and keeping the three largest
    cross terms gives ~2^-22 relative error at half the HIGHEST MXU cost —
    enough for the closest-approach q (b only *positions* the evaluation
    point; see module docstring)."""
    f32 = jnp.float32
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(f32)).astype(jnp.bfloat16)
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(f32)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(xh, wh, _DN_T, preferred_element_type=f32)
    out = out + jax.lax.dot_general(xh, wl, _DN_T, preferred_element_type=f32)
    out = out + jax.lax.dot_general(xl, wh, _DN_T, preferred_element_type=f32)
    return out


def pack_fused_features(prims, origin: jnp.ndarray) -> jnp.ndarray:
    """[16, N] per-frame COLUMN table (M6 doubled-off-diag, u = Mw,
    w = o - c, opac, c0, bounding radius).

    Runs once per frame, so it is written entirely on 1-D [N] columns: any
    [N, 3]/[N, 3, 3] intermediate is lane-padded up to 42x by the TPU
    layout and turns this cheap pack into tens of milliseconds. The
    transposed output is also the natural layout for the per-component
    cluster gathers and the kernel's [16, S] blocks.

    HALVED convention (round 3): rows 0-8 and 13 carry M/2 (via halved
    inverse-square scales), so the quadratic form the kernel evaluates is
    q/2 directly and the Gaussian response is ``exp(-q_half)`` — one fewer
    multiply per (ray, primitive) in the hot walk. The kernel compares
    against ``extent^2 / 2`` accordingly; rows 9-11 (w) and 14 (radius)
    stay unscaled.
    """
    q = prims.quats
    qx, qy, qz, qw = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    # rotation-matrix entries (world <- local), columnwise
    r00 = 1.0 - 2.0 * (qy * qy + qz * qz)
    r01 = 2.0 * (qx * qy - qz * qw)
    r02 = 2.0 * (qx * qz + qy * qw)
    r10 = 2.0 * (qx * qy + qz * qw)
    r11 = 1.0 - 2.0 * (qx * qx + qz * qz)
    r12 = 2.0 * (qy * qz - qx * qw)
    r20 = 2.0 * (qx * qz - qy * qw)
    r21 = 2.0 * (qy * qz + qx * qw)
    r22 = 1.0 - 2.0 * (qx * qx + qy * qy)
    # halved inverse-square scales -> every M-derived row is M/2 (see
    # docstring); q_half = q/2 falls out of the unchanged kernel algebra
    s0 = 0.5 / jnp.square(prims.scales[:, 0])
    s1 = 0.5 / jnp.square(prims.scales[:, 1])
    s2 = 0.5 / jnp.square(prims.scales[:, 2])
    # M = R diag(s^-2) R^T, entrywise
    m00 = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    m11 = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    m22 = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    m01 = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    m02 = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    m12 = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    wx = origin[0] - prims.centers[:, 0]
    wy = origin[1] - prims.centers[:, 1]
    wz = origin[2] - prims.centers[:, 2]
    ux = m00 * wx + m01 * wy + m02 * wz
    uy = m01 * wx + m11 * wy + m12 * wz
    uz = m02 * wx + m12 * wy + m22 * wz
    c0 = ux * wx + uy * wy + uz * wz
    opac = prims.attrs["opacities"][:, 0]
    # row 14: extent-scaled bounding-sphere radius — the in-kernel
    # column-compaction mask tests it against the (sub)tile cone
    rad = float(prims.extent) * jnp.max(prims.scales, axis=-1)
    # row 15: entry-distance sort key, |w| - extent * ||S R^T w_hat|| —
    # the distance at which the ray toward this primitive's center ENTERS
    # its extent ellipsoid. The exact integrator composites by entry t,
    # so entry-keyed ordering tracks it better than center distance
    # (measured +0.2-0.3 dB on the xla-path probe at 262k). The kernel
    # math never reads row 15 (the neutral block zeroes it; its VJP row
    # is zero), so this is free: rf_tiled's cluster_sort / fused resort
    # consume it host-side.
    wn = jnp.sqrt(wx * wx + wy * wy + wz * wz)
    inv_wn = 1.0 / jnp.maximum(wn, 1e-12)
    hx, hy, hz = wx * inv_wn, wy * inv_wn, wz * inv_wn
    # (R^T h)_i = column i of R dotted with h
    p0 = r00 * hx + r10 * hy + r20 * hz
    p1 = r01 * hx + r11 * hy + r21 * hz
    p2 = r02 * hx + r12 * hy + r22 * hz
    sup = float(prims.extent) * jnp.sqrt(
        (prims.scales[:, 0] * p0) ** 2
        + (prims.scales[:, 1] * p1) ** 2
        + (prims.scales[:, 2] * p2) ** 2
    )
    ekey = wn - sup
    return jnp.stack(
        [
            m00, m11, m22, 2.0 * m01, 2.0 * m02, 2.0 * m12,
            ux, uy, uz, wx, wy, wz, opac, c0, rad, ekey,
        ],
        axis=0,
    )


def _neutral_np():
    """Inert row as a numpy literal (kernel-embeddable): M = I, w = u = 0,
    opac = 0 (a > 0, never hits); radius -1 so the compaction mask drops
    the column (accel/tiles.py convention)."""
    import numpy as np

    row = np.zeros((16,), np.float32)
    row[:3] = 1.0
    row[14] = -1.0
    return row


def neutral_fused_row() -> jnp.ndarray:
    """See :func:`_neutral_np` (device-array form for gather-time fills)."""
    return jnp.asarray(_neutral_np())


def _ray_blocks_t(d_ref, degree, b=0):
    """_ray_blocks for the transposed direction block [B, 8, RT]: component
    rows live on the lane axis (no [RT, 8] padding in HBM); transposed to
    [RT, 1] columns once per (sub)tile ``b``."""
    dx = jnp.transpose(d_ref[b, 0:1, :])  # [RT, 1]
    dy = jnp.transpose(d_ref[b, 1:2, :])
    dz = jnp.transpose(d_ref[b, 2:3, :])
    f6 = jnp.concatenate(
        [dx * dx, dy * dy, dz * dz, dx * dy, dx * dz, dy * dz], axis=1
    )
    d3 = jnp.concatenate([dx, dy, dz], axis=1)
    from .composite2 import _C1, _C2, _C3

    # Column 0 is exactly 1.0 (not Y00): the table builders store
    # Y00 * dc + 0.5 in the DC row, folding the rf emission offset into
    # the GEMM with no bf16 precision loss (1.0 and 0.5 are bf16-exact)
    # and no per-pair add. See rf_tiled.build_state.
    cols = [jnp.full_like(dx, 1.0)]
    if degree >= 1:
        cols += [-_C1 * dy, _C1 * dz, -_C1 * dx]
    if degree >= 2:
        xx, yy, zz = dx * dx, dy * dy, dz * dz
        cols += [
            _C2[0] * dx * dy, _C2[1] * dy * dz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * dx * dz, _C2[4] * (xx - yy),
        ]
    if degree >= 3:
        xx, yy, zz = dx * dx, dy * dy, dz * dz
        cols += [
            _C3[0] * dy * (3.0 * xx - yy),
            _C3[1] * dx * dy * dz,
            _C3[2] * dy * (4.0 * zz - xx - yy),
            _C3[3] * dz * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _C3[4] * dx * (4.0 * zz - xx - yy),
            _C3[5] * dz * (xx - yy),
            _C3[6] * dx * (xx - 3.0 * yy),
        ]
    if len(cols) < 16:
        cols.append(jnp.zeros((dx.shape[0], 16 - len(cols)), dx.dtype))
    basis = jnp.concatenate(cols, axis=1)
    return f6, d3, basis


# [RT, K] x [K, C] -> [RT, C] (plain matmul on the transposed tables)
_DN_N = (((1,), (0,)), ((), ()))

_CUM_BLOCK = 128


def _cumsum_blocked(x, ut, seg):
    """Inclusive lane cumsum of ``x`` [RT, seg] via 128-wide triangular
    blocks + a carry, instead of one [seg, seg] triangular dot.

    The triangular-matmul cumsum is O(seg^2) MXU MACs; the walk's segment
    loop is MXU-bound at seg = 256 (the two hi/lo transmittance dots + the
    depth-count dot dominate the measured 2.6 us/tile-segment). Splitting
    into seg/128 blocks halves the MAC count at seg = 256 while the carry
    is one [RT, 1] broadcast add per block. ``ut`` is the [seg, seg] ones
    upper-triangular; its top-left [128, 128] block is the block-local
    triangular."""
    f32 = jnp.float32
    if seg <= _CUM_BLOCK or seg % _CUM_BLOCK:
        return jnp.dot(x, ut, preferred_element_type=f32)
    utb = ut[:_CUM_BLOCK, :_CUM_BLOCK]
    parts = []
    carry = None
    for b in range(seg // _CUM_BLOCK):
        xb = x[:, b * _CUM_BLOCK:(b + 1) * _CUM_BLOCK]
        cs = jnp.dot(xb, utb, preferred_element_type=f32)
        if carry is not None:
            cs = cs + carry
        parts.append(cs)
        carry = cs[:, _CUM_BLOCK - 1:_CUM_BLOCK]
    return jnp.concatenate(parts, axis=1)


def _dot3_n(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """bf16x3 emulated-f32 matmul [RT, K] x [K, C] (see _dot3_t)."""
    f32 = jnp.float32
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(f32)).astype(jnp.bfloat16)
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(f32)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(xh, wh, _DN_N, preferred_element_type=f32)
    out = out + jax.lax.dot_general(xh, wl, _DN_N, preferred_element_type=f32)
    out = out + jax.lax.dot_general(xl, wh, _DN_N, preferred_element_type=f32)
    return out


def _fwd3_core(pfT, f6, d3, dx, dy, dz, extent2h, stable_q):
    """Shared forward pair math (recomputed by the backward sweep).

    pfT [16, C] — the native transposed block in the HALVED convention
    (rows carry M/2; see pack_fused_features), so a, b, q are all q/2-
    scaled and ``extent2h`` must be extent^2 / 2. Returns (a, b, t_peak,
    p (3-tuple or None), q_raw, q_min, hit, opac, pfT).

    a = F6(d) . m6 and b = d . u contract over only 6 / 3 terms — on the
    MXU that pads to a 128-deep pass and the bf16x3 emulation needs three
    of them per product plus hi/lo splits every segment. Rank-1 VPU
    accumulation ([RT, 1] x [1, C] broadcasts) is cheaper AND exact f32."""
    a = f6[:, 0:1] * pfT[0:1, :]
    for i in range(1, 6):
        a = a + f6[:, i:i + 1] * pfT[i:i + 1, :]
    b = (
        d3[:, 0:1] * pfT[6:7, :]
        + d3[:, 1:2] * pfT[7:8, :]
        + d3[:, 2:3] * pfT[8:9, :]
    )
    opac = pfT[12:13, :]
    t_peak = -b / a
    if stable_q:
        m11, m22, m33 = pfT[0:1, :], pfT[1:2, :], pfT[2:3, :]
        m12_2, m13_2, m23_2 = pfT[3:4, :], pfT[4:5, :], pfT[5:6, :]
        wx, wy, wz = pfT[9:10, :], pfT[10:11, :], pfT[11:12, :]
        px = wx + t_peak * dx
        py = wy + t_peak * dy
        pz = wz + t_peak * dz
        # Horner form: 9 VPU ops vs 17 for the six-term expansion (the
        # walk is VPU-bound, every op is ~0.5 ms of the bench frame)
        q_raw = (
            px * (m11 * px + m12_2 * py + m13_2 * pz)
            + py * (m22 * py + m23_2 * pz)
            + (pz * pz) * m33
        )
        p = (px, py, pz)
    else:
        q_raw = pfT[13:14, :] + t_peak * b
        p = None
    q_min = jnp.maximum(q_raw, 0.0)
    # hit = (disc >= 0) & (t_near > 0) without divide/sqrt:
    #   t_near = t_peak - sqrt((e2 - q_min)/a) > 0
    #   <=> t_peak > 0  and  a t_peak^2 > e2 - q_min,   a t_peak^2 = -b t_peak
    hit = (
        (q_min <= extent2h)
        & (t_peak > 0.0)
        & (q_min - b * t_peak > extent2h)
    )
    return a, b, t_peak, p, q_raw, q_min, hit, opac, pfT



def _subtile_cone(d_ref, b):
    """Subtile bounding cone, read from the spare rows of the direction
    block (packed XLA-side by rf_tiled's subtile_cone_rows: rows 3-5 =
    unit axis, row 6 = cos_half, row 7 = sin_half). Computing the cone
    in-kernel went through Mosaic's approximate rsqrt/sqrt (~2^-12
    relative), which perturbed the cone by an angle comparable to its own
    half-width and randomly flipped borderline columns vs the XLA cull
    (~1 dB on the bench scene). Returns ([1,1] ax0, ax1, ax2, ch, sh)."""
    return (
        jnp.transpose(d_ref[b, 3:4, 0:1]),
        jnp.transpose(d_ref[b, 4:5, 0:1]),
        jnp.transpose(d_ref[b, 5:6, 0:1]),
        jnp.transpose(d_ref[b, 6:7, 0:1]),
        jnp.transpose(d_ref[b, 7:8, 0:1]),
    )


def _column_mask(pfT, cone):
    """[1, C] f32 mask: does this column's bounding sphere meet the subtile
    cone? Conservative; columns with radius < 0 (neutral/padding) never
    pass. Removed columns are guaranteed no-hit for every ray in the
    subtile, so compositing after compaction is exact.

    The test is the point-cone distance in SQUARED form — multiplies and
    compares only, no sqrt/divide: Mosaic's approximate transcendentals
    (~2^-12 relative) perturb a cosine-space test by an angle ~ the
    subtile cone's own half-width near theta = 0 (d cos = theta d theta),
    which dropped genuinely-hit borderline columns on TPU while CPU
    interpret agreed with XLA bit-for-bit. With FMA-only math the TPU and
    XLA rounding coincide again. Apex region: the lateral-surface test
    over-accepts points nearest the apex (distance underestimates), which
    is conservative; `contains` handles spheres covering the apex."""
    ax0, ax1, ax2, ch, sh_ = cone
    wx, wy, wz = pfT[9:10, :], pfT[10:11, :], pfT[11:12, :]
    r = pfT[14:15, :]
    vx, vy, vz = -wx, -wy, -wz  # c - o
    dist2 = vx * vx + vy * vy + vz * vz
    a_ = vx * ax0 + vy * ax1 + vz * ax2  # depth along the cone axis
    b2 = jnp.maximum(dist2 - a_ * a_, 0.0)  # squared distance to axis
    ch2 = ch * ch
    # inside the forward cone: q_perp * ch <= a_ * sh  (a_ > 0)
    inside = (a_ > 0.0) & (b2 * ch2 <= (a_ * a_) * (sh_ * sh_))
    # lateral surface within r: q_perp * ch - a_ * sh <= r
    rhs = r + a_ * sh_
    near_surf = (rhs >= 0.0) & (b2 * ch2 <= rhs * rhs)
    in_front = a_ + r > 1e-4
    contains = dist2 <= r * r
    m = (((inside | near_surf) & in_front) | contains) & (r >= 0.0)
    if "maskall" in _ABL:  # A/B: keep the pack machinery, drop no columns
        m = r >= 0.0
    return jnp.where(m, 1.0, 0.0)


_ALIGN = 128  # compacted write alignment (lane-tile aligned -> free slices)


def _neutral_block(seg):
    """[16, seg] neutral-row block built from iota (pallas_call rejects
    captured array constants): rows 0-2 = 1 (M = I), row 14 = -1 (radius
    sentinel), rest 0."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (16, seg), 0)
    return jnp.where(
        ri < 3, 1.0, jnp.where(ri == 14, -1.0, 0.0)
    ).astype(jnp.float32)


def _compact_phase(
    pf_ref, sh_ref, ut, scr_pf, scr_sh, b, n_seg_t, seg, cone,
    n_static=None, feat_major=False,
):
    """Phase 1 of the compacted walk: stream the subtile's segments, drop
    columns whose bounding sphere misses the subtile cone (one-hot MXU
    permutation), append survivors to the VMEM scratches EXACTLY packed.
    Returns the number of compacted segments to walk.

    Packing is exact (no alignment rounding — at the measured ~22% column
    survival a 128-rounded append would waste 2x): the one-hot places
    survivors at the in-block offset ``total mod _ALIGN`` directly
    (P [C, C+_ALIGN]), and the _ALIGN-aligned write preserves the already-
    written prefix read-modify-write. The one-hot apply moves pf values
    through a bf16x3 split (~2^-24 relative — one extra f32-rounding-
    equivalent); sh (bf16) moves exactly.
    """
    f32 = jnp.float32
    n_sh_rows = scr_sh.shape[0]
    wide = seg + _ALIGN

    def body(si, total):
        sl = pl.ds(si * seg, seg)
        base = (total // _ALIGN) * _ALIGN
        r_off = total - base
        pfT = pf_ref[:, b, sl] if feat_major else pf_ref[b, :, sl]
        m = _column_mask(pfT, cone)  # [1, C]
        pos = jnp.dot(m, ut, preferred_element_type=f32)  # incl cumsum
        live = pos[0, seg - 1].astype(jnp.int32)
        pos_t = jnp.transpose(pos).astype(jnp.int32)  # [C, 1]
        m_t = jnp.transpose(m)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (seg, wide), 1)
        p = jnp.where(
            (pos_t - 1 + r_off == iota_w) & (m_t > 0.0), 1.0, 0.0
        )  # [C, wide] — survivors land at [r_off, r_off + live)
        ph = p.astype(jnp.bfloat16)
        xh = pfT.astype(jnp.bfloat16)
        xl = (pfT - xh.astype(f32)).astype(jnp.bfloat16)
        xl2 = (pfT - xh.astype(f32) - xl.astype(f32)).astype(jnp.bfloat16)
        cmp = (
            jax.lax.dot_general(xh, ph, _DN_N, preferred_element_type=f32)
            + jax.lax.dot_general(xl, ph, _DN_N, preferred_element_type=f32)
            + jax.lax.dot_general(xl2, ph, _DN_N, preferred_element_type=f32)
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (1, wide), 1)
        keep_old = col < r_off
        in_new = col < r_off + live
        wsl = pl.ds(base, wide)
        old_pf = scr_pf[:, wsl]
        scr_pf[:, wsl] = jnp.where(
            keep_old, old_pf,
            jnp.where(in_new, cmp, _neutral_block(wide)),
        )
        shT = (
            sh_ref[:, b, sl] if feat_major else sh_ref[b, :, sl]
        )  # [3k, C] (bf16 or f32)
        sh_cmp = jax.lax.dot_general(
            shT.astype(jnp.bfloat16) if shT.dtype == jnp.bfloat16 else shT,
            ph if shT.dtype == jnp.bfloat16 else p,
            _DN_N, preferred_element_type=f32,
        ).astype(scr_sh.dtype)
        old_sh = scr_sh[0:n_sh_rows, wsl]
        scr_sh[0:n_sh_rows, wsl] = jnp.where(keep_old, old_sh, sh_cmp)
        return total + live

    # Static trip count when offered (n_static, a python int): Mosaic only
    # software-pipelines static-trip loops (measured 3x per-segment; see
    # the walk's static-prefix note). Exact — slots past a tile's live
    # count are neutral rows (r = -1), which the mask never passes.
    total = jax.lax.fori_loop(
        0, n_static if n_static is not None else n_seg_t, body, jnp.int32(0)
    )
    # neutral tail: stale columns beyond `total` up to the next segment
    # boundary must be inert for phase 2's final segment — INCLUDING the
    # sh scratch: a neutral pf column only zeroes the emission WEIGHT, and
    # 0 * (uninitialized VMEM that happens to be inf/nan) is nan (this
    # exact mode produced whole-nan tiles on the 2M bench scene)
    base = (total // _ALIGN) * _ALIGN
    r_off = total - base
    col = jax.lax.broadcasted_iota(jnp.int32, (1, wide), 1)
    keep_old = col < r_off
    wsl = pl.ds(base, wide)
    old_pf = scr_pf[:, wsl]
    scr_pf[:, wsl] = jnp.where(keep_old, old_pf, _neutral_block(wide))
    old_sh = scr_sh[0:n_sh_rows, wsl]
    scr_sh[0:n_sh_rows, wsl] = jnp.where(
        keep_old, old_sh, jnp.zeros_like(old_sh)
    )
    # coverage: phase 2's last segment ends at ceil(total/seg)*seg
    # <= total + seg <= base + _ALIGN + seg = base + wide  (r_off < _ALIGN)
    return (total + seg - 1) // seg


def _fwd3_kernel(
    nseg_ref, md_ref, d_ref, pf_ref, sh_ref, ut_ref, out_ref, scr_pf=None,
    scr_sh=None,
    *, n_seg, seg, extent2, beta_kill, degree, sh_k, early_exit,
    stable_q=True, batch=1, compact=False, feat_major=False, order_band=0,
):
    rt = d_ref.shape[2]
    f32 = jnp.float32
    # traced hit cap (SMEM scalar): changing max_depth costs an XLA
    # retrace, never a fresh 15-40 min Mosaic kernel compile
    max_depth = md_ref[0, 0].astype(f32)
    log_kill = jnp.log(jnp.float32(beta_kill))
    e2h = extent2 * 0.5  # halved-M convention (pack_fused_features)
    ut = ut_ref[:]

    # Static loop over the program's subtile batch: each subtile has its own
    # rays, shortlist and early-exit walk. batch>1 keeps the Pallas grid
    # small when the film is cut into many small tiles (grid sizes in the
    # thousands crash the remote compile helper; 8x8-pixel tiles need
    # T=4096 at 512^2).
    for b in range(batch):
        if "noop2" in _ABL:  # skip even the per-program ray-block build
            out_ref[b] = jnp.zeros((rt, 8), f32) + d_ref[b, 0, 0]
            continue
        f6, d3, basis = _ray_blocks_t(d_ref, degree, b)
        dx, dy, dz = d3[:, 0:1], d3[:, 1:2], d3[:, 2:3]
        basis_h = basis.astype(sh_ref.dtype)

        sh_rows = sh_ref.shape[2] == pf_ref.shape[2]  # [B, 3k, S] layout
        if compact:
            assert sh_rows, "compact walk requires the [B, 3k, S] sh layout"
        if feat_major:
            assert sh_rows, "feat_major requires the rows sh layout"

        def seg_body(si, carry, b=b, f6=f6, d3=d3, dx=dx, dy=dy, dz=dz,
                     basis_h=basis_h, sh_rows=sh_rows, live_n=None):
            log_beta, lr, lg, lb_, count = carry
            sl = pl.ds(si * seg, seg)
            if compact:
                pfT = scr_pf[:, sl]  # [16, C] — compacted stream
            elif feat_major:
                pfT = pf_ref[:, b, sl]  # [16, C] — [F, B, S] feature-major
            else:
                pfT = pf_ref[b, :, sl]  # [16, C] — native transposed layout
            # shared pair math: the backward sweep recomputes exactly this
            a_, _, t_peak, _, _, q_min, hit, opac, _ = _fwd3_core(
                pfT, f6, d3, dx, dy, dz, e2h, stable_q
            )
            if "notrans" in _ABL:
                alpha = jnp.minimum(opac * (1.0 - q_min), 0.9999)
            else:
                alpha = jnp.minimum(opac * jnp.exp(-q_min), 0.9999)
            alpha = jnp.where(hit, alpha, 0.0)
            live_seg = None
            if live_n is not None:
                # Static-prefix walk: segments at si >= live_n read STALE
                # scratch (the compact phase only neutralizes up to the
                # next boundary). One select makes them exactly inert —
                # where() picks 0.0 even when the stale lane is inf/nan.
                live_seg = si < live_n
                alpha = jnp.where(live_seg, alpha, 0.0)

            if "nodepth" in _ABL:
                cum_hits = count + jnp.zeros_like(alpha)
            else:
                hitf = jnp.where(alpha > 0.0, 1.0, 0.0)
                cum_hits = count + _cumsum_blocked(hitf, ut, seg)
                alpha = jnp.where(cum_hits <= max_depth, alpha, 0.0)
            if "notrans" in _ABL:
                logt = -alpha
            else:
                logt = jnp.log1p(-alpha)
            if "nocum" in _ABL:
                cs_incl = jnp.dot(
                    logt.astype(jnp.bfloat16), ut.astype(jnp.bfloat16),
                    preferred_element_type=f32,
                )
            else:
                lt_hi = logt.astype(jnp.bfloat16).astype(f32)
                cs_incl = _cumsum_blocked(
                    lt_hi, ut, seg
                ) + _cumsum_blocked(logt - lt_hi, ut, seg)
            cs_excl = cs_incl - logt
            if order_band > 0:
                # Banded per-ray order correction (quality mode; mirrors
                # rf_tiled._composite_tile_xla's order_band, see the
                # RFTiledConfig docstring): additive in LOG space — for
                # stream pairs i < j with entry t_j < t_i, j's logt moves
                # from i's suffix into i's prefix and out of j's. Dead
                # columns (alpha = 0) carry logt = 0, so their moves are
                # no-ops regardless of their (garbage / NaN) key — NaN
                # keys compare false and contribute 0. Strictly intra-
                # segment (cross-boundary half-corrections overcount;
                # measured monotonically worse). The key is the entry
                # distance (the exact integrator composites by entry t);
                # Mosaic's ~2^-12 sqrt only flips near-tie pairs whose
                # order is immaterial. Wrapped lanes are masked by iota.
                disc_b = jnp.maximum(e2h - q_min, 0.0)
                tkey = t_peak - jnp.sqrt(disc_b / a_)
                lane = jax.lax.broadcasted_iota(jnp.int32, tkey.shape, 1)
                corr = jnp.zeros_like(logt)
                for s_ in range(1, order_band + 1):
                    t_f = pltpu.roll(tkey, seg - s_, 1)
                    l_f = pltpu.roll(logt, seg - s_, 1)
                    corr = corr + jnp.where(
                        (lane < seg - s_) & (t_f < tkey), l_f, 0.0
                    )
                    t_b = pltpu.roll(tkey, s_, 1)
                    l_b = pltpu.roll(logt, s_, 1)
                    corr = corr - jnp.where(
                        (lane >= s_) & (t_b > tkey), l_b, 0.0
                    )
                cs_excl = cs_excl + corr
            lw = log_beta + cs_excl
            if "notrans" in _ABL:
                w_ = jnp.where(lw > log_kill, (1.0 + lw) * alpha, 0.0)
            else:
                w_ = jnp.where(lw > log_kill, jnp.exp(lw) * alpha, 0.0)

            acc = []
            if "noemis" in _ABL:
                acc = [
                    jnp.sum(w_, axis=1, keepdims=True) * sc
                    for sc in (1.0, 1.01, 1.02)
                ]
            for ch in range(3 if "noemis" not in _ABL else 0):
                if sh_rows:
                    # feature-major [3k, S] table: channel block = k rows
                    if compact:
                        sh_ch = scr_sh[pl.ds(ch * sh_k, sh_k), sl]
                    elif feat_major:
                        sh_ch = sh_ref[pl.ds(ch * sh_k, sh_k), b, sl]
                    else:
                        sh_ch = sh_ref[b, pl.ds(ch * sh_k, sh_k), sl]  # [k, C]
                    e_ch = jax.lax.dot_general(
                        basis_h[:, :sh_k], sh_ch.astype(basis_h.dtype), _DN_N,
                        preferred_element_type=f32,
                    )
                else:
                    sh_ch = sh_ref[b, sl, pl.ds(ch * 16, 16)]  # [C, 16]
                    e_ch = jax.lax.dot_general(
                        basis_h, sh_ch, _DN_T, preferred_element_type=f32
                    )
                # +0.5 emission offset is folded into the DC coefficient
                # by the table builders (rf_tiled.build_state adds
                # sqrt(pi) = 0.5 / Y00 to each channel's DC row)
                e_ch = jnp.maximum(e_ch, 0.0)
                if "sumdot" in _ABL:
                    # A/B: lane reduction on the MXU (ut's last column is
                    # all-ones, hi/lo split). Measured SLOWER than the
                    # VPU lane reduction at bench scale (33.8 vs ~32 ms
                    # frame) — the extra MXU passes serialize against the
                    # transmittance/emission GEMMs. Kept for re-testing.
                    we = w_ * e_ch
                    we_hi = we.astype(jnp.bfloat16).astype(f32)
                    ones_c = ut[:, seg - 1:seg]
                    a_ch = (
                        jnp.dot(we_hi, ones_c, preferred_element_type=f32)
                        + jnp.dot(
                            we - we_hi, ones_c, preferred_element_type=f32
                        )
                    )
                else:
                    a_ch = jnp.sum(w_ * e_ch, axis=1, keepdims=True)
                if live_seg is not None:
                    # stale sh x zero weight is still nan; mask after the
                    # reduce (w_ is already 0 on dead segments)
                    a_ch = jnp.where(live_seg, a_ch, 0.0)
                acc.append(a_ch)

            return (
                log_beta + cs_incl[:, seg - 1:seg],
                lr + acc[0], lg + acc[1], lb_ + acc[2],
                cum_hits[:, seg - 1:seg],
            )

        zeros = jnp.zeros((rt, 1), f32)
        init = (zeros, zeros, zeros, zeros, zeros)
        # Per-tile dynamic trip count: segments holding only culled-out
        # (neutral) cluster slots are never visited (sky/edge tiles).
        n_seg_t = jnp.minimum(
            nseg_ref[0, pl.program_id(0) * batch + b], n_seg
        )
        if "noop" in _ABL:  # grid + DMA floor: skip the walk entirely
            n_seg_t = jnp.minimum(n_seg_t, 0)
        if "static" in _ABL:  # full fixed-trip walk (max pipelining)
            n_seg_t = jnp.int32(n_seg)
        if compact:
            # phase 1: drop columns outside the subtile cone, walk the
            # (much shorter) compacted stream instead
            n_seg_t = _compact_phase(
                pf_ref, sh_ref, ut, scr_pf, scr_sh, b, n_seg_t, seg,
                _subtile_cone(d_ref, b),
                n_static=(
                    n_seg
                    if _COMPACT_STATIC and "noop" not in _ABL else None
                ),
                feat_major=feat_major,
            )
            if "nowalk" in _ABL:  # timing: compact-phase cost alone
                n_seg_t = jnp.minimum(n_seg_t, 0)
        if (
            compact and _WALK_STATIC > 0.0
            and not ({"static", "fori"} & _ABL)
        ):
            # Static-prefix walk + dynamic remainder (round 3): Mosaic
            # only software-pipelines loops with STATIC trip counts — the
            # measured walk cost was ~5.4 us/segment under a fixed-trip
            # fori vs 14-20 us under the dynamic while/fori (q9 on-TPU).
            # Walk ceil(_WALK_STATIC * n_seg) segments unconditionally
            # (dead ones are masked inert inside seg_body — one select),
            # then finish the rare overflowing subtile with a dynamic
            # fori. Exact: every live segment is composited exactly once.
            n_static = max(1, min(n_seg, int(n_seg * _WALK_STATIC + 0.9999)))
            live = n_seg_t

            def body_static(si, carry, seg_body=seg_body, live=live):
                return seg_body(si, carry, live_n=live)

            carry = jax.lax.fori_loop(0, n_static, body_static, init)
            log_beta, lr, lg, lb_, _ = jax.lax.fori_loop(
                n_static, jnp.maximum(live, n_static), seg_body, carry
            )
            si_fin = jnp.maximum(live, n_static)
        elif compact and not ({"static", "fori"} & _ABL):
            # compacted streams average ~2.5 live segments: the early-exit
            # cond's any(active) reduction never pays — plain dynamic fori
            # (q9a: 29.3 ms vs 30.1 for the while_loop)
            log_beta, lr, lg, lb_, _ = jax.lax.fori_loop(
                0, n_seg_t, seg_body, init
            )
            si_fin = n_seg_t
        elif early_exit and not ({"static", "fori"} & _ABL):

            def cond(state, n_seg_t=n_seg_t):
                # a ray is spent when saturated OR past the hit cap (the
                # cap zeroes all later alphas, so beta freezes above the
                # kill threshold and saturation alone never fires — on the
                # bench scene that left 83% of rays walking the whole
                # shortlist for nothing)
                si, (log_beta, _lr, _lg, _lb, count) = state
                active = (log_beta > log_kill) & (count <= max_depth)
                return (si < n_seg_t) & jnp.any(active)

            def body(state, seg_body=seg_body):
                si, carry = state
                return si + 1, seg_body(si, carry)

            si_fin, (log_beta, lr, lg, lb_, _) = jax.lax.while_loop(
                cond, body, (jnp.int32(0), init)
            )
        else:
            log_beta, lr, lg, lb_, _ = jax.lax.fori_loop(
                0, n_seg_t, seg_body, init
            )
            si_fin = n_seg_t
        # col 4: segments actually walked; col 5: live segments (profiling)
        out_ref[b] = jnp.concatenate(
            [
                lr, lg, lb_, jnp.exp(log_beta),
                jnp.full((rt, 1), si_fin.astype(f32)),
                jnp.full((rt, 1), n_seg_t.astype(f32)),
                jnp.zeros((rt, 2), f32),
            ],
            axis=1,
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "seg", "extent2", "max_depth", "beta_kill", "degree", "sh_k",
        "early_exit", "stable_q", "interpret", "batch", "compact",
        "order_band",
    ),
)
def composite_tiles3(
    d8: jnp.ndarray,  # [T, 8, RT] ray direction rows (x, y, z, 5 pad rows)
    pf: jnp.ndarray,  # [T, 16, S] fused per-prim COLUMNS (transposed
    #                    pack_fused_features rows: [*, 16] arrays are
    #                    lane-padded 8x by the TPU layout)
    sh3: jnp.ndarray,  # [T, 3*sh_k, S] feature-major rows (preferred: k
    #                    live coefficients x 3 channel blocks, lanes = S) or
    #                    the legacy [T, S, 48] channel-major layout; f32 or
    #                    bf16 (emission GEMM runs in the table dtype with
    #                    f32 accumulation). The layout is detected by
    #                    sh3.shape[2] == pf.shape[2]; S == 48 would be
    #                    ambiguous and is rejected in _forward3.
    n_seg_t: jnp.ndarray = None,  # [T] int32 live segments per tile (None =
    #                               all; pad slots beyond must be neutral)
    seg: int = 256,
    extent2: float = 9.0,
    max_depth: int = 128,
    beta_kill: float = 0.01,
    degree: int = 3,
    sh_k: int = 16,
    early_exit: bool = True,
    stable_q: bool = True,
    interpret: bool = False,
    batch: int = 1,
    compact: bool = False,
    feat_major: bool = False,
    order_band: int = 0,
):
    """Fused forward compositor. Returns (L [T, RT, 3], beta [T, RT]).

    ``batch``: subtiles processed sequentially per Pallas program (grid =
    T / batch) — use >1 for small tiles so the grid stays in the hundreds.
    ``compact``: in-kernel column compaction — phase 1 drops columns whose
    bounding sphere (pf row 14) misses the subtile cone and appends the
    survivors to a VMEM scratch; phase 2 walks the compacted stream. The
    mask is conservative, so the output is exact (up to one extra f32
    rounding from the one-hot move).
    ``feat_major``: pf is [16, T, S] and sh3 is [3k, T, S] (tile axis in
    the middle) — the layout a middle-axis ``jnp.take`` of [F, Ncl, cs]
    tables produces with NO transpose relayout: the per-frame pack
    becomes a free reshape of pack_fused_features' [16, N] output and the
    per-tile [Tb, K, 16, cs] -> [Tb, 16, S] transpose disappears. Blocks
    DMA'd per grid step are identical to the tile-major layout.
    """
    out = _forward3(
        d8, pf, sh3, n_seg_t, seg, extent2, max_depth, beta_kill,
        degree, sh_k, early_exit, stable_q, interpret, batch, compact,
        feat_major, order_band,
    )
    return out[..., :3], out[..., 3]


# [RT, C] x [RT, K] -> [C, K]
_DN_TT = (((0,), (0,)), ((), ()))
# [K1, C] x [K1, K2] -> [C, K2]  (transpose via contraction on dim 0)
_DN_T0 = (((0,), (0,)), ((), ()))


def _bwd3_kernel(
    nseg_ref, md_ref, d_ref, pf_ref, sh_ref, ut_ref, gl_ref, gbeta_ref,
    gpf_ref, gsh_ref, lb_scratch, cnt_scratch, scr_pf=None, scr_sh=None,
    gscr_pf=None, gscr_sh=None,
    *, n_seg, seg, extent2, beta_kill, degree, sh_k, stable_q,
    batch=1, compact=False, feat_major=False, order_band=0,
):
    """Two-sweep backward for the fused compositor: a forward sweep stores
    the per-segment (log_beta, count) carries, then a reverse sweep
    recomputes each segment and accumulates the adjoints of the packed
    primitive rows (m6, u, w, opac) and the SH table. Mirrors
    composite2._bwd_kernel with the closest-approach q adjoints. Subtiles
    of the program's batch run sequentially, reusing the carry scratch.

    ``compact``: both sweeps walk the compacted stream (phase-1 rebuilt
    per subtile, identical to the forward's); the accumulated compacted-
    column adjoints are scattered back to the original segment slots
    through the transposed one-hot at the end. Gradients equal the
    uncompacted ones: dropped columns have alpha exactly 0, hence zero
    adjoints."""
    for b in range(batch):
        _bwd3_subtile(
            nseg_ref, md_ref, d_ref, pf_ref, sh_ref, ut_ref, gl_ref,
            gbeta_ref,
            gpf_ref, gsh_ref, lb_scratch, cnt_scratch, b,
            scr_pf=scr_pf, scr_sh=scr_sh, gscr_pf=gscr_pf,
            gscr_sh=gscr_sh,
            n_seg=n_seg, seg=seg, extent2=extent2,
            beta_kill=beta_kill, degree=degree, sh_k=sh_k,
            stable_q=stable_q, batch=batch, compact=compact,
            feat_major=feat_major, order_band=order_band,
        )


def _bwd3_subtile(
    nseg_ref, md_ref, d_ref, pf_ref, sh_ref, ut_ref, gl_ref, gbeta_ref,
    gpf_ref, gsh_ref, lb_scratch, cnt_scratch, sb,
    scr_pf=None, scr_sh=None, gscr_pf=None, gscr_sh=None,
    *, n_seg, seg, extent2, beta_kill, degree, sh_k, stable_q,
    batch, compact=False, feat_major=False, order_band=0,
):
    rt = d_ref.shape[2]
    f32 = jnp.float32
    max_depth = md_ref[0, 0].astype(f32)
    hp = jax.lax.Precision.HIGHEST
    log_kill = jnp.log(jnp.float32(beta_kill))
    e2h = extent2 * 0.5  # halved-M convention (pack_fused_features)
    ut = ut_ref[:]
    f6, d3, basis = _ray_blocks_t(d_ref, degree, sb)
    dx, dy, dz = d3[:, 0:1], d3[:, 1:2], d3[:, 2:3]
    basis_h = basis.astype(sh_ref.dtype)

    if feat_major:
        gpf_ref[:, sb] = jnp.zeros_like(gpf_ref[:, sb])
        gsh_ref[:, sb] = jnp.zeros_like(gsh_ref[:, sb])
    else:
        gpf_ref[sb] = jnp.zeros_like(gpf_ref[sb])
        gsh_ref[sb] = jnp.zeros_like(gsh_ref[sb])

    n_orig_t = jnp.minimum(
        nseg_ref[0, pl.program_id(0) * batch + sb], n_seg
    )
    if compact:
        n_seg_t = _compact_phase(
            pf_ref, sh_ref, ut, scr_pf, scr_sh, sb, n_orig_t, seg,
            _subtile_cone(d_ref, sb),
            n_static=n_seg if _COMPACT_STATIC else None,
            feat_major=feat_major,
        )
        gscr_pf[...] = jnp.zeros_like(gscr_pf)
        gscr_sh[...] = jnp.zeros_like(gscr_sh)
    else:
        n_seg_t = n_orig_t

    def common(si):
        sl = pl.ds(si * seg, seg)
        if compact:
            pfT = scr_pf[:, sl]  # [16, C] compacted stream
        elif feat_major:
            pfT = pf_ref[:, sb, sl]  # [16, C]
        else:
            pfT = pf_ref[sb, :, sl]  # [16, C]
        a, b, t_peak, p, q_raw, q_min, hit, opac, pfT = _fwd3_core(
            pfT, f6, d3, dx, dy, dz, e2h, stable_q
        )
        dens = jnp.exp(-q_min)
        raw = opac * dens
        alpha0 = jnp.where(hit, jnp.minimum(raw, 0.9999), 0.0)
        return sl, a, b, t_peak, p, q_raw, hit, opac, dens, raw, alpha0, pfT

    def fwd_body(si, carry):
        log_beta, count = carry
        lb_scratch[si] = log_beta[:, 0]
        cnt_scratch[si] = count[:, 0]
        _, _, _, _, _, _, _, _, _, _, alpha0, _ = common(si)
        hitf = jnp.where(alpha0 > 0.0, 1.0, 0.0)
        cum_hits = count + _cumsum_blocked(hitf, ut, seg)
        alpha = jnp.where(cum_hits <= max_depth, alpha0, 0.0)
        logt = jnp.log1p(-alpha)
        lt_hi = logt.astype(jnp.bfloat16).astype(f32)
        cs_incl = _cumsum_blocked(lt_hi, ut, seg) + _cumsum_blocked(
            logt - lt_hi, ut, seg
        )
        return (log_beta + cs_incl[:, seg - 1:seg], cum_hits[:, seg - 1:seg])

    zeros = jnp.zeros((rt, 1), f32)
    log_beta_fin, _ = jax.lax.fori_loop(0, n_seg_t, fwd_body, (zeros, zeros))

    g_l = gl_ref[sb]  # [RT, 3]
    g_lb_init = gbeta_ref[sb, 0:1, :].T * jnp.exp(log_beta_fin)

    def bwd_body(k, g_lb_next):
        si = n_seg_t - 1 - k
        (sl, a, b, t_peak, p, q_raw, hit, opac, dens, raw, alpha0,
         pfT) = common(si)
        log_beta = lb_scratch[si][:, None]
        count = cnt_scratch[si][:, None]

        hitf = jnp.where(alpha0 > 0.0, 1.0, 0.0)
        cum_hits = count + _cumsum_blocked(hitf, ut, seg)
        depth_ok = cum_hits <= max_depth
        alpha = jnp.where(depth_ok, alpha0, 0.0)
        logt = jnp.log1p(-alpha)
        lt_hi = logt.astype(jnp.bfloat16).astype(f32)
        cs_incl = _cumsum_blocked(lt_hi, ut, seg) + _cumsum_blocked(
            logt - lt_hi, ut, seg
        )
        cs_excl = cs_incl - logt
        tkey = lane_b = None
        if order_band > 0:
            # recompute the forward's banded per-ray order correction
            # (entry-distance keys; see _fwd3_kernel). The keys' own
            # dependence on the primitive params has zero gradient a.e.
            # (step-function indicators — same convention as sort order).
            q_min_b = jnp.maximum(q_raw, 0.0)
            disc_b = jnp.maximum(e2h - q_min_b, 0.0)
            tkey = t_peak - jnp.sqrt(disc_b / a)
            lane_b = jax.lax.broadcasted_iota(jnp.int32, tkey.shape, 1)
            corr = jnp.zeros_like(logt)
            for s_ in range(1, order_band + 1):
                t_f = pltpu.roll(tkey, seg - s_, 1)
                l_f = pltpu.roll(logt, seg - s_, 1)
                corr = corr + jnp.where(
                    (lane_b < seg - s_) & (t_f < tkey), l_f, 0.0
                )
                t_b = pltpu.roll(tkey, s_, 1)
                l_b = pltpu.roll(logt, s_, 1)
                corr = corr - jnp.where(
                    (lane_b >= s_) & (t_b > tkey), l_b, 0.0
                )
            cs_excl = cs_excl + corr
        lw = log_beta + cs_excl
        alive = lw > log_kill
        exp_lw = jnp.exp(lw)
        w_ = jnp.where(alive, exp_lw * alpha, 0.0)

        sh_rows = sh_ref.shape[2] == pf_ref.shape[2]  # [B, 3k, S] layout
        if compact:
            assert sh_rows
        g_w = jnp.zeros((rt, seg), f32)
        for ch in range(3):
            if sh_rows:
                if compact:
                    sh_ch = scr_sh[pl.ds(ch * sh_k, sh_k), sl]
                elif feat_major:
                    sh_ch = sh_ref[pl.ds(ch * sh_k, sh_k), sb, sl]
                else:
                    sh_ch = sh_ref[sb, pl.ds(ch * sh_k, sh_k), sl]  # [k, C]
                e_raw = jax.lax.dot_general(
                    basis_h[:, :sh_k], sh_ch.astype(basis_h.dtype), _DN_N,
                    preferred_element_type=f32,
                )
            else:
                sh_ch = sh_ref[sb, sl, pl.ds(ch * 16, 16)]
                e_raw = jax.lax.dot_general(
                    basis_h, sh_ch, _DN_T, preferred_element_type=f32
                )
            e_ch = jnp.maximum(e_raw, 0.0)
            g_w = g_w + g_l[:, ch:ch + 1] * e_ch
            g_e = jnp.where(e_raw > 0.0, g_l[:, ch:ch + 1] * w_, 0.0)
            if sh_rows:
                g_sh_ch = jax.lax.dot_general(
                    basis[:, :sh_k], g_e, _DN_T0,
                    precision=hp, preferred_element_type=f32,
                )  # [k, C]
                if compact:
                    gscr_sh[pl.ds(ch * sh_k, sh_k), sl] = (
                        gscr_sh[pl.ds(ch * sh_k, sh_k), sl] + g_sh_ch
                    )
                elif feat_major:
                    gsh_ref[pl.ds(ch * sh_k, sh_k), sb, sl] = (
                        gsh_ref[pl.ds(ch * sh_k, sh_k), sb, sl]
                        + g_sh_ch.astype(gsh_ref.dtype)
                    )
                else:
                    gsh_ref[sb, pl.ds(ch * sh_k, sh_k), sl] = (
                        gsh_ref[sb, pl.ds(ch * sh_k, sh_k), sl]
                        + g_sh_ch.astype(gsh_ref.dtype)
                    )
            else:
                g_sh_ch = jax.lax.dot_general(
                    g_e, basis, _DN_TT, precision=hp,
                    preferred_element_type=f32,
                )  # [C, 16]
                gsh_ref[sb, sl, pl.ds(ch * 16, 16)] = (
                    gsh_ref[sb, sl, pl.ds(ch * 16, 16)]
                    + g_sh_ch.astype(gsh_ref.dtype)
                )

        g_lw = g_w * w_
        g_cs_excl = g_lw
        g_cs_incl = g_cs_excl + jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (rt, seg), 1) == seg - 1,
            g_lb_next, 0.0,
        )
        g_logt = jax.lax.dot_general(
            g_cs_incl, ut, (((1,), (1,)), ((), ())),
            precision=hp, preferred_element_type=f32,
        ) - g_cs_excl
        if order_band > 0:
            # banded-correction adjoint: corr_i sums +-logt_{i+-s} under
            # entry-order indicators, so g_logt_j collects the TRANSPOSE —
            # g_lw_i rolled to j = i + s where the forward condition held
            # at i (and mirrored for the backward term). The where() masks
            # zero the lanes that would wrap, so the rolls are safe.
            for s_ in range(1, order_band + 1):
                t_f = pltpu.roll(tkey, seg - s_, 1)
                cf = (lane_b < seg - s_) & (t_f < tkey)
                g_logt = g_logt + pltpu.roll(
                    jnp.where(cf, g_lw, 0.0), s_, 1
                )
                t_b = pltpu.roll(tkey, s_, 1)
                cb = (lane_b >= s_) & (t_b > tkey)
                g_logt = g_logt - pltpu.roll(
                    jnp.where(cb, g_lw, 0.0), seg - s_, 1
                )
        g_alpha = jnp.where(alive, g_w * exp_lw, 0.0) + g_logt * (
            -1.0 / (1.0 - alpha)
        )
        g_alpha = jnp.where(depth_ok & hit, g_alpha, 0.0)
        g_raw = jnp.where(raw < 0.9999, g_alpha, 0.0)
        g_opac_row = jnp.sum(g_raw * dens, axis=0, keepdims=True)  # [1, C]
        g_q = -(g_raw * opac * dens)  # d alpha / d q_half = -alpha
        g_q = jnp.where(q_raw > 0.0, g_q, 0.0)

        if stable_q:
            px, py, pz = p
            m11, m22, m33 = pfT[0:1, :], pfT[1:2, :], pfT[2:3, :]
            m12_2, m13_2, m23_2 = pfT[3:4, :], pfT[4:5, :], pfT[5:6, :]
            # q = m11 px^2 + m22 py^2 + m33 pz^2
            #   + m12_2 px py + m13_2 px pz + m23_2 py pz
            g_m_rows = jnp.concatenate(
                [
                    jnp.sum(g_q * px * px, axis=0, keepdims=True),
                    jnp.sum(g_q * py * py, axis=0, keepdims=True),
                    jnp.sum(g_q * pz * pz, axis=0, keepdims=True),
                    jnp.sum(g_q * px * py, axis=0, keepdims=True),
                    jnp.sum(g_q * px * pz, axis=0, keepdims=True),
                    jnp.sum(g_q * py * pz, axis=0, keepdims=True),
                ],
                axis=0,
            )  # [6, C] (the direct dq/dM route)
            g_px = g_q * (2.0 * m11 * px + m12_2 * py + m13_2 * pz)
            g_py = g_q * (2.0 * m22 * py + m12_2 * px + m23_2 * pz)
            g_pz = g_q * (2.0 * m33 * pz + m13_2 * px + m23_2 * py)
            g_w_rows = jnp.concatenate(
                [
                    jnp.sum(g_px, axis=0, keepdims=True),
                    jnp.sum(g_py, axis=0, keepdims=True),
                    jnp.sum(g_pz, axis=0, keepdims=True),
                ],
                axis=0,
            )  # [3, C]
            g_t = g_px * dx + g_py * dy + g_pz * dz
            g_c0_row = jnp.zeros((1, seg), f32)
        else:
            # q = c0 + t_peak * b
            g_c0_row = jnp.sum(g_q, axis=0, keepdims=True)
            g_m_rows = jnp.zeros((6, seg), f32)
            g_w_rows = jnp.zeros((3, seg), f32)
            g_t = g_q * b
        # t_peak = -b / a
        g_b = -g_t / a
        g_a = g_t * b / (a * a)
        if not stable_q:
            g_b = g_b + g_q * t_peak
        # a = F6 . m6, b = d3 . u  -> [6, C] and [3, C] via MXU
        g_m_rows = g_m_rows + jax.lax.dot_general(
            f6, g_a, _DN_T0, precision=hp, preferred_element_type=f32
        )
        g_u_rows = jax.lax.dot_general(
            d3, g_b, _DN_T0, precision=hp, preferred_element_type=f32
        )  # [3, C]
        g_rows = jnp.concatenate(
            [
                g_m_rows, g_u_rows, g_w_rows, g_opac_row, g_c0_row,
                jnp.zeros((2, seg), f32),
            ],
            axis=0,
        )  # [16, C] — native output layout, no transpose needed
        if compact:
            gscr_pf[:, sl] = gscr_pf[:, sl] + g_rows
        elif feat_major:
            gpf_ref[:, sb, sl] = gpf_ref[:, sb, sl] + g_rows
        else:
            gpf_ref[sb, :, sl] = gpf_ref[sb, :, sl] + g_rows

        return jnp.sum(g_lw, axis=1, keepdims=True) + g_lb_next

    jax.lax.fori_loop(0, n_seg_t, bwd_body, g_lb_init)

    if compact:
        # ---- scatter compacted adjoints back to the original slots -----
        # Re-derive each original segment's mask / base offset (identical
        # phase-1 math), rebuild the offset one-hot P and move the
        # accumulated column adjoints through P^T. Dropped columns get
        # exactly zero (their rows of P^T are zero).
        cone_c = _subtile_cone(d_ref, sb)
        wide = seg + _ALIGN

        def scatter_body(si, total):
            sl = pl.ds(si * seg, seg)
            base = (total // _ALIGN) * _ALIGN
            r_off = total - base
            pfT0 = (
                pf_ref[:, sb, sl] if feat_major else pf_ref[sb, :, sl]
            )
            m = _column_mask(pfT0, cone_c)
            pos = jnp.dot(m, ut, preferred_element_type=f32)
            live = pos[0, seg - 1].astype(jnp.int32)
            pos_t = jnp.transpose(pos).astype(jnp.int32)
            m_t = jnp.transpose(m)
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (seg, wide), 1)
            p_oh = jnp.where(
                (pos_t - 1 + r_off == iota_w) & (m_t > 0.0), 1.0, 0.0
            )  # [C, wide]
            g_cmp = gscr_pf[:, pl.ds(base, wide)]  # [16, wide]
            gh = g_cmp.astype(jnp.bfloat16)
            gl1 = (g_cmp - gh.astype(f32)).astype(jnp.bfloat16)
            gl2 = (
                g_cmp - gh.astype(f32) - gl1.astype(f32)
            ).astype(jnp.bfloat16)
            ph = p_oh.astype(jnp.bfloat16)
            g_orig = (
                jax.lax.dot_general(gh, ph, _DN_T,
                                    preferred_element_type=f32)
                + jax.lax.dot_general(gl1, ph, _DN_T,
                                      preferred_element_type=f32)
                + jax.lax.dot_general(gl2, ph, _DN_T,
                                      preferred_element_type=f32)
            )  # [16, C]
            if feat_major:
                gpf_ref[:, sb, sl] = g_orig
            else:
                gpf_ref[sb, :, sl] = g_orig
            g_cmp_sh = gscr_sh[:, pl.ds(base, wide)]  # [3k, wide] f32
            sh_h = g_cmp_sh.astype(jnp.bfloat16)
            sh_l = (g_cmp_sh - sh_h.astype(f32)).astype(jnp.bfloat16)
            g_sh_orig = jax.lax.dot_general(
                sh_h, ph, _DN_T, preferred_element_type=f32
            ) + jax.lax.dot_general(
                sh_l, ph, _DN_T, preferred_element_type=f32
            )
            if feat_major:
                gsh_ref[:, sb, sl] = g_sh_orig.astype(gsh_ref.dtype)
            else:
                gsh_ref[sb, :, sl] = g_sh_orig.astype(gsh_ref.dtype)
            return total + live

        jax.lax.fori_loop(0, n_orig_t, scatter_body, jnp.int32(0))


def _forward3(d8, pf, sh3, n_seg_t, seg, extent2, max_depth, beta_kill,
              degree, sh_k, early_exit, stable_q, interpret, batch=1,
              compact=False, feat_major=False, order_band=0):
    t = d8.shape[0]
    rt = d8.shape[2]
    s = pf.shape[2]
    assert s % seg == 0
    assert t % batch == 0
    # layout sniffing (sh rows vs legacy wide) is ambiguous at S == 48
    assert feat_major or not (s == 48 and sh3.shape[1] == 48), (
        "S == 48 with a 48-wide sh3 is ambiguous between the rows and "
        "legacy layouts; pad the shortlist away from 48"
    )
    sh_nrows = sh3.shape[0] if feat_major else sh3.shape[1]
    n_seg = s // seg
    if n_seg_t is None:
        n_seg_t = jnp.full((t,), n_seg, jnp.int32)
    md_arr = jnp.full((1, 1), max_depth, jnp.int32)
    kernel = functools.partial(
        _fwd3_kernel,
        n_seg=n_seg, seg=seg, extent2=extent2,
        beta_kill=beta_kill, degree=degree, sh_k=sh_k, early_exit=early_exit,
        stable_q=stable_q, batch=batch, compact=compact,
        feat_major=feat_major, order_band=order_band,
    )
    scratch_shapes = []
    if compact:
        assert sh3.shape[2] == s, "compact needs the [T, 3k, S] sh layout"
        scratch_shapes = [
            pltpu.VMEM((_FEAT, s + seg + _ALIGN), jnp.float32),
            pltpu.VMEM((sh_nrows, s + seg + _ALIGN), sh3.dtype),
        ]
    if feat_major:
        assert pf.shape[0] == _FEAT and sh3.shape[1] == t
        pf_spec = pl.BlockSpec((_FEAT, batch, s), lambda i: (0, i, 0))
        sh_spec = pl.BlockSpec((sh_nrows, batch, s), lambda i: (0, i, 0))
    else:
        pf_spec = pl.BlockSpec((batch, _FEAT, s), lambda i: (i, 0, 0))
        sh_spec = pl.BlockSpec(
            (batch,) + sh3.shape[1:], lambda i: (i, 0, 0)
        )
    out = pl.pallas_call(
        kernel,
        grid=(t // batch,),
        in_specs=[
            pl.BlockSpec(
                (1, t), lambda i: (0, 0), memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((batch, 8, rt), lambda i: (i, 0, 0)),
            pf_spec,
            sh_spec,
            pl.BlockSpec((seg, seg), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((batch, rt, 8), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, rt, 8), jnp.float32),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        n_seg_t.astype(jnp.int32).reshape(1, t), md_arr, d8, pf, sh3,
        jnp.triu(jnp.ones((seg, seg), jnp.float32)),
    )
    return out


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16),
)
def composite_tiles3_ad(
    d8, pf, sh3, n_seg_t,
    seg: int, extent2: float, max_depth: int, beta_kill: float,
    degree: int, sh_k: int, early_exit: bool, stable_q: bool,
    interpret: bool, batch: int = 1, compact: bool = False,
    feat_major: bool = False, order_band: int = 0,
):
    """Differentiable fused compositor (forward = composite_tiles3; custom
    backward kernel). Gradients flow into pf and sh3; d8 / n_seg_t get
    zeros. order_band > 0 (the banded per-ray order correction) is fully
    differentiable: the backward kernel applies the transposed band
    operator to the weight adjoints (the entry keys themselves are
    step-function indicators — zero gradient a.e., like sort order)."""
    out = _forward3(
        d8, pf, sh3, n_seg_t, seg, extent2, max_depth, beta_kill,
        degree, sh_k, early_exit, stable_q, interpret, batch, compact,
        feat_major, order_band,
    )
    return out[..., :3], out[..., 3]


def _fwd3_rule(d8, pf, sh3, n_seg_t, seg, extent2, max_depth, beta_kill,
               degree, sh_k, early_exit, stable_q, interpret, batch=1,
               compact=False, feat_major=False, order_band=0):
    out = _forward3(
        d8, pf, sh3, n_seg_t, seg, extent2, max_depth, beta_kill,
        degree, sh_k, early_exit, stable_q, interpret, batch, compact,
        feat_major, order_band,
    )
    return (out[..., :3], out[..., 3]), (d8, pf, sh3, n_seg_t)


def _bwd3_rule(seg, extent2, max_depth, beta_kill, degree, sh_k, early_exit,
               stable_q, interpret, batch, compact, feat_major, order_band,
               res, cts):
    d8, pf, sh3, n_seg_t = res
    g_l, g_beta = cts
    t = d8.shape[0]
    rt = d8.shape[2]
    s = pf.shape[2]
    n_seg = s // seg
    if n_seg_t is None:
        n_seg_t = jnp.full((t,), n_seg, jnp.int32)
    assert t % batch == 0
    md_arr = jnp.full((1, 1), max_depth, jnp.int32)
    kernel = functools.partial(
        _bwd3_kernel,
        n_seg=n_seg, seg=seg, extent2=extent2,
        beta_kill=beta_kill, degree=degree, sh_k=sh_k, stable_q=stable_q,
        batch=batch, compact=compact, feat_major=feat_major,
        order_band=order_band,
    )
    sh_nrows = sh3.shape[0] if feat_major else sh3.shape[1]
    if feat_major:
        pf_spec = pl.BlockSpec((_FEAT, batch, s), lambda i: (0, i, 0))
        sh_spec = pl.BlockSpec((sh_nrows, batch, s), lambda i: (0, i, 0))
    else:
        pf_spec = pl.BlockSpec((batch, _FEAT, s), lambda i: (i, 0, 0))
        sh_spec = pl.BlockSpec(
            (batch,) + sh3.shape[1:], lambda i: (i, 0, 0)
        )
    gpf, gsh = pl.pallas_call(
        kernel,
        grid=(t // batch,),
        in_specs=[
            pl.BlockSpec(
                (1, t), lambda i: (0, 0), memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((batch, 8, rt), lambda i: (i, 0, 0)),
            pf_spec,
            sh_spec,
            pl.BlockSpec((seg, seg), lambda i: (0, 0)),
            pl.BlockSpec((batch, rt, 3), lambda i: (i, 0, 0)),
            pl.BlockSpec((batch, 1, rt), lambda i: (i, 0, 0)),
        ],
        out_specs=(pf_spec, sh_spec),
        out_shape=(
            jax.ShapeDtypeStruct(
                (_FEAT, t, s) if feat_major else (t, _FEAT, s),
                jnp.float32,
            ),
            jax.ShapeDtypeStruct(sh3.shape, sh3.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_seg, rt), jnp.float32),
            pltpu.VMEM((n_seg, rt), jnp.float32),
        ] + (
            [
                pltpu.VMEM((_FEAT, s + seg + _ALIGN), jnp.float32),
                pltpu.VMEM((sh_nrows, s + seg + _ALIGN), sh3.dtype),
                pltpu.VMEM((_FEAT, s + seg + _ALIGN), jnp.float32),
                pltpu.VMEM((sh_nrows, s + seg + _ALIGN), jnp.float32),
            ]
            if compact else []
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        n_seg_t.astype(jnp.int32).reshape(1, t), md_arr, d8, pf, sh3,
        jnp.triu(jnp.ones((seg, seg), jnp.float32)),
        g_l, g_beta[:, None, :],
    )
    import numpy as _np

    return (
        jnp.zeros_like(d8), gpf, gsh.astype(sh3.dtype),
        _np.zeros(n_seg_t.shape, jax.dtypes.float0),
    )


composite_tiles3_ad.defvjp(_fwd3_rule, _bwd3_rule)
