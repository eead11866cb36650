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
   shortlist is never touched. Forward-only (inference); training uses the
   v1/v2 custom-VJP kernels.

Primitive-side packing (per frame, :func:`pack_fused_features`):
    row = [M11, M22, M33, 2*M12, 2*M13, 2*M23, u(3), w(3), opac, pad(3)]
    with u = M w,  w = o - c.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .composite2 import _ray_blocks

_FEAT = 16

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
    """[N, 16] per-frame rows (M6 doubled-off-diag, u = Mw, w = o - c, opac).

    Built from local coordinates (like composite2's from-prims packer) so no
    large intermediate products appear; every entry is either O(M) or O(w)
    with full relative f32 accuracy.
    """
    from ..ops import quaternion

    rot = quaternion.to_rotation_matrix(prims.quats)  # [N, 3, 3]
    inv_s = 1.0 / prims.scales
    w = origin[None, :] - prims.centers  # [N, 3]
    hp = jax.lax.Precision.HIGHEST
    w_loc = jnp.einsum("nji,nj->ni", rot, w, precision=hp) * inv_s
    u = jnp.einsum("nij,nj->ni", rot, w_loc * inv_s, precision=hp)  # M w
    m = jnp.einsum("nik,nk,njk->nij", rot, inv_s * inv_s, rot, precision=hp)
    m6 = jnp.stack(
        [
            m[:, 0, 0], m[:, 1, 1], m[:, 2, 2],
            2.0 * m[:, 0, 1], 2.0 * m[:, 0, 2], 2.0 * m[:, 1, 2],
        ],
        axis=-1,
    )
    opac = prims.attrs["opacities"][:, 0:1]
    c0 = jnp.sum(w_loc * w_loc, axis=-1, keepdims=True)  # w^T M w
    n = prims.num_prims
    return jnp.concatenate(
        [m6, u, w, opac, c0, jnp.zeros((n, 2), jnp.float32)], axis=1
    )


def neutral_fused_row() -> jnp.ndarray:
    """Inert row: M = I, w = u = 0, opac = 0 (a > 0, never hits)."""
    import numpy as np

    row = np.zeros((16,), np.float32)
    row[:3] = 1.0
    return jnp.asarray(row)


def _fwd3_kernel(
    nseg_ref, d_ref, pf_ref, sh_ref, ut_ref, out_ref,
    *, n_seg, seg, extent2, max_depth, beta_kill, degree, sh_k, early_exit,
    stable_q=True,
):
    rt = d_ref.shape[1]
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST
    log_kill = jnp.log(jnp.float32(beta_kill))
    ut = ut_ref[:]
    f6, d3, basis = _ray_blocks(d_ref, degree)
    dx, dy, dz = d3[:, 0:1], d3[:, 1:2], d3[:, 2:3]
    # identity used to transpose pf rows on the MXU (HIGHEST = exact f32)
    eye16 = jax.lax.broadcasted_iota(jnp.int32, (_FEAT, _FEAT), 0) == \
        jax.lax.broadcasted_iota(jnp.int32, (_FEAT, _FEAT), 1)
    eye16 = eye16.astype(f32)

    def seg_body(si, carry):
        log_beta, lr, lg, lb_, count = carry
        sl = pl.ds(si * seg, seg)
        pf = pf_ref[0, sl, :]  # [C, 16]
        a = _dot3_t(f6, pf[:, 0:6])  # d^T M d
        b = _dot3_t(d3, pf[:, 6:9])  # d^T M w
        # per-primitive broadcast rows via an exact MXU transpose
        pfT = jax.lax.dot_general(
            eye16, pf, _DN_T, precision=hp, preferred_element_type=f32
        )  # [16, C]
        opac = pfT[12:13, :]

        t_peak = -b / a
        if stable_q:
            m11, m22, m33 = pfT[0:1, :], pfT[1:2, :], pfT[2:3, :]
            m12_2, m13_2, m23_2 = pfT[3:4, :], pfT[4:5, :], pfT[5:6, :]
            wx, wy, wz = pfT[9:10, :], pfT[10:11, :], pfT[11:12, :]
            px = wx + t_peak * dx
            py = wy + t_peak * dy
            pz = wz + t_peak * dz
            q_min = (
                m11 * px * px + m22 * py * py + m33 * pz * pz
                + m12_2 * px * py + m13_2 * px * pz + m23_2 * py * pz
            )
        else:
            q_min = pfT[13:14, :] + t_peak * b
        q_min = jnp.maximum(q_min, 0.0)
        disc = (extent2 - q_min) / a
        t_near = t_peak - jnp.sqrt(jnp.maximum(disc, 0.0))
        hit = (disc >= 0.0) & (t_near > 0.0)

        alpha = jnp.minimum(opac * jnp.exp(-0.5 * q_min), 0.9999)
        alpha = jnp.where(hit, alpha, 0.0)

        hitf = jnp.where(alpha > 0.0, 1.0, 0.0)
        cum_hits = count + jnp.dot(hitf, ut, preferred_element_type=f32)
        alpha = jnp.where(cum_hits <= max_depth, alpha, 0.0)
        logt = jnp.log1p(-alpha)
        lt_hi = logt.astype(jnp.bfloat16).astype(f32)
        cs_incl = jnp.dot(lt_hi, ut, preferred_element_type=f32) + jnp.dot(
            logt - lt_hi, ut, preferred_element_type=f32
        )
        cs_excl = cs_incl - logt
        lw = log_beta + cs_excl
        w_ = jnp.where(lw > log_kill, jnp.exp(lw) * alpha, 0.0)

        acc = []
        basis_h = basis.astype(sh_ref.dtype)
        for ch in range(3):
            sh_ch = sh_ref[0, sl, pl.ds(ch * 16, 16)]  # [C, 16] (maybe bf16)
            e_ch = jax.lax.dot_general(
                basis_h, sh_ch, _DN_T, preferred_element_type=f32
            )
            e_ch = jnp.maximum(e_ch + 0.5, 0.0)
            acc.append(jnp.sum(w_ * e_ch, axis=1, keepdims=True))

        return (
            log_beta + cs_incl[:, seg - 1:seg],
            lr + acc[0], lg + acc[1], lb_ + acc[2],
            cum_hits[:, seg - 1:seg],
        )

    zeros = jnp.zeros((rt, 1), f32)
    init = (zeros, zeros, zeros, zeros, zeros)
    # Per-tile dynamic trip count: segments holding only culled-out
    # (neutral) cluster slots are never visited (sky/edge tiles).
    n_seg_t = jnp.minimum(nseg_ref[pl.program_id(0), 0], n_seg)
    if early_exit:

        def cond(state):
            si, (log_beta, *_rest) = state
            return (si < n_seg_t) & (jnp.max(log_beta) > log_kill)

        def body(state):
            si, carry = state
            return si + 1, seg_body(si, carry)

        _, (log_beta, lr, lg, lb_, _) = jax.lax.while_loop(
            cond, body, (jnp.int32(0), init)
        )
    else:
        log_beta, lr, lg, lb_, _ = jax.lax.fori_loop(
            0, n_seg_t, seg_body, init
        )
    out_ref[0] = jnp.concatenate(
        [lr, lg, lb_, jnp.exp(log_beta), jnp.zeros((rt, 4), f32)], axis=1
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "seg", "extent2", "max_depth", "beta_kill", "degree", "sh_k",
        "early_exit", "stable_q", "interpret",
    ),
)
def composite_tiles3(
    d8: jnp.ndarray,  # [T, RT, 8] ray directions (xyz + pad)
    pf: jnp.ndarray,  # [T, S, 16] fused per-prim rows (pack_fused_features)
    sh3: jnp.ndarray,  # [T, S, 48] (f32 or bf16 — emission GEMM runs in the
    #                    table dtype with f32 accumulation)
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
):
    """Fused forward compositor. Returns (L [T, RT, 3], beta [T, RT])."""
    t, rt, _ = d8.shape
    s = pf.shape[1]
    assert s % seg == 0
    n_seg = s // seg
    if n_seg_t is None:
        n_seg_t = jnp.full((t,), n_seg, jnp.int32)
    kernel = functools.partial(
        _fwd3_kernel,
        n_seg=n_seg, seg=seg, extent2=extent2, max_depth=max_depth,
        beta_kill=beta_kill, degree=degree, sh_k=sh_k, early_exit=early_exit,
        stable_q=stable_q,
    )
    out = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(
                (d8.shape[0], 1), lambda i: (0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, rt, 8), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s, _FEAT), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s, 48), lambda i: (i, 0, 0)),
            pl.BlockSpec((seg, seg), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rt, 8), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, rt, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        n_seg_t.astype(jnp.int32).reshape(t, 1), d8, pf, sh3,
        jnp.triu(jnp.ones((seg, seg), jnp.float32)),
    )
    return out[..., :3], out[..., 3]
