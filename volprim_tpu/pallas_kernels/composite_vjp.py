"""Custom VJP for the fused tile compositor.

Backward pass as a second Pallas kernel (pattern per the Pallas guide's
custom-VJP section): the forward kernel stores nothing — the backward
re-runs a cheap forward sweep caching only the per-segment entry log-beta /
hit-count (n_seg x RT scratch in VMEM), then walks the segments in reverse
propagating adjoints. All the adjoint cumulative sums are triangular GEMMs
like the forward.

Gradients are returned for the primitive-side inputs (pf, opac, sh) —
parameter gradients flow through these via the differentiable feature
packing/gathers in rf_tiled.build_state/render_state. Ray-side features and
the basis are treated as detached (camera geometry is not a trainable
parameter in the reference pipelines either; refine_3dg_dataset.py:131-149
optimizes data/opacities/sh_coeffs).

Derivation sketch (per segment, mirroring the forward):
    w       = [lw > log_kill] * exp(lw) * alpha,   lw = lb + cs_excl
    dL/dw   = sum_ch gL[r,ch] * E[r,c,ch]
    g_lw    = g_w * w
    g_cs_incl[c] = g_cs_excl[c] (+ g_lb_next on the last column)
    g_logt  = reverse_cumsum(g_cs_incl) - g_cs_excl
    g_alpha = g_w * exp(lw) * [kill] + g_logt * (-1 / (1 - alpha))
    g_opac  = sum_r g_alpha * D * [unclamped];  g_qmin via D = exp(-qmin/2)
    (g_a, g_b, g_c) from q_min = max(c - b^2/a, 0); g_pf = f^T @ g_(a|b|c)
    g_sh    = basis^T @ (gL_ch * w),  masked by the emission clamp
    g_lb_prev = sum_c g_lw + g_lb_next
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import composite as fwd

_FEAT = fwd._FEAT
_SH = fwd._SH
_DN_T = fwd._DN_T
# contract dim 0 of lhs with dim 0 of rhs: [RT,16]^T-style products
_DN_TT = (((0,), (0,)), ((), ()))


def _bwd_kernel(
    fa_ref, fb_ref, fc_ref, basis_ref, pf_ref, opac_ref, sh_ref, ut_ref,
    gl_ref, gbeta_ref,
    gpf_ref, gopac_ref, gsh_ref,
    lb_scratch, cnt_scratch,
    *, n_seg: int, seg: int, extent2: float, max_depth: int, beta_kill: float,
):
    fa = fa_ref[0]
    fb = fb_ref[0]
    fc = fc_ref[0]
    basis = basis_ref[0]
    ut = ut_ref[:]
    rt = fa.shape[0]
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST
    log_kill = jnp.log(jnp.float32(beta_kill))

    def dot_t(lhs, rhs, precision=None):
        return jax.lax.dot_general(
            lhs, rhs, _DN_T, precision=precision, preferred_element_type=f32
        )

    def seg_fwd(si):
        """Recompute the forward quantities of segment si."""
        sl = pl.ds(si * seg, seg)
        pf = pf_ref[0, sl, :]
        a = dot_t(fa, pf, hp)
        b = dot_t(fb, pf, hp)
        c = dot_t(fc, pf, hp)
        q_min_raw = c - b * b / a
        q_min = jnp.maximum(q_min_raw, 0.0)
        disc = (extent2 - q_min) / a
        t_near = -b / a - jnp.sqrt(jnp.maximum(disc, 0.0))
        hit = (disc >= 0.0) & (t_near > 0.0)
        opac = opac_ref[0, 0:1, sl]
        dens = jnp.exp(-0.5 * q_min)
        raw = opac * dens
        alpha0 = jnp.where(hit, jnp.minimum(raw, 0.9999), 0.0)
        return pf, a, b, c, q_min_raw, hit, opac, dens, raw, alpha0

    # ---- pass 1: forward sweep, cache per-segment entry lb / count --------
    def fwd_body(si, carry):
        log_beta, count = carry
        lb_scratch[si] = log_beta[:, 0]
        cnt_scratch[si] = count[:, 0]
        _, _, _, _, _, _, _, _, _, alpha0 = seg_fwd(si)
        hitf = jnp.where(alpha0 > 0.0, 1.0, 0.0)
        cum_hits = count + jnp.dot(hitf, ut, preferred_element_type=f32)
        alpha = jnp.where(cum_hits <= max_depth, alpha0, 0.0)
        logt = jnp.log1p(-alpha)
        lt_hi = logt.astype(jnp.bfloat16).astype(f32)
        cs_incl = jnp.dot(lt_hi, ut, preferred_element_type=f32) + jnp.dot(
            logt - lt_hi, ut, preferred_element_type=f32
        )
        return (
            log_beta + cs_incl[:, seg - 1:seg],
            cum_hits[:, seg - 1:seg],
        )

    # zero the accumulated outputs before both sweeps
    gpf_ref[0] = jnp.zeros_like(gpf_ref[0])
    gopac_ref[0] = jnp.zeros_like(gopac_ref[0])
    gsh_ref[0] = jnp.zeros_like(gsh_ref[0])

    zeros = jnp.zeros((rt, 1), f32)
    log_beta_fin, _ = jax.lax.fori_loop(0, n_seg, fwd_body, (zeros, zeros))

    # ---- pass 2: reverse sweep -------------------------------------------
    g_l = gl_ref[0]  # [RT, 3] upstream dL
    # d(beta)/d(log_beta_final) = beta
    g_lb_init = gbeta_ref[0, 0:1, :].T * jnp.exp(log_beta_fin)  # [RT, 1]

    def bwd_body(k, g_lb_next):
        si = n_seg - 1 - k
        pf, a, b, c, q_min_raw, hit, opac, dens, raw, alpha0 = seg_fwd(si)
        log_beta = lb_scratch[si][:, None]
        count = cnt_scratch[si][:, None]

        hitf = jnp.where(alpha0 > 0.0, 1.0, 0.0)
        cum_hits = count + jnp.dot(hitf, ut, preferred_element_type=f32)
        depth_ok = cum_hits <= max_depth
        alpha = jnp.where(depth_ok, alpha0, 0.0)
        logt = jnp.log1p(-alpha)
        lt_hi = logt.astype(jnp.bfloat16).astype(f32)
        cs_incl = jnp.dot(lt_hi, ut, preferred_element_type=f32) + jnp.dot(
            logt - lt_hi, ut, preferred_element_type=f32
        )
        cs_excl = cs_incl - logt
        lw = log_beta + cs_excl
        alive = lw > log_kill
        exp_lw = jnp.exp(lw)
        w = jnp.where(alive, exp_lw * alpha, 0.0)

        sl = pl.ds(si * seg, seg)
        # emission adjoints + g_w
        g_w = jnp.zeros((rt, seg), f32)
        for ch in range(3):
            sh_ch = sh_ref[0, sl, pl.ds(ch * _SH, _SH)]  # [C, 16]
            e_raw = dot_t(basis, sh_ch) + 0.5
            e_pos = e_raw > 0.0
            e_ch = jnp.maximum(e_raw, 0.0)
            g_w = g_w + g_l[:, ch:ch + 1] * e_ch
            # g_sh[c, k] = sum_r basis[r, k] * (gL * w * [e>0])[r, c]
            g_e = jnp.where(e_pos, g_l[:, ch:ch + 1] * w, 0.0)
            g_sh_ch = jax.lax.dot_general(
                g_e, basis, _DN_TT, precision=hp, preferred_element_type=f32
            )  # [C, 16]
            gsh_ref[0, sl, pl.ds(ch * _SH, _SH)] = (
                gsh_ref[0, sl, pl.ds(ch * _SH, _SH)] + g_sh_ch
            )

        g_lw = g_w * w  # both the exp factor and the kill mask
        g_cs_excl = g_lw
        # cs_incl adjoint: cs_excl contribution plus the carry into the next
        # segment on the last column
        g_cs_incl = g_cs_excl + jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (rt, seg), 1) == seg - 1,
            g_lb_next, 0.0,
        )
        # g_logt[c] = sum_{c' >= c} g_cs_incl[c'] - g_cs_excl[c]
        # reverse cumsum = matmul with ut^T (lower triangular incl diag)
        g_logt = jax.lax.dot_general(
            g_cs_incl, ut, (((1,), (1,)), ((), ())),
            precision=hp, preferred_element_type=f32,
        ) - g_cs_excl
        g_alpha = jnp.where(alive, g_w * exp_lw, 0.0) + g_logt * (
            -1.0 / (1.0 - alpha)
        )
        g_alpha = jnp.where(depth_ok & hit, g_alpha, 0.0)
        unclamped = raw < 0.9999
        g_raw = jnp.where(unclamped, g_alpha, 0.0)
        # raw = opac * exp(-q_min/2)
        g_opac_mat = g_raw * dens  # [RT, C]
        gopac_ref[0, 0:1, sl] = gopac_ref[0, 0:1, sl] + jnp.sum(
            g_opac_mat, axis=0, keepdims=True
        )
        g_qmin = g_raw * opac * dens * (-0.5)
        g_qmin = jnp.where(q_min_raw > 0.0, g_qmin, 0.0)
        g_a = g_qmin * (b * b) / (a * a)
        g_b = g_qmin * (-2.0 * b / a)
        g_c = g_qmin
        # g_pf[c, f] = sum_r f[r, f] * g_coef[r, c]
        g_pf = (
            jax.lax.dot_general(
                g_a, fa, _DN_TT, precision=hp, preferred_element_type=f32
            )
            + jax.lax.dot_general(
                g_b, fb, _DN_TT, precision=hp, preferred_element_type=f32
            )
            + jax.lax.dot_general(
                g_c, fc, _DN_TT, precision=hp, preferred_element_type=f32
            )
        )  # [C, 16]
        gpf_ref[0, sl, :] = gpf_ref[0, sl, :] + g_pf

        g_lb = jnp.sum(g_lw, axis=1, keepdims=True) + g_lb_next
        return g_lb

    jax.lax.fori_loop(0, n_seg, bwd_body, g_lb_init)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11)
)
def composite_tiles_ad(
    fa, fb, fc, basis, pf, opac, sh3,
    seg: int = 256,
    extent2: float = 9.0,
    max_depth: int = 128,
    beta_kill: float = 0.01,
    interpret: bool = False,
):
    """Differentiable fused compositor (grads for pf/opac/sh3)."""
    return fwd.composite_tiles(
        fa, fb, fc, basis, pf, opac, sh3,
        seg=seg, extent2=extent2, max_depth=max_depth,
        beta_kill=beta_kill, interpret=interpret,
    )


def _fwd_rule(fa, fb, fc, basis, pf, opac, sh3, seg, extent2, max_depth,
              beta_kill, interpret):
    out = fwd.composite_tiles(
        fa, fb, fc, basis, pf, opac, sh3,
        seg=seg, extent2=extent2, max_depth=max_depth,
        beta_kill=beta_kill, interpret=interpret,
    )
    return out, (fa, fb, fc, basis, pf, opac, sh3)


def _bwd_rule(seg, extent2, max_depth, beta_kill, interpret, res, cts):
    fa, fb, fc, basis, pf, opac, sh3 = res
    g_l, g_beta = cts
    t, rt, _ = fa.shape
    s = pf.shape[1]
    n_seg = s // seg

    kernel = functools.partial(
        _bwd_kernel,
        n_seg=n_seg, seg=seg, extent2=extent2,
        max_depth=max_depth, beta_kill=beta_kill,
    )
    gpf, gopac, gsh = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, rt, _FEAT), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, rt, _FEAT), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, rt, _FEAT), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, rt, _SH), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s, _FEAT), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s, 3 * _SH), lambda i: (i, 0, 0)),
            pl.BlockSpec((seg, seg), lambda i: (0, 0)),
            pl.BlockSpec((1, rt, 3), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, rt), lambda i: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, s, _FEAT), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s, 3 * _SH), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, s, _FEAT), jnp.float32),
            jax.ShapeDtypeStruct((t, 1, s), jnp.float32),
            jax.ShapeDtypeStruct((t, s, 3 * _SH), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_seg, rt), jnp.float32),
            pltpu.VMEM((n_seg, rt), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        fa, fb, fc, basis, pf, opac, sh3,
        jnp.triu(jnp.ones((seg, seg), jnp.float32)),
        g_l, g_beta[:, None, :],
    )
    zf = jnp.zeros_like(fa)
    return (zf, jnp.zeros_like(fb), jnp.zeros_like(fc),
            jnp.zeros_like(basis), gpf, gopac, gsh)


composite_tiles_ad.defvjp(_fwd_rule, _bwd_rule)
