"""Camera-relative fused tile compositor (v2) with custom VJP.

Refinement of :mod:`composite`: since every ray in a frame shares the camera
origin ``o``, the quadric coefficients collapse to

    a = F6(d) @ M6,    b = d @ U,      c = c0            (per primitive)
    U  = M o - M c,    c0 = (o-c)^T M (o-c)

so the *ray-side* features are just the direction — the kernel builds
``F6(d) = (dx^2, dy^2, dz^2, dxdy, dxdz, dydz)`` and the SH basis in-register
from ``d``, removing the four [T, RT, 16] per-sample HBM arrays the v1
kernel consumed. The primitive-side features become camera-dependent
([M6, U, c0] packed per frame by rf_tiled) — one cheap [N, 10] pass outside.

Light transport identical to v1 / the reference (volprim_rf.py:63-146).
The backward kernel mirrors v1's two-sweep remat scheme; g(d) is not
computed (rays are not trainable parameters).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FEAT = 16  # packed camera-relative features: M6(6), U(3), c0(1), pad(6)

# [RT, K] x [C, K] -> [RT, C]
_DN_T = (((1,), (1,)), ((), ()))
# [RT, C] x [RT, K] -> [C, K]
_DN_TT = (((0,), (0,)), ((), ()))

_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)


def _ray_blocks(d_ref, degree: int):
    """Build F6(d) [RT, 6], d3 [RT, 3] and the SH basis [RT, K] in-kernel."""
    dx = d_ref[0, :, 0:1]
    dy = d_ref[0, :, 1:2]
    dz = d_ref[0, :, 2:3]
    f6 = jnp.concatenate(
        [dx * dx, dy * dy, dz * dz, dx * dy, dx * dz, dy * dz], axis=1
    )
    d3 = jnp.concatenate([dx, dy, dz], axis=1)
    cols = [jnp.full_like(dx, _C0)]
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


def _seg_forward(d_blocks, pf_ref, aux_ref, si, seg, extent2, hp):
    f6, d3, _ = d_blocks
    f32 = jnp.float32
    sl = pl.ds(si * seg, seg)
    pf = pf_ref[0, sl, :]  # [C, 16]
    a = jax.lax.dot_general(
        f6, pf[:, 0:6], _DN_T, precision=hp, preferred_element_type=f32
    )
    b = jax.lax.dot_general(
        d3, pf[:, 6:9], _DN_T, precision=hp, preferred_element_type=f32
    )
    c = aux_ref[0, 1:2, sl]  # [1, C] broadcast (c0 row)
    q_min_raw = c - b * b / a
    q_min = jnp.maximum(q_min_raw, 0.0)
    disc = (extent2 - q_min) / a
    t_near = -b / a - jnp.sqrt(jnp.maximum(disc, 0.0))
    hit = (disc >= 0.0) & (t_near > 0.0)
    opac = aux_ref[0, 0:1, sl]
    dens = jnp.exp(-0.5 * q_min)
    raw = opac * dens
    alpha0 = jnp.where(hit, jnp.minimum(raw, 0.9999), 0.0)
    return pf, a, b, q_min_raw, hit, opac, dens, raw, alpha0


def _fwd_kernel(
    d_ref, pf_ref, aux_ref, sh_ref, ut_ref, out_ref,
    *, n_seg, seg, extent2, max_depth, beta_kill, degree, sh_k,
):
    rt = d_ref.shape[1]
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST
    log_kill = jnp.log(jnp.float32(beta_kill))
    ut = ut_ref[:]
    blocks = _ray_blocks(d_ref, degree)
    basis = blocks[2]

    def seg_body(si, carry):
        log_beta, lr, lg, lb_, count = carry
        _, a, b, q_min_raw, hit, opac, dens, raw, alpha0 = _seg_forward(
            blocks, pf_ref, aux_ref, si, seg, extent2, hp
        )
        sl = pl.ds(si * seg, seg)
        hitf = jnp.where(alpha0 > 0.0, 1.0, 0.0)
        cum_hits = count + jnp.dot(hitf, ut, preferred_element_type=f32)
        alpha = jnp.where(cum_hits <= max_depth, alpha0, 0.0)
        logt = jnp.log1p(-alpha)
        lt_hi = logt.astype(jnp.bfloat16).astype(f32)
        cs_incl = jnp.dot(lt_hi, ut, preferred_element_type=f32) + jnp.dot(
            logt - lt_hi, ut, preferred_element_type=f32
        )
        cs_excl = cs_incl - logt
        lw = log_beta + cs_excl
        w = jnp.where(lw > log_kill, jnp.exp(lw) * alpha, 0.0)

        acc = []
        for ch in range(3):
            sh_ch = sh_ref[0, sl, pl.ds(ch * 16, 16)]  # [C, 16]
            e_ch = jax.lax.dot_general(
                basis, sh_ch, _DN_T, preferred_element_type=f32
            )
            e_ch = jnp.maximum(e_ch + 0.5, 0.0)
            acc.append(jnp.sum(w * e_ch, axis=1, keepdims=True))

        return (
            log_beta + cs_incl[:, seg - 1:seg],
            lr + acc[0], lg + acc[1], lb_ + acc[2],
            cum_hits[:, seg - 1:seg],
        )

    zeros = jnp.zeros((rt, 1), f32)
    log_beta, lr, lg, lb_, _ = jax.lax.fori_loop(
        0, n_seg, seg_body, (zeros, zeros, zeros, zeros, zeros)
    )
    out_ref[0] = jnp.concatenate(
        [lr, lg, lb_, jnp.exp(log_beta), jnp.zeros((rt, 4), f32)], axis=1
    )


def _bwd_kernel(
    d_ref, pf_ref, aux_ref, sh_ref, ut_ref, gl_ref, gbeta_ref,
    gpf_ref, gaux_ref, gsh_ref, lb_scratch, cnt_scratch,
    *, n_seg, seg, extent2, max_depth, beta_kill, degree, sh_k,
):
    rt = d_ref.shape[1]
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST
    log_kill = jnp.log(jnp.float32(beta_kill))
    ut = ut_ref[:]
    blocks = _ray_blocks(d_ref, degree)
    f6, d3, basis = blocks

    gpf_ref[0] = jnp.zeros_like(gpf_ref[0])
    gaux_ref[0] = jnp.zeros_like(gaux_ref[0])
    gsh_ref[0] = jnp.zeros_like(gsh_ref[0])

    def fwd_body(si, carry):
        log_beta, count = carry
        lb_scratch[si] = log_beta[:, 0]
        cnt_scratch[si] = count[:, 0]
        _, _, _, _, _, _, _, _, alpha0 = _seg_forward(
            blocks, pf_ref, aux_ref, si, seg, extent2, hp
        )
        hitf = jnp.where(alpha0 > 0.0, 1.0, 0.0)
        cum_hits = count + jnp.dot(hitf, ut, preferred_element_type=f32)
        alpha = jnp.where(cum_hits <= max_depth, alpha0, 0.0)
        logt = jnp.log1p(-alpha)
        lt_hi = logt.astype(jnp.bfloat16).astype(f32)
        cs_incl = jnp.dot(lt_hi, ut, preferred_element_type=f32) + jnp.dot(
            logt - lt_hi, ut, preferred_element_type=f32
        )
        return (log_beta + cs_incl[:, seg - 1:seg], cum_hits[:, seg - 1:seg])

    zeros = jnp.zeros((rt, 1), f32)
    log_beta_fin, _ = jax.lax.fori_loop(0, n_seg, fwd_body, (zeros, zeros))

    g_l = gl_ref[0]  # [RT, 3]
    g_lb_init = gbeta_ref[0, 0:1, :].T * jnp.exp(log_beta_fin)

    def bwd_body(k, g_lb_next):
        si = n_seg - 1 - k
        pf, a, b, q_min_raw, hit, opac, dens, raw, alpha0 = _seg_forward(
            blocks, pf_ref, aux_ref, si, seg, extent2, hp
        )
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
        g_w = jnp.zeros((rt, seg), f32)
        for ch in range(3):
            sh_ch = sh_ref[0, sl, pl.ds(ch * 16, 16)]
            e_raw = jax.lax.dot_general(
                basis, sh_ch, _DN_T, preferred_element_type=f32
            ) + 0.5
            e_ch = jnp.maximum(e_raw, 0.0)
            g_w = g_w + g_l[:, ch:ch + 1] * e_ch
            g_e = jnp.where(e_raw > 0.0, g_l[:, ch:ch + 1] * w, 0.0)
            g_sh_ch = jax.lax.dot_general(
                g_e, basis, _DN_TT, precision=hp, preferred_element_type=f32
            )
            gsh_ref[0, sl, pl.ds(ch * 16, 16)] = (
                gsh_ref[0, sl, pl.ds(ch * 16, 16)] + g_sh_ch
            )

        g_lw = g_w * w
        g_cs_excl = g_lw
        g_cs_incl = g_cs_excl + jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (rt, seg), 1) == seg - 1,
            g_lb_next, 0.0,
        )
        g_logt = jax.lax.dot_general(
            g_cs_incl, ut, (((1,), (1,)), ((), ())),
            precision=hp, preferred_element_type=f32,
        ) - g_cs_excl
        g_alpha = jnp.where(alive, g_w * exp_lw, 0.0) + g_logt * (
            -1.0 / (1.0 - alpha)
        )
        g_alpha = jnp.where(depth_ok & hit, g_alpha, 0.0)
        g_raw = jnp.where(raw < 0.9999, g_alpha, 0.0)
        gaux_ref[0, 0:1, sl] = gaux_ref[0, 0:1, sl] + jnp.sum(
            g_raw * dens, axis=0, keepdims=True
        )
        g_qmin = g_raw * opac * dens * (-0.5)
        g_qmin = jnp.where(q_min_raw > 0.0, g_qmin, 0.0)
        # c0 enters as a broadcast row: its adjoint goes to the aux input
        gaux_ref[0, 1:2, sl] = gaux_ref[0, 1:2, sl] + jnp.sum(
            g_qmin, axis=0, keepdims=True
        )
        g_a = g_qmin * (b * b) / (a * a)
        g_b = g_qmin * (-2.0 * b / a)
        g_m6 = jax.lax.dot_general(
            g_a, f6, _DN_TT, precision=hp, preferred_element_type=f32
        )  # [C, 6]
        g_u = jax.lax.dot_general(
            g_b, d3, _DN_TT, precision=hp, preferred_element_type=f32
        )  # [C, 3]
        g_pf = jnp.concatenate(
            [g_m6, g_u, jnp.zeros((seg, _FEAT - 9), f32)], axis=1
        )
        gpf_ref[0, sl, :] = gpf_ref[0, sl, :] + g_pf

        return jnp.sum(g_lw, axis=1, keepdims=True) + g_lb_next

    jax.lax.fori_loop(0, n_seg, bwd_body, g_lb_init)


def _specs(t, rt, s, seg, sh_k):
    in_specs = [
        pl.BlockSpec((1, rt, 8), lambda i: (i, 0, 0)),  # d (xyz + pad)
        pl.BlockSpec((1, s, _FEAT), lambda i: (i, 0, 0)),  # pf_cam
        pl.BlockSpec((1, 2, s), lambda i: (i, 0, 0)),  # aux: opac + c0
        pl.BlockSpec((1, s, 48), lambda i: (i, 0, 0)),  # sh (16/channel)
        pl.BlockSpec((seg, seg), lambda i: (0, 0)),  # ut
    ]
    return in_specs


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10)
)
def composite_tiles2(
    d8, pf_cam, aux, sh3,
    seg: int, extent2: float, max_depth: int, beta_kill: float,
    degree: int, sh_k: int, interpret: bool,
):
    """Camera-relative fused compositor. Returns (L [T, RT, 3], beta)."""
    return _forward(
        d8, pf_cam, aux, sh3, seg, extent2, max_depth, beta_kill,
        degree, sh_k, interpret,
    )


def _forward(d8, pf_cam, aux, sh3, seg, extent2, max_depth, beta_kill,
             degree, sh_k, interpret):
    t, rt, _ = d8.shape
    s = pf_cam.shape[1]
    assert s % seg == 0
    kernel = functools.partial(
        _fwd_kernel, n_seg=s // seg, seg=seg, extent2=extent2,
        max_depth=max_depth, beta_kill=beta_kill, degree=degree, sh_k=sh_k,
    )
    out = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=_specs(t, rt, s, seg, sh_k),
        out_specs=pl.BlockSpec((1, rt, 8), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, rt, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(d8, pf_cam, aux, sh3, jnp.triu(jnp.ones((seg, seg), jnp.float32)))
    return out[..., :3], out[..., 3]


def _fwd_rule(d8, pf_cam, aux, sh3, seg, extent2, max_depth, beta_kill,
              degree, sh_k, interpret):
    out = _forward(
        d8, pf_cam, aux, sh3, seg, extent2, max_depth, beta_kill,
        degree, sh_k, interpret,
    )
    return out, (d8, pf_cam, aux, sh3)


def _bwd_rule(seg, extent2, max_depth, beta_kill, degree, sh_k, interpret,
              res, cts):
    d8, pf_cam, aux, sh3 = res
    g_l, g_beta = cts
    t, rt, _ = d8.shape
    s = pf_cam.shape[1]
    n_seg = s // seg
    kernel = functools.partial(
        _bwd_kernel, n_seg=n_seg, seg=seg, extent2=extent2,
        max_depth=max_depth, beta_kill=beta_kill, degree=degree, sh_k=sh_k,
    )
    gpf, gaux, gsh = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=_specs(t, rt, s, seg, sh_k) + [
            pl.BlockSpec((1, rt, 3), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, rt), lambda i: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, s, _FEAT), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 2, s), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s, 48), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, s, _FEAT), jnp.float32),
            jax.ShapeDtypeStruct((t, 2, s), jnp.float32),
            jax.ShapeDtypeStruct((t, s, 48), jnp.float32),
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
        d8, pf_cam, aux, sh3,
        jnp.triu(jnp.ones((seg, seg), jnp.float32)),
        g_l, g_beta[:, None, :],
    )
    return jnp.zeros_like(d8), gpf, gaux, gsh


composite_tiles2.defvjp(_fwd_rule, _bwd_rule)


def camera_relative_features_from_prims(prims, origin: jnp.ndarray):
    """Well-conditioned camera-relative features straight from the primitive
    parameters: local coordinates avoid the o^T M o - 2 o.Mc + c^T M c
    cancellation of the feats16-based path (their f32 rounding is visible in
    gradients). Returns [N, 16] rows (M6, U = M(o-c), c0 = |p_loc|^2, pad).
    """
    from ..ops import quaternion

    rot = quaternion.to_rotation_matrix(prims.quats)  # [N, 3, 3]
    inv_s = 1.0 / prims.scales
    rel = origin[None, :] - prims.centers
    hp = jax.lax.Precision.HIGHEST
    p_loc = jnp.einsum("nji,nj->ni", rot, rel, precision=hp) * inv_s
    c0 = jnp.sum(p_loc * p_loc, axis=-1)
    u = jnp.einsum("nij,nj->ni", rot, p_loc * inv_s, precision=hp)
    m = jnp.einsum("nik,nk,njk->nij", rot, inv_s * inv_s, rot, precision=hp)
    m6 = jnp.stack(
        [
            m[:, 0, 0], m[:, 1, 1], m[:, 2, 2],
            2.0 * m[:, 0, 1], 2.0 * m[:, 0, 2], 2.0 * m[:, 1, 2],
        ],
        axis=-1,
    )
    n = prims.num_prims
    return jnp.concatenate(
        [m6, u, c0[:, None], jnp.zeros((n, 6), jnp.float32)], axis=1
    )


def camera_relative_features(feats16: jnp.ndarray, origin: jnp.ndarray):
    """[N, 16] scene features (M6, Mc, cMc) + camera origin -> [N, 16]
    camera-relative features (M6, U = Mo - Mc, c0 = o^T M o - 2 o.Mc + cMc).

    Differentiable; gradients flow back into the scene features.
    """
    m11, m22, m33 = feats16[:, 0], feats16[:, 1], feats16[:, 2]
    m12 = 0.5 * feats16[:, 3]
    m13 = 0.5 * feats16[:, 4]
    m23 = 0.5 * feats16[:, 5]
    mc = feats16[:, 6:9]
    cmc = feats16[:, 9]
    ox, oy, oz = origin[0], origin[1], origin[2]
    mo = jnp.stack(
        [
            m11 * ox + m12 * oy + m13 * oz,
            m12 * ox + m22 * oy + m23 * oz,
            m13 * ox + m23 * oy + m33 * oz,
        ],
        axis=-1,
    )
    u = mo - mc
    c0 = (
        mo[:, 0] * ox + mo[:, 1] * oy + mo[:, 2] * oz
        - 2.0 * (mc[:, 0] * ox + mc[:, 1] * oy + mc[:, 2] * oz)
        + cmc
    )
    out = jnp.concatenate(
        [feats16[:, 0:6], u, c0[:, None], jnp.zeros_like(feats16[:, 10:])],
        axis=1,
    )
    return out
