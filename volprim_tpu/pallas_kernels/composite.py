"""Fused tile-compositing Pallas kernel for the rf integrator.

One kernel invocation composites a whole pixel tile against its depth-sorted
candidate shortlist, replacing the XLA segment pipeline in
:mod:`volprim_tpu.models.rf_tiled` (same math: 3DGRT peak transmittance +
SH emission front-to-back, reference ``volprim_rf.py:63-146``):

- quadric coefficients a/b/c via MXU GEMMs on the feature-matrix form
  (``ops.quadric.prim_features`` / ``ray_features``),
- alpha + hit predicates on the VPU,
- front-to-back accumulation in log-space: cumulative products become
  matmuls against a constant triangular matrix (associative scans are
  awkward in-kernel, triangular GEMMs ride the MXU). The triangular matrix
  is 0/1 — exactly representable in bf16 — so a hi/lo split of the log
  factors recovers near-f32 accuracy at single-pass MXU speed,
- per-segment SH emission GEMMs,

all resident in VMEM — the [rays x candidates] working set never touches
HBM, which is what the pure-XLA pipeline spends most of its time on.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FEAT = 16  # quadric feature columns, padded 10 -> 16
_SH = 16  # SH basis functions, padded to 16 (degree 3)

# contract last dim of lhs with last dim of rhs: [RT,16] x [C,16] -> [RT,C]
_DN_T = (((1,), (1,)), ((), ()))


def _kernel(
    fa_ref, fb_ref, fc_ref, basis_ref, pf_ref, opac_ref, sh_ref, ut_ref,
    out_ref,
    *, n_seg: int, seg: int, extent2: float, max_depth: int, beta_kill: float,
):
    fa = fa_ref[0]  # [RT, 16]
    fb = fb_ref[0]
    fc = fc_ref[0]
    basis = basis_ref[0]  # [RT, 16]
    ut = ut_ref[:]  # [C, C] upper-tri (incl diag) ones
    rt = fa.shape[0]

    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST
    log_kill = jnp.log(jnp.float32(beta_kill))

    def dot_t(lhs, rhs, precision=None):
        return jax.lax.dot_general(
            lhs, rhs, _DN_T, precision=precision, preferred_element_type=f32
        )

    def seg_body(si, carry):
        log_beta, lr, lg, lb, count = carry  # [RT, 1] each
        sl = pl.ds(si * seg, seg)
        pf = pf_ref[0, sl, :]  # [C, 16]
        a = dot_t(fa, pf, hp)  # [RT, C]
        b = dot_t(fb, pf, hp)
        c = dot_t(fc, pf, hp)
        q_min = jnp.maximum(c - b * b / a, 0.0)
        disc = (extent2 - q_min) / a
        t_near = -b / a - jnp.sqrt(jnp.maximum(disc, 0.0))
        hit = (disc >= 0.0) & (t_near > 0.0)

        opac = opac_ref[0, :, sl]  # [1, C]
        alpha = jnp.minimum(opac * jnp.exp(-0.5 * q_min), 0.9999)
        alpha = jnp.where(hit, alpha, 0.0)

        # Cumulative sums as triangular GEMMs; ut is exact in bf16 so the
        # single-pass products are exact for 0/1 hits and, with a hi/lo
        # split of logt, near-f32 accurate — 6x cheaper than HIGHEST.
        hitf = jnp.where(alpha > 0.0, 1.0, 0.0)
        cum_hits = count + jnp.dot(hitf, ut, preferred_element_type=f32)
        alpha = jnp.where(cum_hits <= max_depth, alpha, 0.0)

        logt = jnp.log1p(-alpha)
        lt_hi = logt.astype(jnp.bfloat16).astype(f32)
        lt_lo = logt - lt_hi
        cs_incl = jnp.dot(lt_hi, ut, preferred_element_type=f32) + jnp.dot(
            lt_lo, ut, preferred_element_type=f32
        )
        cs_excl = cs_incl - logt
        lw = log_beta + cs_excl
        w = jnp.where(lw > log_kill, jnp.exp(lw) * alpha, 0.0)

        acc = []
        for ch in range(3):
            sh_ch = sh_ref[0, sl, pl.ds(ch * _SH, _SH)]  # [C, 16]
            e_ch = dot_t(basis, sh_ch)
            e_ch = jnp.maximum(e_ch + 0.5, 0.0)
            acc.append(jnp.sum(w * e_ch, axis=1, keepdims=True))

        log_beta = log_beta + cs_incl[:, seg - 1:seg]
        count = cum_hits[:, seg - 1:seg]
        return (
            log_beta, lr + acc[0], lg + acc[1], lb + acc[2], count,
        )

    zeros = jnp.zeros((rt, 1), f32)
    log_beta, lr, lg, lb, _ = jax.lax.fori_loop(
        0, n_seg, seg_body, (zeros, zeros, zeros, zeros, zeros)
    )
    out = jnp.concatenate(
        [lr, lg, lb, jnp.exp(log_beta), jnp.zeros((rt, 4), f32)], axis=1
    )
    out_ref[0] = out


@functools.partial(
    jax.jit,
    static_argnames=("seg", "extent2", "max_depth", "beta_kill", "interpret"),
)
def composite_tiles(
    fa: jnp.ndarray,  # [T, RT, 16]
    fb: jnp.ndarray,
    fc: jnp.ndarray,
    basis: jnp.ndarray,  # [T, RT, 16]
    pf: jnp.ndarray,  # [T, S, 16] gathered prim features
    opac: jnp.ndarray,  # [T, 1, S] (0 for invalid shortlist slots)
    sh3: jnp.ndarray,  # [T, S, 48] channel-major SH blocks of 16
    seg: int = 256,
    extent2: float = 9.0,
    max_depth: int = 128,
    beta_kill: float = 0.01,
    interpret: bool = False,
):
    """Composite every tile. Returns (L [T, RT, 3], beta [T, RT])."""
    t, rt, _ = fa.shape
    s = pf.shape[1]
    assert s % seg == 0
    n_seg = s // seg
    ut = jnp.triu(jnp.ones((seg, seg), jnp.float32))

    kernel = functools.partial(
        _kernel,
        n_seg=n_seg, seg=seg, extent2=extent2,
        max_depth=max_depth, beta_kill=beta_kill,
    )
    out = pl.pallas_call(
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
        ],
        out_specs=pl.BlockSpec((1, rt, 8), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, rt, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fa, fb, fc, basis, pf, opac, sh3, ut)
    return out[..., :3], out[..., 3]
