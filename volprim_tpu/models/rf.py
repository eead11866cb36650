"""Radiance-field (3DGS-style emissive) integrator.

Functional rebuild of the reference's ``volprim_rf`` plugin
(``/root/reference/volprim/integrators/volprim_rf.py``). The reference
marches BVH hit by BVH hit inside a Dr.Jit megakernel (:120-186). The TPU
architecture splits the work into regular wavefront stages:

1. **Hit gathering**: a chunked streaming top-K selects, for every ray, the
   ``max_depth`` nearest entered bounding ellipsoids ordered by entry t —
   the same visitation order the reference's nearest-hit march produces.
2. **Compositing scan**: a ``lax.scan`` over the ordered hit slots evaluates
   the 3DGRT transmittance model ``1 - min(opacity * K(peak), 0.9999)``
   (:63-80, peak at t_peak = -b/a) and SH view-dependent emission with +0.5
   DC offset (:82-100), accumulating ``L += beta*(1-T)*E``, ``beta *= T``
   front-to-back (:135-146) with the beta > 0.01 kill (:172-174) and
   optional Russian roulette (:176-183).

Gradients are exact XLA AD through both stages (the sort indices are
constant w.r.t. parameters a.e., matching the reference's detached-sampling
PRB assumption), so no PRB replay machinery is needed.

Note: the reference's sample() never evaluates emitters — escaped rays stay
black even when a 'background' constant emitter exists in the scene
(render_3dg_asset.py:64-66 notwithstanding). Here an emitter, when passed,
is composited as ``L += beta * env`` on escape, which is what the
``white_background`` flag intends; pass ``emitter=None`` for strict parity.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import register_integrator
from ..ops import quadric, sh
from ..ops import srgb_to_linear
from ..ops.kernels import Kernel
from ..scene.ellipsoids import EllipsoidScene
from .base import pad_primitives


@dataclasses.dataclass(frozen=True)
class RFConfig:
    max_depth: int = 64  # max composited primitives (volprim_rf.py:26-29)
    rr_depth: int = -1  # Russian-roulette start depth (:31-39)
    kernel_type: str = "gaussian"
    srgb_primitives: bool = True  # sRGB -> linear on the result (:41,188-190)
    chunk_size: int = 2048

    @property
    def kernel(self) -> Kernel:
        # Forced by the integrator (volprim_rf.py:43-46).
        return Kernel(self.kernel_type, normalized=True, full_range=True)

    @property
    def use_rr(self) -> bool:
        return self.rr_depth >= 0 and (
            self.rr_depth < self.max_depth or self.max_depth == -1
        )


def gather_hits(
    primitives: EllipsoidScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    k: int,
    chunk_size: int,
    t_min: float = 0.0,
    ray_tile: int = 16384,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray k nearest entered bounding ellipsoids, sorted by entry t.

    Streaming top-K over primitive chunks; the TPU replacement for the
    reference's per-bounce ``scene.ray_intersect`` BVH marches. Returns
    (t [R, k] ascending with +inf padding, ids [R, k]).

    The wavefront is additionally tiled over rays (``ray_tile``) so the
    [rays, chunk] coefficient buffers stay HBM-resident (a 512k-ray x 4k-prim
    tile would otherwise need 8.6 GB per coefficient array).
    """
    r = o.shape[0]
    if r > ray_tile and r % ray_tile == 0:
        ot = o.reshape(-1, ray_tile, 3)
        dt = d.reshape(-1, ray_tile, 3)
        ts, ids = jax.lax.map(
            lambda od: gather_hits(
                primitives, od[0], od[1], k, chunk_size, t_min, ray_tile
            ),
            (ot, dt),
        )
        return ts.reshape(r, k), ids.reshape(r, k)
    prims = pad_primitives(primitives, chunk_size)
    n = prims.num_prims
    c = min(chunk_size, n)
    n_chunks = n // c

    centers = prims.centers.reshape(n_chunks, c, 3)
    scales = prims.scales.reshape(n_chunks, c, 3)
    quats = prims.quats.reshape(n_chunks, c, 4)
    real = jnp.arange(n).reshape(n_chunks, c) < primitives.num_prims

    r = o.shape[0]
    inf = jnp.inf

    def body(carry, inputs):
        best_t, best_id = carry
        chunk_idx, ctr, scl, qt, is_real = inputs
        coeffs = quadric.ray_prim_coeffs(o, d, ctr, scl, qt)
        valid, t_near, _ = quadric.intersect_extent(coeffs, prims.extent)
        valid = valid & (t_near > t_min) & is_real[None, :]
        t_near = jnp.where(valid, t_near, inf)
        # Select the k nearest within the chunk, then merge with the running
        # buffer (two-stage keeps the top_k input at [R, c] then [R, 2k]).
        ck = min(k, c)
        neg_t, idx = jax.lax.top_k(-t_near, ck)
        ids = chunk_idx * c + idx.astype(jnp.int32)
        cand_t = jnp.concatenate([best_t, -neg_t], axis=-1)
        cand_id = jnp.concatenate([best_id, ids], axis=-1)
        neg_t2, sel = jax.lax.top_k(-cand_t, k)
        merged_id = jnp.take_along_axis(cand_id, sel, axis=-1)
        return (-neg_t2, merged_id), None

    init = (
        jnp.full((r, k), inf, o.dtype),
        jnp.zeros((r, k), jnp.int32),
    )
    (t_sorted_desc, ids), _ = jax.lax.scan(
        body,
        init,
        (jnp.arange(n_chunks), centers, scales, quats, real),
    )
    # top_k(-t) leaves ascending-t order already (largest -t first).
    return t_sorted_desc, ids


@register_integrator("volprim_rf")
def radiance(
    primitives: EllipsoidScene,
    emitter,
    o: jnp.ndarray,
    d: jnp.ndarray,
    cfg: RFConfig,
    key=None,
) -> jnp.ndarray:
    """Radiance for a wavefront of rays. o, d: [R, 3] -> [R, 3]."""
    primitives.require_attrs(["opacities", "sh_coeffs"])
    kern = cfg.kernel
    k = cfg.max_depth if cfg.max_depth > 0 else 256
    hit_t, hit_id = gather_hits(primitives, o, d, k, cfg.chunk_size)

    sh_coeffs = primitives.sh_coeffs_3d()  # [N, Ksh, 3]
    n_basis = sh_coeffs.shape[1]
    basis = sh.eval_basis(d, sh.degree_from_coeffs(n_basis))  # [R, Ksh]
    opac = primitives.attrs["opacities"][:, 0]

    r = o.shape[0]
    base_key = key if key is not None else jax.random.PRNGKey(0)

    def step(carry, inputs):
        l_acc, beta, active = carry
        t_h, id_h, step_idx = inputs
        active = active & jnp.isfinite(t_h)

        ctr = primitives.centers[id_h]
        scl = primitives.scales[id_h]
        qt = primitives.quats[id_h]
        coeffs = quadric.pair_coeffs(o, d, ctr, scl, qt)

        density = kern.peak_response(coeffs)  # exp(-q_min/2) (rf:63-80)
        transmission = 1.0 - jnp.minimum(opac[id_h] * density, 0.9999)

        emission = jnp.einsum("rk,rkc->rc", basis, sh_coeffs[id_h])
        emission = jnp.maximum(emission + 0.5, 0.0)  # rf:96

        le = beta * (1.0 - transmission)[:, None] * emission
        le = jnp.where(jnp.isfinite(le), le, 0.0)  # rf:141
        mask = active[:, None]
        l_acc = l_acc + jnp.where(mask, le, 0.0)
        beta = jnp.where(mask, beta * transmission[:, None], beta)

        beta_max = jnp.max(beta, axis=-1)
        active = active & (beta_max > 0.01)  # rf:172-174

        if cfg.use_rr:
            depth = step_idx + 1
            rr_key = jax.random.fold_in(base_key, step_idx)
            sample_rr = jax.random.uniform(rr_key, (r,))
            rr_prob = jnp.maximum(beta_max, 0.1)
            rr_active = (depth >= cfg.rr_depth) & (beta_max < 0.1)
            beta = jnp.where(
                (rr_active & active)[:, None], beta / rr_prob[:, None], beta
            )
            active = active & (~rr_active | (sample_rr < rr_prob))

        return (l_acc, beta, active), None

    init = (
        jnp.zeros((r, 3), o.dtype),
        jnp.ones((r, 3), o.dtype),
        jnp.ones((r,), bool),
    )
    (l_acc, beta, _), _ = jax.lax.scan(
        step,
        init,
        (hit_t.T, hit_id.T, jnp.arange(k)),
    )

    if emitter is not None:
        l_acc = l_acc + beta * emitter.eval(d)

    if cfg.srgb_primitives:
        l_acc = srgb_to_linear(l_acc)
    return l_acc
