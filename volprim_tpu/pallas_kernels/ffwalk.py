"""Fused free-flight window-walk Pallas kernel for the prb integrator.

Replaces the XLA window scan in :func:`volprim_tpu.models.prb.free_flight`
(``_run_windows``: per-window top-k selection + gathers + event sort +
segment scan + bisection, reference semantics ``volprim_prb.py:513-654``)
with ONE kernel that walks every window in VMEM:

- **selection without sort/top-k**: open-interval rank along the lane axis
  is an inclusive cumsum = one 0/1 upper-triangular matmul (exact in bf16,
  rides the MXU); the K-window is a lane mask, never a gather,
- **no event sort, no segment scan**: the window's optical depth uses the
  shared-boundary Gaussian antiderivative (``ops.kernels.
  gaussian_segment_taus`` semantics) — per selected lane
  ``c * (erf(a*hi + b) - erf(a*lo + b))`` with ``lo/hi`` clamped to the
  window, lane-summed. Per-segment sums telescope to exactly this form, so
  the crossing decision needs no segments at all,
- **whole-window bisection**: the window optical depth F_w(t) is monotone,
  so the crossing sample is located by bisection on [t_min, t_limit]; the
  result is then SNAPPED to the XLA walk's segment discretization (the
  tightest enclosing interval-boundary pair) and refined with the same
  ``solver_max_iterations``-step midpoint bisection the XLA path runs
  (prb:559-654), so the sampled distances agree at solver resolution,

all while the [rays x intervals] working set stays in VMEM — the XLA loop
round-trips it through HBM once per window and pays a top_k sort plus ~20
scalar-column gathers each time.

The kernel is sampling-only (all decisions are stop-gradient by the PRB
convention); the caller recomputes the differentiable albedo / density /
transmittance at the returned sample point (see ``models.prb``,
``_run_windows_pallas``).

Gaussian fast-path kernels only (the erf antiderivative); Epanechnikov
configs keep the XLA walk.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BIG = 3.0e37  # stands in for +inf inside the kernel (inf * 0 = nan traps)

# A&S 7.1.26 rational erf (max abs err 1.5e-7). Mosaic (Pallas TPU) has NO
# native erf lowering (verified on hardware 2026-08-20: "Unimplemented
# primitive ... erf"), so on TPU backends the polynomial is the ONLY option
# and is selected automatically; CPU keeps lax.erf so the bit-near tests
# against the XLA walk stay exact. Override with VOLPRIM_FFWALK_ERF=poly|lax.
# (Read at trace time: toggling the env after `walk` has been traced serves
# the cached kernel — clear jax caches if you flip it mid-process.)


def _use_poly_erf() -> bool:
    env = os.environ.get("VOLPRIM_FFWALK_ERF", "auto")
    if env == "poly":
        return True
    if env == "lax":
        return False
    return jax.default_backend() != "cpu"


def _erf(x):
    if not _use_poly_erf():
        return jax.lax.erf(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    y = t * (
        0.254829592
        + t * (
            -0.284496736
            + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))
        )
    )
    return jnp.sign(x) * (1.0 - y * jnp.exp(-ax * ax))


def _kernel(
    kw_ref, entry_ref, exit_ref, cp_ref, al_ref, be_ref, aux_ref, ut_ref,
    out_ref,
    *, bisect_iters: int, solver_iters: int, solver_disabled: bool,
):
    # traced SMEM scalars: changing max_overlaps (k) or the window count
    # costs an XLA retrace, never a fresh Mosaic variant (the composite3
    # max_depth pattern) — variants are keyed by (block, K', solver) only
    kf = kw_ref[0, 0].astype(jnp.float32)  # window size K
    n_windows = kw_ref[0, 1]
    entry = entry_ref[...]  # [RB, KP] raw entries, ascending, _BIG pad
    exit_t = exit_ref[...]  # [RB, KP]
    cp = cp_ref[...]  # [RB, KP] c_pair * sigma_t (antiderivative scale)
    al = al_ref[...]  # [RB, KP] erf-arg scale  sqrt(a/2)
    be = be_ref[...]  # [RB, KP] erf-arg offset b/sqrt(2a)
    aux = aux_ref[...]  # [RB, 8]: chi, t_budget, t_cap, active, t_min0
    ut = ut_ref[...]  # [KP, KP] upper-tri (incl diag) ones, bf16

    f32 = jnp.float32
    chi0 = aux[:, 0:1]
    t_budget = aux[:, 1:2]
    t_cap = aux[:, 2:3]
    act = aux[:, 3:4] > 0.5
    t_min0 = aux[:, 4:5]
    rb = entry.shape[0]

    fin = entry < _BIG * 0.5  # finiteness of the collected interval
    has_budget = t_budget < _BIG * 0.5

    def lane_sum(x):
        return jnp.sum(x, axis=1, keepdims=True)

    def window_body(_, carry):
        # flags carried as f32 0/1: i1 vectors in a Mosaic loop carry are
        # a lowering risk, and the outputs are f32 anyway
        (t_min, chi_rem, found_f, resolved_f, bdead_f, capres_f,
         t_samp) = carry
        found = found_f > 0.5
        resolved = resolved_f > 0.5
        bdead = bdead_f > 0.5
        win_act = act & ~(found | resolved | bdead)

        # ---- selection: first-K open intervals by entry rank ------------
        openm = fin & (exit_t > t_min)
        rank = jax.lax.dot_general(
            jnp.where(openm, 1.0, 0.0).astype(jnp.bfloat16), ut,
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        )  # inclusive open-count along lanes
        selm = openm & (rank <= kf)
        nxt = jnp.min(
            jnp.where(openm & (rank == kf + 1.0), entry, _BIG),
            axis=1, keepdims=True,
        )
        has_more = nxt < _BIG * 0.5
        min_exit = jnp.min(
            jnp.where(selm, exit_t, _BIG), axis=1, keepdims=True
        )
        t_limit = jnp.where(
            has_more, jnp.where(nxt > t_min, nxt, min_exit), _BIG
        )
        t_limit = jnp.minimum(t_limit, t_budget)
        hit_cap = t_limit >= t_cap
        t_limit = jnp.minimum(t_limit, t_cap)
        full = has_more | has_budget

        # ---- window optical depth via the shared antiderivative ---------
        lo = jnp.where(selm, jnp.maximum(entry, t_min), 0.0)
        hi = jnp.where(selm, jnp.minimum(exit_t, t_limit), 0.0)
        hi = jnp.maximum(hi, lo)
        erf_lo = _erf(al * lo + be)
        tau_lane = cp * (_erf(al * hi + be) - erf_lo)
        tau_lane = jnp.where(selm, jnp.maximum(tau_lane, 0.0), 0.0)
        tau_win = lane_sum(tau_lane)

        found_w = win_act & (tau_win > chi_rem)
        resolved_w = win_act & ~found_w & (~full | hit_cap)
        bdead_w = (
            win_act & ~found_w & full & ~hit_cap & (t_limit >= t_budget)
        )

        def tau_to(t):  # F_w(t) from the window start, per ray [RB, 1]
            e = _erf(al * jnp.clip(t, lo, hi) + be)
            return lane_sum(
                jnp.where(selm, jnp.maximum(cp * (e - erf_lo), 0.0), 0.0)
            )

        # ---- locate the crossing: bisection, then segment snap ----------
        span_hi = jnp.max(jnp.where(selm, hi, 0.0), axis=1, keepdims=True)
        b_lo, b_hi = t_min, jnp.maximum(span_hi, t_min)

        def bis(_, c):
            b_lo, b_hi = c
            mid = 0.5 * (b_lo + b_hi)
            cross = tau_to(mid) > chi_rem
            return (
                jnp.where(cross, b_lo, mid), jnp.where(cross, mid, b_hi)
            )

        b_lo, b_hi = jax.lax.fori_loop(
            0, bisect_iters, bis, (b_lo, b_hi), unroll=False
        )
        t_star = 0.5 * (b_lo + b_hi)

        # snap to the tightest enclosing event pair (XLA's segment): events
        # are the clamped entries/exits of selected lanes plus t_limit
        ev_lo = jnp.maximum(
            jnp.max(
                jnp.where(selm & (lo <= t_star), lo, -_BIG),
                axis=1, keepdims=True,
            ),
            jnp.max(
                jnp.where(selm & (hi <= t_star), hi, -_BIG),
                axis=1, keepdims=True,
            ),
        )
        t0 = jnp.maximum(ev_lo, t_min)
        ev_hi = jnp.minimum(
            jnp.min(
                jnp.where(selm & (lo > t_star), lo, _BIG),
                axis=1, keepdims=True,
            ),
            jnp.min(
                jnp.where(selm & (hi > t_star), hi, _BIG),
                axis=1, keepdims=True,
            ),
        )
        t1 = jnp.minimum(ev_hi, t_limit)
        t1 = jnp.maximum(t1, t0)

        # the XLA in-segment solve (prb:559-654): chi local to the segment
        # start, midpoint start, halving steps, clipped to [t0, t1]
        cum_excl = tau_to(t0)
        chi_loc = chi_rem - cum_excl
        tt = 0.5 * (t0 + t1)
        if not solver_disabled:
            erf_t0 = _erf(al * jnp.clip(t0, lo, hi) + be)

            # step_i = (t1-t0)/2^(i+2), carried and halved (exact powers
            # of two) — a scalar pow of the loop index may not lower on
            # the Mosaic scalar core
            def solve(_, c):
                tt, step = c
                e = _erf(al * jnp.clip(tt, lo, hi) + be)
                tau_p = lane_sum(
                    jnp.where(selm, cp * (e - erf_t0), 0.0)
                )
                tt = jnp.where(tau_p > chi_loc, tt - step, tt + step)
                return jnp.clip(tt, t0, t1), step * 0.5

            tt, _ = jax.lax.fori_loop(
                0, solver_iters, solve, (tt, 0.25 * (t1 - t0)),
                unroll=False,
            )

        # ---- state updates (mirrors _window_body) ------------------------
        one = jnp.ones_like(t_min)
        t_samp = jnp.where(found_w, tt, t_samp)
        capres_f = jnp.where(
            resolved_w & hit_cap & (t_cap < _BIG * 0.5), one, capres_f
        )
        found_f = jnp.where(found_w, one, found_f)
        resolved_f = jnp.where(found_w | resolved_w, one, resolved_f)
        bdead_f = jnp.where(bdead_w, one, bdead_f)
        cont = win_act & ~found_w & ~resolved_w & ~bdead_w
        chi_rem = jnp.where(cont, chi_rem - tau_win, chi_rem)
        t_min = jnp.where(cont, t_limit, t_min)
        return (
            t_min, chi_rem, found_f, resolved_f, bdead_f, capres_f, t_samp
        )

    zeros = jnp.zeros((rb, 1), f32)
    init = (
        t_min0, chi0, zeros, zeros, zeros, zeros, jnp.full((rb, 1), _BIG)
    )
    (t_min, chi_rem, found_f, resolved_f, bdead_f, capres_f, t_samp) = (
        jax.lax.fori_loop(0, n_windows, window_body, init, unroll=False)
    )
    out_ref[...] = jnp.concatenate(
        [found_f, resolved_f, bdead_f, capres_f, t_samp, t_min, chi_rem,
         zeros],
        axis=1,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "bisect_iters", "solver_iters", "solver_disabled",
        "block_rays", "interpret",
    ),
)
def walk(
    entry: jnp.ndarray,  # [R, K'] collected entries, ascending, +inf pad
    exit_t: jnp.ndarray,  # [R, K']
    cp: jnp.ndarray,  # [R, K'] antiderivative scale (incl sigma_t)
    alpha: jnp.ndarray,  # [R, K'] erf-arg scale sqrt(a/2)
    beta: jnp.ndarray,  # [R, K'] erf-arg offset b/sqrt(2a)
    chi: jnp.ndarray,  # [R] log(trans0 / xi)
    t_budget: jnp.ndarray,  # [R] collection-budget bound (+inf = none)
    t_cap: jnp.ndarray,  # [R] surface cap (+inf = none)
    active: jnp.ndarray,  # [R] bool
    t_min0: jnp.ndarray,  # [R] walk start (0, or the jump boundary)
    *,
    k: int,
    n_windows: int,
    bisect_iters: int = 22,
    solver_iters: int = 4,
    solver_disabled: bool = False,
    block_rays: int = 256,
    interpret: bool = False,
):
    """Run the fused window walk. Returns (found, resolved, bdead, capres,
    t_samp) with shapes [R] (bools and f32). All outputs are sampling
    decisions — stop-gradient semantics; inputs are stop-gradient'ed here.
    """
    sg = jax.lax.stop_gradient
    r, kp = entry.shape
    rb = min(block_rays, max(8, r))
    rpad = -r % rb
    kpad = -kp % 128

    def pad(x, fill):
        return jnp.pad(x, ((0, rpad), (0, kpad)), constant_values=fill)

    def cap_big(x):  # inf -> _BIG (the kernel's finite stand-in)
        return jnp.where(jnp.isfinite(x), x, _BIG)

    entry_p = pad(cap_big(sg(entry)), _BIG)
    exit_p = pad(cap_big(sg(exit_t)), _BIG)
    cp_p = pad(sg(cp), 0.0)
    al_p = pad(sg(alpha), 1.0)
    be_p = pad(sg(beta), 0.0)
    aux = jnp.stack(
        [
            sg(chi),
            cap_big(sg(t_budget)),
            cap_big(sg(t_cap)),
            active.astype(jnp.float32),
            sg(t_min0),
        ]
        + [jnp.zeros_like(chi)] * 3,
        axis=1,
    )
    aux = jnp.pad(aux, ((0, rpad), (0, 0)))
    kpp = kp + kpad
    iot = jax.lax.broadcasted_iota(jnp.int32, (kpp, kpp), 0)
    jot = jax.lax.broadcasted_iota(jnp.int32, (kpp, kpp), 1)
    ut = (iot <= jot).astype(jnp.bfloat16)

    from jax.experimental.pallas import tpu as pltpu

    kw = jnp.asarray([[k, n_windows]], jnp.int32)
    n_blocks = (r + rpad) // rb
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            bisect_iters=bisect_iters,
            solver_iters=solver_iters, solver_disabled=solver_disabled,
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((rb, kpp), lambda i: (i, 0)),
            pl.BlockSpec((rb, kpp), lambda i: (i, 0)),
            pl.BlockSpec((rb, kpp), lambda i: (i, 0)),
            pl.BlockSpec((rb, kpp), lambda i: (i, 0)),
            pl.BlockSpec((rb, kpp), lambda i: (i, 0)),
            pl.BlockSpec((rb, 8), lambda i: (i, 0)),
            pl.BlockSpec((kpp, kpp), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rb, 8), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r + rpad, 8), jnp.float32),
        interpret=interpret,
    )(kw, entry_p, exit_p, cp_p, al_p, be_p, aux, ut)[:r]

    found = out[:, 0] > 0.5
    resolved = out[:, 1] > 0.5
    bdead = out[:, 2] > 0.5
    capres = out[:, 3] > 0.5
    t_samp = jnp.where(found, out[:, 4], jnp.inf)
    return found, resolved, bdead, capres, t_samp
