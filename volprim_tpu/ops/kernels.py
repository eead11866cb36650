"""Closed-form kernel math for Gaussian and Epanechnikov primitives.

Pure functions over the quadric coefficients (a, b, c) of
:mod:`volprim_tpu.ops.quadric`; all formulas were re-derived from the 1-D
Gaussian reduction

    pdf(o + t d) = exp(-q(t)/2) / ((2 pi)^{3/2} sx sy sz),
    q(t) = a t^2 + 2 b t + c,

and verified against the reference's expanded polynomial forms
(``/root/reference/volprim/integrators/common.py:95-333``):

- ``density_integral`` full-range / segment:    common.py:193-239
- ``inv_cdf`` (free-flight sampling):           common.py:173-191
- ``normalization_factor``:                     common.py:241-243, 326-333
- Epanechnikov eval / segment integral:         common.py:251-324

Directions are assumed **normalized** so the t-parameterized integrals equal
arc-length line integrals (same convention as the reference).

All functions are elementwise over broadcastable [R, C] arrays and follow the
reference's NaN/edge-case scrubbing (clamp >= 0, non-finite -> 0, inactive
-> 0; common.py:208,235-237,297,320-322).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .quadric import QuadricCoeffs, intersect_extent

_TWO_PI = 2.0 * jnp.pi
_INV_SQRT2 = 0.7071067811865476


def _scrub(x: jnp.ndarray, active: jnp.ndarray) -> jnp.ndarray:
    x = jnp.maximum(x, 0.0)
    x = jnp.where(jnp.isfinite(x), x, 0.0)
    return jnp.where(active, x, 0.0)


def gaussian_q_min(coeffs: QuadricCoeffs) -> jnp.ndarray:
    """Minimum Mahalanobis^2 along the ray: q(t_peak) with t_peak = -b/a."""
    a, b, c = coeffs
    return jnp.maximum(c - (b * b) / a, 0.0)


def gaussian_peak_response(coeffs: QuadricCoeffs) -> jnp.ndarray:
    """Unnormalized kernel value at the ray's peak point, exp(-q_min/2).

    This is the 3DGRT transmittance model quantity used by the rf integrator
    (reference: ``volprim_rf.py:63-80`` evaluates kernel.eval at
    ``t_peak = -<o,d>/<d,d>`` in the kernel frame, which equals -b/a here).
    """
    return jnp.exp(-0.5 * gaussian_q_min(coeffs))


def gaussian_eval_q(q: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized Gaussian kernel value at Mahalanobis^2 = q
    (common.py:153-159)."""
    return jnp.exp(-0.5 * q)


def gaussian_pdf_q(q: jnp.ndarray, s_prod: jnp.ndarray) -> jnp.ndarray:
    """Normalized 3-D Gaussian pdf at Mahalanobis^2 = q (common.py:161-171)."""
    return jnp.exp(-0.5 * q) / (_TWO_PI ** 1.5 * s_prod)


def gaussian_integral_full(
    coeffs: QuadricCoeffs, s_prod: jnp.ndarray, active: jnp.ndarray
) -> jnp.ndarray:
    """Line integral of the normalized Gaussian pdf over t in (-inf, inf)
    (common.py:199-206)."""
    a, _, _ = coeffs
    val = jnp.exp(-0.5 * gaussian_q_min(coeffs)) / (
        _TWO_PI * s_prod * jnp.sqrt(a)
    )
    return _scrub(val, active)


def gaussian_integral_segment(
    coeffs: QuadricCoeffs,
    s_prod: jnp.ndarray,
    t0: jnp.ndarray,
    t1: jnp.ndarray,
    active: jnp.ndarray,
) -> jnp.ndarray:
    """Line integral of the normalized Gaussian pdf over t in [t0, t1]
    (common.py:207-230). Edge-case mask (t0 < t1) & (t1 > 0) as common.py:208."""
    a, b, _ = coeffs
    active = active & (t0 < t1) & (t1 > 0.0)
    inv_sqrt_2a = _INV_SQRT2 / jnp.sqrt(a)
    u0 = (a * t0 + b) * inv_sqrt_2a
    u1 = (a * t1 + b) * inv_sqrt_2a
    val = (
        jnp.exp(-0.5 * gaussian_q_min(coeffs))
        / (2.0 * _TWO_PI * s_prod * jnp.sqrt(a))
        * (jax.scipy.special.erf(u1) - jax.scipy.special.erf(u0))
    )
    return _scrub(val, active)


def gaussian_segment_taus(
    coeffs: QuadricCoeffs,  # [R, K] per-pair quadric coefficients
    s_prod: jnp.ndarray,  # [R, K]
    sigma_t: jnp.ndarray,  # [R, K]
    entry: jnp.ndarray,  # [R, K] interval entries (+inf for padding)
    exit_t: jnp.ndarray,  # [R, K]
    events: jnp.ndarray,  # [R, E] ascending segment boundaries
) -> jnp.ndarray:
    """Optical depth of every boundary segment ``[events[e], events[e+1])``
    summed over the K Gaussian pairs — the batched form of
    :func:`gaussian_integral_segment` used by the prb window walk
    (common.py:207-230 semantics).

    Evaluating the antiderivative F_k at the E *shared* boundaries (clamped
    into each pair's [entry, exit]) needs ONE erf per (event, pair) and
    hoists the per-pair exp/sqrt constants out of the segment axis —
    versus 2 erf + exp + sqrt per (segment, pair) when
    gaussian_integral_segment is broadcast over segments (the prb profile
    was dominated by exactly that [R, 2K-1, K] tensor). Clamping also
    integrates partial segment coverage exactly instead of by
    midpoint-membership. Returns [R, E-1].
    """
    a, b, _ = coeffs
    inv_sqrt_2a = _INV_SQRT2 / jnp.sqrt(a)
    pair_ok = jnp.isfinite(entry) & jnp.isfinite(exit_t)
    c_pair = (
        jnp.exp(-0.5 * gaussian_q_min(coeffs))
        / (2.0 * _TWO_PI * s_prod * jnp.sqrt(a))
        * sigma_t
    )
    c_pair = _scrub(c_pair, pair_ok)  # [R, K]
    lo = jnp.where(pair_ok, entry, 0.0)[:, None, :]
    hi = jnp.where(pair_ok, exit_t, 0.0)[:, None, :]
    # Non-finite (padding) events map to each pair's EXIT, not 0: a segment
    # whose right boundary is +inf then contributes F(hi) - F(lo-side) >= 0
    # instead of F(0) - F(entry) = minus the full pair integral (callers
    # used to rely on valid_seg masking + maximum(, 0) for that).
    tcl = jnp.clip(
        jnp.where(jnp.isfinite(events), events, jnp.inf)[:, :, None], lo, hi
    )  # [R, E, K]
    f = jax.scipy.special.erf(
        (a[:, None, :] * tcl + b[:, None, :]) * inv_sqrt_2a[:, None, :]
    )
    return jnp.sum(
        c_pair[:, None, :] * (f[:, 1:, :] - f[:, :-1, :]), axis=-1
    )


def gaussian_inv_cdf(
    coeffs: QuadricCoeffs,
    s_prod: jnp.ndarray,
    sigma_t: jnp.ndarray,
    chi: jnp.ndarray,
    active: jnp.ndarray,
) -> jnp.ndarray:
    """Exact free-flight distance through a single Gaussian: solves
    ``exp(-sigma_t * CDF(t)) = chi`` for t, where CDF is the pdf line integral
    from -inf (common.py:173-191)."""
    a, b, _ = coeffs
    peak = jnp.exp(-0.5 * gaussian_q_min(coeffs))
    cval = -(2.0 * _TWO_PI * s_prod * jnp.sqrt(a)) * jnp.log(chi) / (
        sigma_t * peak
    ) - 1.0
    t = jnp.sqrt(2.0) * jax.scipy.special.erfinv(cval) / jnp.sqrt(a) - b / a
    return jnp.where(active, t, 0.0)


def gaussian_normalization_factor(scales: jnp.ndarray) -> jnp.ndarray:
    """Peak-matched normalization (common.py:241-243): divide the integral by
    this to make the best-case response ~1. scales [..., 3] -> [...]."""
    sx, sy, sz = scales[..., 0], scales[..., 1], scales[..., 2]
    mean_sq = (sx * sx * sy * sy + sx * sx * sz * sz + sy * sy * sz * sz) / 3.0
    return 1.0 / (_TWO_PI * jnp.sqrt(mean_sq))


# ----------------------------------------------------------------------------
# Epanechnikov
# ----------------------------------------------------------------------------


def epanechnikov_eval_q(q: jnp.ndarray) -> jnp.ndarray:
    """Kernel value at Mahalanobis^2 = q; support is scaled by 3 like the
    reference (common.py:251-259: scales * 3.0, so dist^2 = q / 9)."""
    return jnp.maximum(0.75 * (1.0 - q / 9.0), 0.0)


def epanechnikov_pdf_q(q: jnp.ndarray, s_prod: jnp.ndarray) -> jnp.ndarray:
    """Normalized Epanechnikov pdf, 15/(8 pi sp) (1 - q) on q < 1.

    The reference raises NotImplemented here (common.py:261-277); this is the
    standard normalization of the same density used by its segment integral.
    """
    return jnp.maximum(15.0 / (8.0 * jnp.pi * s_prod) * (1.0 - q), 0.0)


def epanechnikov_integral_segment(
    coeffs: QuadricCoeffs,
    s_prod: jnp.ndarray,
    t0: jnp.ndarray,
    t1: jnp.ndarray,
    active: jnp.ndarray,
) -> jnp.ndarray:
    """Closed-form cubic segment integral of the normalized Epanechnikov pdf
    (common.py:287-324). With tau = t - t0 in [0, T]:

        I = 15/(8 pi sp) * [ (1 - q(t0)) T - (a t0 + b) T^2 - a T^3 / 3 ].
    """
    a, b, c = coeffs
    active = active & (t0 < t1) & (t1 > 0.0)
    big_t = t1 - t0
    q0 = (a * t0 + 2.0 * b) * t0 + c
    b0 = a * t0 + b
    val = (
        15.0
        / (8.0 * jnp.pi * s_prod)
        * ((1.0 - q0) * big_t - b0 * big_t * big_t - a * big_t**3 / 3.0)
    )
    return _scrub(val, active)


def epanechnikov_inv_cdf(
    coeffs: QuadricCoeffs,
    s_prod: jnp.ndarray,
    sigma_t: jnp.ndarray,
    chi: jnp.ndarray,
    active: jnp.ndarray,
) -> jnp.ndarray:
    """Exact free-flight distance through a single Epanechnikov primitive:
    solves ``exp(-sigma_t * CDF(t)) = chi`` for t, where CDF integrates the
    normalized pdf (:func:`epanechnikov_pdf_q`) from the support entry.

    The reference raises ``NotImplementedError`` here (common.py:279-285);
    the cubic segment CDF *is* invertible in closed form. With the support
    entry ``tn = t* - sqrt((1 - q_min)/a)`` (t* the peak, q(tn) = 1) and
    ``h = tn - t* < 0``, the CDF from tn is

        F(tau) = C (-a h tau^2 - a tau^3 / 3),   C = 15 / (8 pi sp),

    so ``sigma_t F(tau) = -log(chi)`` is the depressed cubic
    ``u^3 - 3 h^2 u + (2 h^3 + 3 chi'/a) = 0`` after ``tau = u - h`` with
    ``chi' = -log(chi)/(sigma_t C)``. All three roots are real on the
    physical range (casus irreducibilis); with
    ``eps = 3 chi' / (2 a |h|^3)`` (the sampled fraction scaled to [0, 2])
    the branch

        u = 2|h| cos(2 arcsin(sqrt(eps/2)) / 3 - 2 pi / 3)

    maps eps = 0 to tau = 0 and eps = 2 (full mass) to tau = 2|h| (support
    exit); ``2 arcsin(sqrt(eps/2))`` is the cancellation-free form of
    ``arccos(1 - eps)``. Samples beyond the total mass clamp to the exit.
    """
    a, b, _ = coeffs
    q_min = gaussian_q_min(coeffs)
    inside = q_min < 1.0
    t_star = -b / a
    habs = jnp.sqrt(jnp.maximum((1.0 - q_min) / a, 0.0))
    c_norm = 15.0 / (8.0 * jnp.pi * s_prod)
    chi_p = -jnp.log(jnp.maximum(chi, 1e-30)) / jnp.maximum(
        sigma_t * c_norm, 1e-30
    )
    eps = jnp.clip(
        1.5 * chi_p / jnp.maximum(a * habs**3, 1e-30), 0.0, 2.0
    )
    theta = 2.0 * jnp.arcsin(jnp.sqrt(0.5 * eps))
    u = 2.0 * habs * jnp.cos(theta / 3.0 - 2.0 * jnp.pi / 3.0)
    t = t_star + u  # tn + tau = (t* - |h|) + (u + |h|)
    return jnp.where(active & inside, t, 0.0)


def epanechnikov_normalization_factor(scales: jnp.ndarray) -> jnp.ndarray:
    """common.py:326-333 (Gaussian-magnitude-matched anisotropic form)."""
    sx, sy, sz = scales[..., 0], scales[..., 1], scales[..., 2]
    mean_sq = (sx * sx * sy * sy + sx * sx * sz * sz + sy * sy * sz * sz) / 3.0
    return 5.0 / (_TWO_PI * jnp.sqrt(mean_sq))


# ----------------------------------------------------------------------------
# Dispatching kernel config (mirrors the reference's Kernel.factory /
# kernel_normalized / kernel_full_range knobs, common.py:95-145)
# ----------------------------------------------------------------------------


@dataclass(frozen=True)
class Kernel:
    """Static kernel configuration. ``type`` in {'gaussian', 'epanechnikov'};
    ``normalized`` and ``full_range`` mirror common.py:110-114."""

    type: str = "gaussian"
    normalized: bool = False
    full_range: bool = False

    def __post_init__(self):
        if self.type not in ("gaussian", "epanechnikov"):
            raise ValueError(
                "Unknown kernel type; must be 'gaussian' or 'epanechnikov'"
            )

    def eval_q(self, q: jnp.ndarray) -> jnp.ndarray:
        if self.type == "gaussian":
            return gaussian_eval_q(q)
        return epanechnikov_eval_q(q)

    def peak_response(self, coeffs: QuadricCoeffs) -> jnp.ndarray:
        """Kernel value at the point of peak response along the ray."""
        return self.eval_q(gaussian_q_min(coeffs))

    def pdf_q(self, q: jnp.ndarray, s_prod: jnp.ndarray) -> jnp.ndarray:
        if self.type == "gaussian":
            return gaussian_pdf_q(q, s_prod)
        return epanechnikov_pdf_q(q, s_prod)

    def normalization_factor(self, scales: jnp.ndarray) -> jnp.ndarray:
        if self.type == "gaussian":
            return gaussian_normalization_factor(scales)
        return epanechnikov_normalization_factor(scales)

    def density_integral(
        self,
        coeffs: QuadricCoeffs,
        s_prod: jnp.ndarray,
        scales: jnp.ndarray,
        extent: float,
        t0: jnp.ndarray | None,
        t1: jnp.ndarray | None,
        active: jnp.ndarray,
    ) -> jnp.ndarray:
        """Line integral of the kernel density along the ray.

        Mirrors Kernel.density_integral semantics (common.py:193-239,
        287-324): full-range when ``self.full_range`` or no bounds are given;
        Epanechnikov full-range falls back to the extent-ellipsoid
        intersection bounds (common.py:293-295).
        """
        full = self.full_range or (t0 is None and t1 is None)
        if self.type == "gaussian":
            if full:
                val = gaussian_integral_full(coeffs, s_prod, active)
            else:
                val = gaussian_integral_segment(coeffs, s_prod, t0, t1, active)
        else:
            if full:
                valid, t0, t1 = intersect_extent(coeffs, extent)
                active = active & valid
            val = epanechnikov_integral_segment(coeffs, s_prod, t0, t1, active)
        if self.normalized:
            val = val / self.normalization_factor(scales)
        return _scrub(val, active)

    def inv_cdf(
        self,
        coeffs: QuadricCoeffs,
        s_prod: jnp.ndarray,
        sigma_t: jnp.ndarray,
        chi: jnp.ndarray,
        active: jnp.ndarray,
    ) -> jnp.ndarray:
        if self.type == "gaussian":
            return gaussian_inv_cdf(coeffs, s_prod, sigma_t, chi, active)
        # The reference raises NotImplementedError here (common.py:279-285);
        # the cubic CDF is invertible in closed form — exceeding parity.
        return epanechnikov_inv_cdf(coeffs, s_prod, sigma_t, chi, active)
