"""Real spherical harmonics basis evaluation (degrees 0..3).

Matches the basis produced by ``dr.sh_eval`` that the reference consumes for
3DGS view-dependent emission (``/root/reference/volprim/integrators/
volprim_rf.py:82-100``): the Sloan "Efficient Spherical Harmonic Evaluation"
real basis with the standard 3DGS constants, ordered l-major then m = -l..l.
"""

from __future__ import annotations

import jax.numpy as jnp

_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def num_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def degree_from_coeffs(n: int) -> int:
    """Infer SH degree from per-channel coefficient count (as the reference
    does at volprim_rf.py:89)."""
    deg = int(n**0.5) - 1
    assert (deg + 1) ** 2 == n, f"invalid SH coefficient count {n}"
    return deg


def eval_basis(d: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Evaluate the real SH basis for unit directions ``d`` [..., 3].

    Returns [..., (degree+1)^2].
    """
    assert 0 <= degree <= 3, "SH degrees 0..3 supported"
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    out = [jnp.full_like(x, _C0)]
    if degree >= 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        out += [
            _C2[0] * x * y,
            _C2[1] * y * z,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * x * z,
            _C2[4] * (xx - yy),
        ]
    if degree >= 3:
        out += [
            _C3[0] * y * (3.0 * xx - yy),
            _C3[1] * x * y * z,
            _C3[2] * y * (4.0 * zz - xx - yy),
            _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _C3[4] * x * (4.0 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)


def eval_emission(sh_coeffs: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """3DGS-style emission: sum_i basis_i(d) * rgb_i, then +0.5 DC offset and
    clamp >= 0 (volprim_rf.py:92-96).

    Args:
      sh_coeffs: [..., K, 3] per-primitive coefficients (basis-major).
      d: [..., 3] unit view directions.

    Returns [..., 3] emitted radiance.
    """
    k = sh_coeffs.shape[-2]
    basis = eval_basis(d, degree_from_coeffs(k))  # [..., K]
    emission = jnp.sum(basis[..., :, None] * sh_coeffs, axis=-2)
    return jnp.maximum(emission + 0.5, 0.0)
