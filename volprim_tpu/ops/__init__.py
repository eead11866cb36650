"""Pure-math ops: quadric forms, kernels, SH, emitters, filters."""

from . import bsdf
from . import envmap
from . import filters
from . import kernels
from . import quadric
from . import quaternion
from . import sh

from .kernels import Kernel
from .quadric import QuadricCoeffs, intersect_extent, ray_prim_coeffs


def srgb_to_linear(x):
    """sRGB EOTF (reference: mi.math.srgb_to_linear, volprim_rf.py:190)."""
    import jax.numpy as jnp

    return jnp.where(
        x <= 0.04045, x / 12.92, ((jnp.maximum(x, 0.04045) + 0.055) / 1.055) ** 2.4
    )


def linear_to_srgb(x):
    import jax.numpy as jnp

    return jnp.where(
        x <= 0.0031308,
        x * 12.92,
        1.055 * jnp.maximum(x, 0.0031308) ** (1.0 / 2.4) - 0.055,
    )
