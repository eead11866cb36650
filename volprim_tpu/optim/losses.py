"""Loss functions (reference: /root/reference/volprim/optimizers.py:168-186)."""

import jax.numpy as jnp


def l1(reference, image):
    """Mean absolute error (optimizers.py:170-174)."""
    return jnp.mean(jnp.abs(reference - image))


def l2(reference, image):
    """Mean squared error (optimizers.py:176-180)."""
    return jnp.mean((reference - image) ** 2)


def psnr(reference, image):
    """Peak signal-to-noise ratio in dB, peak = 1 (optimizers.py:182-186:
    20 * log(rsqrt(l2)) / log(10) == -10 * log10(l2))."""
    return -10.0 * jnp.log(l2(reference, image)) / jnp.log(10.0)
