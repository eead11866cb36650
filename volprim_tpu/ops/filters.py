"""Film accumulation / reconstruction filters.

Replaces Mitsuba's hdrfilm + rfilter plugins (tent/gaussian/box; SURVEY.md
§2.3). Samples are splatted into the pixel grid with scatter-adds and
normalized by the accumulated filter weight — the wavefront equivalent of the
film splatting the reference relies on.
"""

from __future__ import annotations

import jax.numpy as jnp


def splat_box(
    values: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray, width: int, height: int
):
    """Accumulate samples into their containing pixel (box filter).

    Args:
      values: [S, C] sample radiance; px, py: [S] continuous film coords.
    Returns (image [H, W, C], weights [H, W]).
    """
    xi = jnp.clip(px.astype(jnp.int32), 0, width - 1)
    yi = jnp.clip(py.astype(jnp.int32), 0, height - 1)
    flat = yi * width + xi
    c = values.shape[-1]
    img = jnp.zeros((height * width, c), values.dtype).at[flat].add(values)
    wgt = jnp.zeros((height * width,), values.dtype).at[flat].add(1.0)
    return img.reshape(height, width, c), wgt.reshape(height, width)


def splat_tent(
    values: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray, width: int, height: int
):
    """Bilinear (tent, radius-1) splat of samples onto pixel centers."""
    # Pixel centers are at integer + 0.5.
    fx = px - 0.5
    fy = py - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = fx - x0
    ty = fy - y0
    c = values.shape[-1]
    img = jnp.zeros((height * width, c), values.dtype)
    wgt = jnp.zeros((height * width,), values.dtype)
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        wx = tx if dx else (1.0 - tx)
        wy = ty if dy else (1.0 - ty)
        w = wx * wy
        xi = x0 + dx
        yi = y0 + dy
        inside = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
        flat = jnp.clip(yi, 0, height - 1) * width + jnp.clip(xi, 0, width - 1)
        w = jnp.where(inside, w, 0.0)
        img = img.at[flat].add(values * w[:, None])
        wgt = wgt.at[flat].add(w)
    return img.reshape(height, width, c), wgt.reshape(height, width)


def develop(img: jnp.ndarray, wgt: jnp.ndarray) -> jnp.ndarray:
    """Normalize splatted radiance by filter weights."""
    return img / jnp.maximum(wgt[..., None], 1e-8)
