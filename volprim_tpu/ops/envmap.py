"""Environment emitters: constant and equirectangular env-map.

TPU-native replacement for Mitsuba's C++ ``envmap`` / ``constant`` emitter
plugins used by the integrators for NEE + MIS (``/root/reference/volprim/
integrators/volprim_prb.py:165-235``; SURVEY.md §2.3): bilinear radiance
eval, 2-D marginal/conditional CDF-table importance sampling, and pdf
evaluation, all as pure JAX.

Direction convention matches Mitsuba (Y-up):
    u = atan2(d.x, -d.z) / (2 pi)  (wrapped to [0, 1)),  v = acos(d.y) / pi.
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ConstantEmitter:
    """Uniform radiance over the sphere (Mitsuba ``constant``; default
    radiance matches its 1.0 default used by optimize_volume.py:157)."""

    radiance: jnp.ndarray  # [3]

    def eval(self, d: jnp.ndarray) -> jnp.ndarray:
        return jnp.broadcast_to(self.radiance, d.shape[:-1] + (3,))

    def sample_direction(self, sample2: jnp.ndarray):
        """Uniform sphere sampling. Returns (directions, radiance, pdf)."""
        z = 1.0 - 2.0 * sample2[..., 0]
        r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
        phi = 2.0 * jnp.pi * sample2[..., 1]
        d = jnp.stack([r * jnp.cos(phi), z, -r * jnp.sin(phi)], axis=-1)
        pdf = jnp.full(sample2.shape[:-1], 1.0 / (4.0 * jnp.pi))
        return d, self.eval(d), pdf

    def pdf_direction(self, d: jnp.ndarray) -> jnp.ndarray:
        return jnp.full(d.shape[:-1], 1.0 / (4.0 * jnp.pi))


def _dir_to_uv(d: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    u = jnp.arctan2(d[..., 0], -d[..., 2]) / (2.0 * jnp.pi)
    u = jnp.where(u < 0.0, u + 1.0, u)
    v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / jnp.pi
    return u, v


def _uv_to_dir(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    theta = v * jnp.pi
    phi = u * 2.0 * jnp.pi
    st = jnp.sin(theta)
    return jnp.stack(
        [st * jnp.sin(phi), jnp.cos(theta), -st * jnp.cos(phi)], axis=-1
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EnvironmentMap:
    """Equirectangular environment map with CDF-table importance sampling."""

    data: jnp.ndarray  # [H, W, 3]
    row_cdf: jnp.ndarray  # [H] inclusive marginal CDF over rows
    cond_cdf: jnp.ndarray  # [H, W] inclusive conditional CDF per row
    lum: jnp.ndarray  # [H, W] sin-weighted luminance (sampling density)
    lum_integral: jnp.ndarray  # [] total of lum

    @staticmethod
    def from_array(data) -> "EnvironmentMap":
        data = jnp.asarray(data, jnp.float32)
        h, w = data.shape[0], data.shape[1]
        lum = jnp.mean(data, axis=-1)
        theta = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * jnp.pi
        lum = jnp.maximum(lum * jnp.sin(theta)[:, None], 1e-12)
        cond = jnp.cumsum(lum, axis=1)
        row = cond[:, -1]
        row_cdf = jnp.cumsum(row)
        return EnvironmentMap(
            data=data,
            row_cdf=row_cdf / row_cdf[-1],
            cond_cdf=cond / cond[:, -1:],
            lum=lum,
            lum_integral=row_cdf[-1],
        )

    def eval(self, d: jnp.ndarray) -> jnp.ndarray:
        """Bilinear radiance lookup for unit directions [..., 3]."""
        h, w = self.data.shape[0], self.data.shape[1]
        u, v = _dir_to_uv(d)
        fx = u * w - 0.5
        fy = v * h - 0.5
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 1)
        tx = (fx - x0)[..., None]
        ty = jnp.clip(fy - y0, 0.0, 1.0)[..., None]
        x0w = jnp.mod(x0, w)
        x1w = jnp.mod(x0 + 1, w)  # wrap in azimuth
        y1 = jnp.minimum(y0 + 1, h - 1)
        c00 = self.data[y0, x0w]
        c10 = self.data[y0, x1w]
        c01 = self.data[y1, x0w]
        c11 = self.data[y1, x1w]
        return (
            c00 * (1 - tx) * (1 - ty)
            + c10 * tx * (1 - ty)
            + c01 * (1 - tx) * ty
            + c11 * tx * ty
        )

    def _pdf_uv(self, y: jnp.ndarray, x: jnp.ndarray, v: jnp.ndarray):
        """Solid-angle pdf of the texel (y, x) at polar coordinate v."""
        h, w = self.lum.shape
        pmf = self.lum[y, x] / self.lum_integral
        sin_theta = jnp.maximum(jnp.sin(v * jnp.pi), 1e-6)
        # texel solid angle = (2 pi / w) * (pi / h) * sin(theta)
        return pmf * (h * w) / (2.0 * jnp.pi * jnp.pi * sin_theta)

    def sample_direction(self, sample2: jnp.ndarray):
        """Importance-sample directions proportional to sin-weighted
        luminance. sample2 [..., 2] -> (directions, radiance, pdf)."""
        h, w = self.lum.shape
        s0, s1 = sample2[..., 0], sample2[..., 1]
        y = jnp.searchsorted(self.row_cdf, s0)
        y = jnp.clip(y, 0, h - 1)
        cond = self.cond_cdf[y.reshape(-1)]
        x = jax.vmap(jnp.searchsorted)(cond, s1.reshape(-1)).reshape(y.shape)
        x = jnp.clip(x, 0, w - 1)
        # Continuous inversion: re-use the CDF remainders as uniform
        # intra-texel offsets (Mitsuba's Hierarchical2D does the equivalent
        # continuous inversion), so directions are not quantised to texel
        # centers. The pdf is evaluated at the *jittered* v: within a texel
        # the (u, v) density is constant, so the solid-angle density is
        # pmf * h * w / (2 pi^2 sin(theta(v))) at the actual sample.
        row_prev = jnp.where(y > 0, self.row_cdf[jnp.maximum(y - 1, 0)], 0.0)
        row_pmf = jnp.maximum(self.row_cdf[y] - row_prev, 1e-12)
        rem_y = jnp.clip((s0 - row_prev) / row_pmf, 0.0, 1.0 - 1e-6)
        cond_cdf_x = jnp.take_along_axis(
            cond, x.reshape(-1, 1), axis=1
        )[:, 0].reshape(y.shape)
        cond_prev = jnp.where(
            x > 0,
            jnp.take_along_axis(
                cond, jnp.maximum(x - 1, 0).reshape(-1, 1), axis=1
            )[:, 0].reshape(y.shape),
            0.0,
        )
        cond_pmf = jnp.maximum(cond_cdf_x - cond_prev, 1e-12)
        rem_x = jnp.clip((s1 - cond_prev) / cond_pmf, 0.0, 1.0 - 1e-6)
        u = (x + rem_x) / w
        v = (y + rem_y) / h
        d = _uv_to_dir(u, v)
        pdf = self._pdf_uv(y, x, v)
        return d, self.eval(d), pdf

    def pdf_direction(self, d: jnp.ndarray) -> jnp.ndarray:
        h, w = self.lum.shape
        u, v = _dir_to_uv(d)
        x = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
        y = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
        return self._pdf_uv(y, x, v)


Emitter = Union[ConstantEmitter, EnvironmentMap]


def procedural_sky(h: int = 128, w: int = 256) -> EnvironmentMap:
    """Procedural dusk-sky stand-in for the snapshot-stripped
    ``qwantani_dusk_2_1k.exr`` (reference .MISSING_LARGE_BLOBS): horizon
    gradient plus a bright sun disk, used by tests and examples."""
    theta = (np.arange(h) + 0.5) / h * np.pi
    phi = (np.arange(w) + 0.5) / w * 2.0 * np.pi
    t, p = np.meshgrid(theta, phi, indexing="ij")
    horizon = np.exp(-(((t - np.pi / 2) / 0.35) ** 2))
    sky = np.clip(np.cos(t), 0.0, 1.0)
    sun_dir = np.array([np.sin(1.4) * np.sin(1.0), np.cos(1.4), -np.sin(1.4) * np.cos(1.0)])
    d = np.stack(
        [np.sin(t) * np.sin(p), np.cos(t), -np.sin(t) * np.cos(p)], axis=-1
    )
    cos_sun = np.clip(d @ sun_dir, 0.0, 1.0)
    sun = np.power(cos_sun, 2000.0) * 500.0
    img = np.stack(
        [
            0.25 * sky + 0.9 * horizon + sun,
            0.3 * sky + 0.45 * horizon + 0.9 * sun,
            0.5 * sky + 0.25 * horizon + 0.7 * sun,
        ],
        axis=-1,
    ).astype(np.float32)
    return EnvironmentMap.from_array(img)
