"""Reference renderer for heterogeneous grid volumes.

Replaces the Mitsuba ``prbvolpath`` + ``heterogeneous``/``gridvolume`` stack
the reference uses solely to render tomography ground-truth images
(``/root/reference/examples/optimize_volume.py:91-122``; SURVEY.md §2.3 calls
for "a minimal grid-volume path tracer to generate references"). This is an
absorption-only ray marcher (the quantity the tomography integrator
reconstructs); the reference images are clipped to [0, 1] just like
optimize_volume.py:124.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..scene.vol import GridVolume


@dataclasses.dataclass(frozen=True)
class GridVolumeConfig:
    sigma_scale: float = 5.0  # 'scale' in the reference scene (:108)
    num_steps: int = 256  # ray-marching steps through the bbox
    to_world_scale: tuple = (1.0, 2.0, 1.0)  # reference grid transform (:105)
    to_world_translate: tuple = (-0.5, -1.0, -0.5)


def transform_grid(grid: GridVolume, cfg: GridVolumeConfig) -> GridVolume:
    """Apply the reference's gridvolume to_world (scale then translate of the
    unit cube, optimize_volume.py:105) by transforming the bbox."""
    scale = jnp.asarray(cfg.to_world_scale)
    trans = jnp.asarray(cfg.to_world_translate)
    return GridVolume(
        data=grid.data,
        bbox_min=grid.bbox_min * scale + trans,
        bbox_max=grid.bbox_max * scale + trans,
    )


def radiance(grid: GridVolume, emitter, o, d, cfg: GridVolumeConfig, key=None):
    """Transmittance-through-grid radiance for a wavefront of rays."""
    del key
    # Intersect the bbox (slab test).
    inv_d = jnp.where(jnp.abs(d) > 1e-9, 1.0 / d, 1e9)
    t0 = (grid.bbox_min - o) * inv_d
    t1 = (grid.bbox_max - o) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_near = jnp.maximum(t_near, 0.0)
    hit = t_far > t_near

    dt = (t_far - t_near) / cfg.num_steps

    def step(tau, i):
        t = t_near + (i + 0.5) * dt
        p = o + d * t[:, None]
        dens = grid.sample(p)[..., 0]
        return tau + dens * dt, None

    tau, _ = jax.lax.scan(
        step, jnp.zeros(o.shape[0], o.dtype), jnp.arange(cfg.num_steps)
    )
    beta = jnp.exp(-cfg.sigma_scale * jnp.where(hit, tau, 0.0))
    env = (
        emitter.eval(d) if emitter is not None else jnp.ones(d.shape[:-1] + (3,))
    )
    return beta[:, None] * env
