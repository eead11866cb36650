"""Reference renderers for heterogeneous grid volumes.

Replaces the Mitsuba ``prbvolpath`` + ``heterogeneous``/``gridvolume`` stack
the reference uses solely to render tomography ground-truth images
(``/root/reference/examples/optimize_volume.py:91-122``; SURVEY.md §2.3 calls
for "a minimal grid-volume path tracer to generate references"). Two
renderers:

- :func:`radiance` — absorption-only ray marcher (the quantity the
  tomography integrator reconstructs); reference images are clipped to
  [0, 1] just like optimize_volume.py:124.
- :func:`radiance_scattering` — multiple-scattering path tracer matching
  the reference's actual ground-truth semantics (``prbvolpath`` over a
  ``heterogeneous`` medium with constant albedo + isotropic phase under a
  constant emitter): Woodcock delta tracking for free flight, deterministic
  ray-marched transmittance for NEE shadow rays, MIS on escape.
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
    # scattering path tracer (prbvolpath semantics)
    albedo: float = 0.6  # constant single-scattering albedo (:107 init_albedo)
    bounce_cap: int = 32  # path length bound (prbvolpath max_depth analogue)
    tracking_steps: int = 128  # delta-tracking iterations per free flight
    shadow_steps: int = 128  # ray-march steps for NEE transmittance


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


def _bbox_intersect(grid: GridVolume, o, d):
    inv_d = jnp.where(jnp.abs(d) > 1e-9, 1.0 / d, 1e9)
    t0 = (grid.bbox_min - o) * inv_d
    t1 = (grid.bbox_max - o) * inv_d
    t_near = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), 0.0)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return t_near, t_far


def _transmittance(grid, o, d, cfg: GridVolumeConfig):
    """exp(-sigma_scale * integral of the grid) along the ray (marched)."""
    t_near, t_far = _bbox_intersect(grid, o, d)
    hit = t_far > t_near
    dt = jnp.where(hit, (t_far - t_near) / cfg.shadow_steps, 0.0)

    def step(tau, i):
        t = t_near + (i + 0.5) * dt
        p = o + d * t[:, None]
        return tau + grid.sample(p)[..., 0] * dt, None

    tau, _ = jax.lax.scan(
        step, jnp.zeros(o.shape[0], o.dtype), jnp.arange(cfg.shadow_steps)
    )
    return jnp.exp(-cfg.sigma_scale * tau)


def radiance_scattering(
    grid: GridVolume, emitter, o, d, cfg: GridVolumeConfig, key=None
):
    """Multiple-scattering radiance through the grid (prbvolpath semantics:
    heterogeneous sigma_t = sigma_scale * grid, constant albedo, isotropic
    phase, environment emitter with NEE + MIS; optimize_volume.py:91-122).

    Free flight uses Woodcock delta tracking against the grid maximum as
    majorant — unbiased for trilinear grids; ``tracking_steps`` bounds the
    null-collision loop (paths that exhaust it are treated as escaped; with
    the default budget that probability is negligible for smoke-like
    grids).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    r = o.shape[0]
    majorant = cfg.sigma_scale * jnp.maximum(jnp.max(grid.data), 1e-6)
    inv_maj = 1.0 / majorant
    iso_pdf = 1.0 / (4.0 * jnp.pi)

    def free_flight(o_c, d_c, k, active):
        """Delta tracking from the bbox entry. Returns (found, t)."""
        t_near, t_far = _bbox_intersect(grid, o_c, d_c)

        def body(carry, i):
            t, done, real_hit = carry
            ki = jax.random.fold_in(k, i)
            u1 = jax.random.uniform(ki, (r,), minval=1e-7)
            u2 = jax.random.uniform(jax.random.fold_in(ki, 1), (r,))
            t_new = t - jnp.log(u1) * inv_maj
            inside = t_new <= t_far
            p = o_c + d_c * t_new[:, None]
            sig = cfg.sigma_scale * grid.sample(p)[..., 0]
            real = u2 < sig * inv_maj
            newly = ~done & inside & real
            t = jnp.where(done, t, t_new)
            done = done | newly | ~inside
            real_hit = real_hit | newly
            return (t, done, real_hit), None

        init = (
            t_near,
            ~active | (t_far <= t_near),
            jnp.zeros((r,), bool),
        )
        (t, _, real_hit), _ = jax.lax.scan(
            body, init, jnp.arange(cfg.tracking_steps)
        )
        # rays that exhaust the tracking budget without a real collision
        # count as escaped (never as a collision at a null point)
        found = active & real_hit
        return found, t

    def bounce(carry, i):
        o_c, d_c, beta, l_acc, active, prev_pdf = carry
        kb = jax.random.fold_in(key, i)
        k_ff, k_nee, k_ph1, k_ph2 = jax.random.split(kb, 4)

        found, t_s = free_flight(o_c, d_c, k_ff, active)
        escaped = active & ~found

        # environment hit with MIS
        em_pdf = jnp.where(i > 0, emitter.pdf_direction(d_c), 0.0)
        l_acc = l_acc + jnp.where(
            escaped[:, None],
            beta * _mis(prev_pdf, em_pdf)[:, None] * emitter.eval(d_c),
            0.0,
        )

        p_int = o_c + d_c * jnp.where(found, t_s, 0.0)[:, None]
        beta = jnp.where(found[:, None], beta * cfg.albedo, beta)

        # NEE
        s2 = jax.random.uniform(k_nee, (r, 2))
        ds_dir, ds_val, ds_pdf = emitter.sample_direction(s2)
        tr = _transmittance(grid, p_int, ds_dir, cfg)
        lr_nee = (
            beta * iso_pdf * _mis(ds_pdf, jnp.full((r,), iso_pdf))[:, None]
            * tr[:, None] * ds_val / jnp.maximum(ds_pdf, 1e-30)[:, None]
        )
        l_acc = l_acc + jnp.where(
            (found & (ds_pdf > 0.0))[:, None], lr_nee, 0.0
        )

        # isotropic phase sampling
        z = 1.0 - 2.0 * jax.random.uniform(k_ph1, (r,))
        rxy = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
        phi = 2.0 * jnp.pi * jax.random.uniform(k_ph2, (r,))
        wo = jnp.stack([rxy * jnp.cos(phi), rxy * jnp.sin(phi), z], axis=-1)
        o_c = jnp.where(found[:, None], p_int, o_c)
        d_c = jnp.where(found[:, None], wo, d_c)
        prev_pdf = jnp.where(found, iso_pdf, prev_pdf)
        active = found & jnp.any(beta > 0.003, axis=-1)
        return (o_c, d_c, beta, l_acc, active, prev_pdf), None

    init = (
        o, d, jnp.ones((r, 3), o.dtype), jnp.zeros((r, 3), o.dtype),
        jnp.ones((r,), bool), jnp.ones((r,), o.dtype),
    )
    (_, _, _, l_acc, _, _), _ = jax.lax.scan(
        bounce, init, jnp.arange(cfg.bounce_cap)
    )
    return l_acc


def _mis(pdf_a, pdf_b):
    a2 = pdf_a * pdf_a
    w = a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-30)
    return jnp.where(pdf_a > 0.0, w, 0.0)
