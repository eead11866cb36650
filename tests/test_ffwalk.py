"""Fused Pallas free-flight walk (pallas_kernels/ffwalk.py) vs the XLA
window walk: sampling decisions, sampled distances, differentiable
post-pass quantities, drop semantics at >K overlaps, surface caps, and the
score-gradient estimator (reference semantics volprim_prb.py:513-654)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volprim_tpu import scene
from volprim_tpu.models.prb import PRBConfig, free_flight, radiance
from volprim_tpu.ops import envmap, kernels, quadric


def _cloud(n_prims=24, seed=3, spread=0.4, smin=0.15, smax=0.5):
    f = scene.EllipsoidsFactory()
    rng = np.random.default_rng(seed)
    for _ in range(n_prims):
        f.add(
            mean=rng.normal(size=3) * spread,
            scale=float(rng.uniform(smin, smax)),
            sigma_t=float(rng.uniform(1.0, 5.0)),
            albedo=float(rng.uniform(0.2, 0.9)),
        )
    return f.build()


def _rays(n, seed=0, jitter=0.3):
    o = jnp.tile(jnp.asarray([0, 0, -5.0], jnp.float32)[None, :], (n, 1))
    o = o + jax.random.normal(jax.random.PRNGKey(seed), (n, 3)) * jnp.asarray(
        [jitter, jitter, 0.0]
    )
    d = jnp.tile(jnp.asarray([0, 0, 1.0], jnp.float32)[None, :], (n, 1))
    xi = jax.random.uniform(
        jax.random.PRNGKey(seed + 1), (n,), minval=1e-6, maxval=1.0
    )
    return o, d, xi


def _compare(s, cfg_base, n=512, t_max=None, seed=0):
    """Run both walk backends on identical inputs; assert agreement."""
    o, d, xi = _rays(n, seed=seed)
    act = jnp.ones((n,), bool)
    cfg_x = dataclasses.replace(cfg_base, walk_backend="xla")
    cfg_p = dataclasses.replace(cfg_base, walk_backend="pallas")
    fx = free_flight(s, o, d, xi, cfg_x, act, t_max=t_max)
    fp = free_flight(s, o, d, xi, cfg_p, act, t_max=t_max)
    found_x, dead_x = np.asarray(fx[0]), np.asarray(fx[1])
    found_p, dead_p = np.asarray(fp[0]), np.asarray(fp[1])
    # decision flips only at f32 rounding boundaries (chi- vs trans-space
    # crossing test): allow a tiny fraction
    assert (found_x != found_p).mean() < 0.01
    assert (dead_x != dead_p).mean() < 0.01
    both = found_x & found_p
    if both.any():
        ts_x = np.asarray(fx[2])[both]
        ts_p = np.asarray(fp[2])[both]
        # same segment + same solver discretization -> solver-resolution
        # agreement
        np.testing.assert_allclose(ts_p, ts_x, atol=5e-3, rtol=1e-3)
        alb_x = np.asarray(fx[3])[both]
        alb_p = np.asarray(fp[3])[both]
        np.testing.assert_allclose(alb_p, alb_x, atol=1e-3)
    # score factors are detached ratios: primal exactly 1 where defined
    for idx in (4, 5):
        np.testing.assert_allclose(
            np.asarray(fp[idx]), 1.0, atol=1e-5
        )
    return fx, fp


BASE = PRBConfig(max_overlaps=8, max_windows=6, chunk_size=64, ff_chunk=0)


def test_pallas_walk_matches_xla_jump():
    _compare(_cloud(), dataclasses.replace(BASE, jump=True))


def test_pallas_walk_matches_xla_sequential():
    _compare(_cloud(), dataclasses.replace(BASE, jump=False))


def test_pallas_walk_matches_xla_with_surface_cap():
    n = 512
    t_max = jnp.where(
        jax.random.uniform(jax.random.PRNGKey(7), (n,)) < 0.5, 5.0, jnp.inf
    ).astype(jnp.float32)
    _compare(_cloud(), dataclasses.replace(BASE, jump=True), n=n, t_max=t_max)


def test_pallas_walk_overlap_drop_semantics():
    # 12 co-located gaussians with K=4: every window drops >K overlaps
    # (reference dr.Local capacity analogue, common.py:428-441) — both
    # backends must agree on the truncated walk
    f = scene.EllipsoidsFactory()
    rng = np.random.default_rng(11)
    for _ in range(12):
        f.add(
            mean=rng.normal(size=3) * 0.05,
            scale=float(rng.uniform(0.3, 0.5)),
            sigma_t=2.0,
            albedo=0.7,
        )
    s = f.build()
    cfg = dataclasses.replace(
        BASE, max_overlaps=4, max_windows=8, jump=False
    )
    _compare(s, cfg, n=256, seed=5)


def test_pallas_walk_solver_disabled():
    # solver_type="disabled" returns the crossing segment's midpoint
    # (prb:545-548) — the segment snap must reproduce it
    cfg = dataclasses.replace(BASE, solver_type="disabled", jump=False)
    _compare(_cloud(), cfg, n=256, seed=29)


def test_pallas_walk_budget_death_agreement():
    # a collection budget far below the per-ray interval need: both
    # backends must budget-kill the same rays (max_depth_primitive
    # semantics, prb:60,456-459)
    s = _cloud(n_prims=40, seed=31, spread=0.2, smin=0.25, smax=0.5)
    cfg = dataclasses.replace(
        BASE, collect_budget=16, max_overlaps=4, max_windows=8, jump=False
    )
    o, d, xi = _rays(256, seed=33)
    act = jnp.ones((256,), bool)
    fx = free_flight(s, o, d, xi, dataclasses.replace(cfg, walk_backend="xla"), act)
    fp = free_flight(s, o, d, xi, dataclasses.replace(cfg, walk_backend="pallas"), act)
    dead_x, dead_p = np.asarray(fx[1]), np.asarray(fp[1])
    assert dead_x.any(), "config must actually exercise budget death"
    assert (dead_x != dead_p).mean() < 0.01


def test_pallas_walk_exact_global_mode():
    # max_overlaps >= collect_budget with max_windows=1 makes the window
    # the WHOLE collected set: a single-pass no-truncation walk. k and
    # n_windows are traced SMEM scalars, so this config shares the Mosaic
    # variant with the windowed walk. Must agree with the XLA walk at the
    # same settings (identical semantics when nothing is dropped).
    cfg = dataclasses.replace(
        BASE, max_overlaps=64, max_windows=1, collect_budget=64, jump=False
    )
    _compare(_cloud(), cfg, n=256, seed=17)


def test_pallas_walk_exact_mode_beats_drop_truncation():
    # With more simultaneous overlaps than K, the windowed walk (like the
    # reference's dr.Local capacity, common.py:428-441) DROPS density and
    # under-samples interactions; the exact global mode (whole collected
    # set as one window) matches the true analytic interaction
    # probability. This capability exceeds the reference: its overlap
    # stack is a hard capacity.
    f = scene.EllipsoidsFactory()
    rng = np.random.default_rng(41)
    for _ in range(12):
        f.add(
            mean=rng.normal(size=3) * 0.03,
            scale=0.4,
            sigma_t=1.2,
            albedo=0.5,
        )
    s = f.build()
    n = 8192
    o = jnp.tile(jnp.asarray([0, 0, -5.0], jnp.float32)[None, :], (n, 1))
    d = jnp.tile(jnp.asarray([0, 0, 1.0], jnp.float32)[None, :], (n, 1))
    xi = jax.random.uniform(
        jax.random.PRNGKey(6), (n,), minval=1e-7, maxval=1.0
    )
    act = jnp.ones((n,), bool)
    coeffs = quadric.ray_prim_coeffs(
        o[:1], d[:1], s.centers, s.scales, s.quats
    )
    full = kernels.gaussian_integral_full(
        coeffs, s.scale_prod()[None, :], jnp.ones_like(coeffs.a, bool)
    )
    t_true = float(
        jnp.exp(-jnp.sum(full * s.attrs["sigma_t"][:, 0][None, :], -1))[0]
    )
    tol = 4.0 * np.sqrt(t_true * (1 - t_true) / n)

    kw = dict(collect_budget=16, chunk_size=64, jump=False,
              walk_backend="pallas")
    cfg_drop = PRBConfig(max_overlaps=4, max_windows=8, **kw)
    cfg_exact = PRBConfig(max_overlaps=16, max_windows=1, **kw)
    p_drop = float(jnp.mean(free_flight(s, o, d, xi, cfg_drop, act)[0]))
    p_exact = float(jnp.mean(free_flight(s, o, d, xi, cfg_exact, act)[0]))
    assert abs(p_exact - (1.0 - t_true)) < tol, (p_exact, 1 - t_true)
    # the drop truncation under-samples interactions measurably
    assert p_drop < p_exact - 2 * tol, (p_drop, p_exact)


def test_pallas_walk_free_flight_distribution():
    # inverse-CDF correctness independent of the XLA path: P(found) = 1 - T
    s = _cloud(n_prims=6, seed=9, spread=0.15, smin=0.3, smax=0.5)
    n = 4096
    o = jnp.tile(jnp.asarray([0, 0, -5.0], jnp.float32)[None, :], (n, 1))
    d = jnp.tile(jnp.asarray([0, 0, 1.0], jnp.float32)[None, :], (n, 1))
    xi = jax.random.uniform(
        jax.random.PRNGKey(2), (n,), minval=1e-7, maxval=1.0
    )
    cfg = dataclasses.replace(BASE, walk_backend="pallas")
    found, dead, t_samp, _, _, _ = free_flight(
        s, o, d, xi, cfg, jnp.ones((n,), bool)
    )
    assert not bool(jnp.any(dead))
    coeffs = quadric.ray_prim_coeffs(
        o[:1], d[:1], s.centers, s.scales, s.quats
    )
    full = kernels.gaussian_integral_full(
        coeffs, s.scale_prod()[None, :], jnp.ones_like(coeffs.a, bool)
    )
    sig = s.attrs["sigma_t"][:, 0]
    t_exp = float(jnp.exp(-jnp.sum(full * sig[None, :], axis=-1))[0])
    p_found = float(jnp.mean(found))
    tol = 4.0 * np.sqrt(t_exp * (1 - t_exp) / n)
    assert abs(p_found - (1.0 - t_exp)) < tol


def test_pallas_walk_score_gradient_absorbing():
    # the recomputed differentiable post-pass must reproduce the analytic
    # score gradient: for albedo=0, dE[L]/dsigma_t = -D * T * env
    f = scene.EllipsoidsFactory()
    f.add(mean=[0, 0, 0], scale=0.5, sigma_t=3.0, albedo=0.0)
    s = f.build()
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    n = 8192
    o = jnp.tile(jnp.asarray([0, 0, -5.0], jnp.float32)[None, :], (n, 1))
    d = jnp.tile(jnp.asarray([0, 0, 1.0], jnp.float32)[None, :], (n, 1))
    coeffs = quadric.ray_prim_coeffs(
        o[:1], d[:1], s.centers, s.scales, s.quats
    )
    full = kernels.gaussian_integral_full(
        coeffs, s.scale_prod()[None, :], jnp.ones_like(coeffs.a, bool)
    )
    d_full = float(jnp.sum(full, axis=-1)[0])
    t_exp = float(np.exp(-3.0 * d_full))
    cfg = dataclasses.replace(
        BASE, max_overlaps=4, max_windows=2, chunk_size=8,
        bounce_cap=32, walk_backend="pallas",
    )

    def loss(sig):
        s2 = scene.EllipsoidScene(
            s.centers, s.scales, s.quats,
            {**s.attrs, "sigma_t": sig}, s.extent,
        )
        out = radiance(s2, em, o, d, cfg, jax.random.PRNGKey(4))
        return jnp.mean(out[:, 0])

    g = float(jax.grad(loss)(s.attrs["sigma_t"])[0, 0])
    expected = -d_full * t_exp
    tol = 4.0 * d_full * np.sqrt(t_exp * (1 - t_exp) / n) + 0.02 * abs(
        expected
    )
    assert abs(g - expected) < tol, f"grad {g} vs {expected} +/- {tol}"


def test_pallas_walk_radiance_close():
    # end-to-end: same seeds, scattering medium — images nearly identical
    s = _cloud(n_prims=10, seed=13)
    em = envmap.ConstantEmitter(radiance=jnp.asarray([0.6, 0.8, 1.0]))
    n = 1024
    o, d, _ = _rays(n, seed=21)
    cfg_x = dataclasses.replace(BASE, bounce_cap=8)
    cfg_p = dataclasses.replace(cfg_x, walk_backend="pallas")
    lx = np.asarray(radiance(s, em, o, d, cfg_x, jax.random.PRNGKey(5)))
    lp = np.asarray(radiance(s, em, o, d, cfg_p, jax.random.PRNGKey(5)))
    # identical sampling decisions except f32-boundary flips: compare means
    # tightly and pixels loosely
    np.testing.assert_allclose(lp.mean(0), lx.mean(0), rtol=5e-3, atol=5e-3)
    close = np.isclose(lp, lx, rtol=1e-2, atol=1e-2).mean()
    assert close > 0.98, f"per-ray agreement {close}"
