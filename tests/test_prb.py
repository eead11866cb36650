"""PRB path tracer: free-flight distribution, transmittance, furnace test,
score-function gradients (the reference's PRB adjoint machinery rebuilt as
detached-ratio estimators — validated against analytic expectations)."""

import jax
import jax.numpy as jnp
import numpy as np

from volprim_tpu import scene
from volprim_tpu.models.prb import (
    PRBConfig,
    free_flight,
    radiance,
    transmittance,
)
from volprim_tpu.ops import envmap, kernels, quadric


def single_gaussian(sigma_t=4.0, albedo=0.9, scale=0.5):
    f = scene.EllipsoidsFactory()
    f.add(mean=[0, 0, 0], scale=scale, sigma_t=sigma_t, albedo=albedo)
    return f.build()


CFG = PRBConfig(
    max_overlaps=4, max_windows=2, chunk_size=8, bounce_cap=32
)


def dup_rays(o, d, n):
    o = jnp.tile(jnp.asarray(o, jnp.float32)[None, :], (n, 1))
    d = jnp.tile(jnp.asarray(d, jnp.float32)[None, :], (n, 1))
    return o, d


def analytic_tr(s, o, d):
    coeffs = quadric.ray_prim_coeffs(o[:1], d[:1], s.centers, s.scales, s.quats)
    full = kernels.gaussian_integral_full(
        coeffs, s.scale_prod()[None, :], jnp.ones_like(coeffs.a, bool)
    )
    sig = s.attrs["sigma_t"][:, 0]
    return float(jnp.exp(-jnp.sum(full * sig[None, :], axis=-1))[0]), float(
        jnp.sum(full, axis=-1)[0]
    )


def test_miss_gives_env():
    s = single_gaussian()
    em = envmap.ConstantEmitter(radiance=jnp.asarray([0.3, 0.5, 0.7]))
    o, d = dup_rays([0, 5, -3], [0, 0, 1], 4)
    out = np.asarray(radiance(s, em, o, d, CFG, jax.random.PRNGKey(0)))
    np.testing.assert_allclose(out, np.tile([[0.3, 0.5, 0.7]], (4, 1)), rtol=1e-5)


def test_transmittance_matches_analytic():
    s = single_gaussian(sigma_t=2.5)
    o, d = dup_rays([0.1, -0.2, -5.0], [0, 0, 1], 2)
    tr = np.asarray(transmittance(s, o, d, CFG))
    coeffs = quadric.ray_prim_coeffs(o, d, s.centers, s.scales, s.quats)
    t0 = jnp.zeros_like(coeffs.a)
    t1 = jnp.full_like(coeffs.a, 1e7)
    seg = kernels.gaussian_integral_segment(
        coeffs, s.scale_prod()[None, :], t0, t1, jnp.ones_like(coeffs.a, bool)
    )
    expected = np.exp(-np.asarray(jnp.sum(seg * 2.5, axis=-1)))
    np.testing.assert_allclose(tr, expected, rtol=1e-4)


def test_free_flight_distribution():
    s = single_gaussian(sigma_t=3.0)
    n = 4096
    o, d = dup_rays([0, 0, -5], [0, 0, 1], n)
    t_exp, _ = analytic_tr(s, o, d)
    xi = jax.random.uniform(jax.random.PRNGKey(1), (n,), minval=1e-7, maxval=1.0)
    found, dead, t_samp, albedo, sf, se = free_flight(
        s, o, d, xi, CFG, jnp.ones((n,), bool)
    )
    assert not bool(jnp.any(dead))
    p_found = float(jnp.mean(found))
    # P(interaction) = 1 - T; binomial 4-sigma tolerance
    tol = 4.0 * np.sqrt(t_exp * (1 - t_exp) / n)
    assert abs(p_found - (1.0 - t_exp)) < tol
    # sampled distances are inside the extent ellipsoid (|t - 5| < 1.5 = 3*0.5)
    ts = np.asarray(t_samp)[np.asarray(found)]
    assert ts.min() > 3.4 and ts.max() < 6.6
    # sampled-distance CDF check at the midpoint: T(t) = xi inversion means
    # P(t_s < t | found) = (1 - T(t)) / (1 - T_inf)
    coeffs = quadric.ray_prim_coeffs(o[:1], d[:1], s.centers, s.scales, s.quats)
    seg = kernels.gaussian_integral_segment(
        coeffs, s.scale_prod()[None, :],
        jnp.zeros_like(coeffs.a), jnp.full_like(coeffs.a, 5.0),
        jnp.ones_like(coeffs.a, bool),
    )
    t_mid = float(jnp.exp(-3.0 * seg[0, 0]))
    frac = float((ts < 5.0).mean())
    expected_frac = (1 - t_mid) / (1 - t_exp)
    assert abs(frac - expected_frac) < 0.05


def test_absorbing_equals_transmittance():
    # albedo = 0: scattered paths die, E[L] = T * env
    s = single_gaussian(sigma_t=3.0, albedo=0.0)
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    n = 4096
    o, d = dup_rays([0, 0, -5], [0, 0, 1], n)
    t_exp, _ = analytic_tr(s, o, d)
    out = np.asarray(radiance(s, em, o, d, CFG, jax.random.PRNGKey(2)))
    mean = out[:, 0].mean()
    tol = 4.0 * np.sqrt(t_exp * (1 - t_exp) / n)
    assert abs(mean - t_exp) < tol


def test_furnace():
    # albedo = 1 inside a uniform unit environment: radiance must be 1
    # (up to bounce-cap/threshold truncation)
    s = single_gaussian(sigma_t=3.0, albedo=1.0)
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    n = 2048
    o, d = dup_rays([0, 0, -5], [0, 0, 1], n)
    out = np.asarray(radiance(s, em, o, d, CFG, jax.random.PRNGKey(3)))
    mean = out[:, 0].mean()
    assert abs(mean - 1.0) < 0.03, f"furnace mean {mean}"


def test_score_gradient_absorbing():
    # Analytic check of the score-ratio estimator: for albedo=0,
    # E[L] = exp(-sigma_t * D) * env, so dE/dsigma_t = -D * T * env.
    s = single_gaussian(sigma_t=3.0, albedo=0.0)
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    n = 8192
    o, d = dup_rays([0, 0, -5], [0, 0, 1], n)
    t_exp, d_full = analytic_tr(s, o, d)

    def loss(sig):
        s2 = scene.EllipsoidScene(
            s.centers, s.scales, s.quats,
            {**s.attrs, "sigma_t": sig}, s.extent,
        )
        out = radiance(s2, em, o, d, CFG, jax.random.PRNGKey(4))
        return jnp.mean(out[:, 0])

    g = float(jax.grad(loss)(s.attrs["sigma_t"])[0, 0])
    expected = -d_full * t_exp
    # score-function estimator: escaped rays contribute -D each; variance
    # ~ D^2 T(1-T)/n
    tol = 4.0 * d_full * np.sqrt(t_exp * (1 - t_exp) / n) + 0.02 * abs(expected)
    assert abs(g - expected) < tol, f"grad {g} vs {expected} +/- {tol}"


def test_coeff_gemm_matches_elementwise():
    # the MXU coefficient path (quadric.pair_coeffs_gemm, HIGHEST
    # precision) must reproduce the elementwise streaming scans: optical
    # depth to ~f32, free-flight decisions up to rare boundary flips
    import dataclasses

    f = scene.EllipsoidsFactory()
    rng = np.random.default_rng(23)
    for _ in range(20):
        f.add(
            mean=rng.normal(size=3) * 0.4,
            scale=float(rng.uniform(0.15, 0.5)),
            sigma_t=float(rng.uniform(1.0, 5.0)),
            albedo=float(rng.uniform(0.2, 0.9)),
        )
    s = f.build()
    n = 512
    o, d = dup_rays([0, 0, -5], [0, 0, 1], n)
    o = o + jax.random.normal(jax.random.PRNGKey(3), (n, 3)) * jnp.asarray(
        [0.3, 0.3, 0.0]
    )
    cfg_e = PRBConfig(max_overlaps=8, max_windows=6, chunk_size=64)
    cfg_g = dataclasses.replace(cfg_e, coeff_gemm=True)
    f_e = np.asarray(transmittance(s, o, d, cfg_e))
    f_g = np.asarray(transmittance(s, o, d, cfg_g))
    np.testing.assert_allclose(f_g, f_e, rtol=2e-4, atol=2e-5)

    xi = jax.random.uniform(jax.random.PRNGKey(5), (n,), minval=1e-6)
    act = jnp.ones((n,), bool)
    ff_e = free_flight(s, o, d, xi, cfg_e, act)
    ff_g = free_flight(s, o, d, xi, cfg_g, act)
    found_e, found_g = np.asarray(ff_e[0]), np.asarray(ff_g[0])
    assert (found_e != found_g).mean() < 0.01
    both = found_e & found_g
    np.testing.assert_allclose(
        np.asarray(ff_g[2])[both], np.asarray(ff_e[2])[both],
        rtol=1e-3, atol=5e-3,
    )


def test_nee_mis_consistency():
    # with and without NEE must agree in expectation (here: single scatter
    # dominates). Use a sun-less smooth envmap so variance stays low.
    s = single_gaussian(sigma_t=2.0, albedo=0.8)
    rng = np.random.default_rng(0)
    img = 0.5 + 0.4 * rng.random((8, 16, 3)).astype(np.float32)
    em = envmap.EnvironmentMap.from_array(img)
    n = 4096
    o, d = dup_rays([0, 0, -5], [0, 0, 1], n)
    cfg_nee = CFG
    cfg_no = PRBConfig(
        max_overlaps=4, max_windows=2, chunk_size=8, bounce_cap=32,
        use_nee=False,
    )
    out_nee = np.asarray(radiance(s, em, o, d, cfg_nee, jax.random.PRNGKey(5)))
    out_no = np.asarray(radiance(s, em, o, d, cfg_no, jax.random.PRNGKey(6)))
    m1, m2 = out_nee.mean(axis=0), out_no.mean(axis=0)
    np.testing.assert_allclose(m1, m2, rtol=0.06)


def test_epanechnikov_prb_renders_and_scatters():
    """prb is kernel-complete for Epanechnikov too (the reference's
    free-flight raises NotImplementedError for it, common.py:279-285; our
    bisection solver works on the closed-form cubic segment CDF). A dense
    absorbing Epanechnikov cloud must attenuate the environment, and the
    free-flight distribution must match exp(-sigma_t * CDF) against the
    closed-form segment integral."""
    cfg = PRBConfig(
        max_overlaps=4, max_windows=2, chunk_size=8, bounce_cap=16,
        kernel_type="epanechnikov",
    )
    f = scene.EllipsoidsFactory()
    f.add(mean=[0, 0, 0], scale=0.5, sigma_t=0.35, albedo=0.0)
    # extent=1: the traced bounds coincide with the q < 1 pdf support. (At
    # the default extent=3 the polynomial integral over a full crossing is
    # net-negative and clamps to zero — in the REFERENCE's form too,
    # common.py:304-321 dr.maximum(density, 0) — so a single-segment
    # crossing would not attenuate in either implementation.)
    s = f.build(extent=1.0)
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    n = 4096
    o, d = dup_rays([0.03, -0.05, -4.0], [0, 0, 1], n)
    out = np.asarray(radiance(s, em, o, d, cfg, jax.random.PRNGKey(2)))
    assert np.isfinite(out).all()
    # absorbing medium: E[L] = analytic transmittance * env
    coeffs = quadric.ray_prim_coeffs(
        o[:1], d[:1], s.centers, s.scales, s.quats
    )
    valid, tn, tf = quadric.intersect_extent(coeffs, s.extent)
    dens = kernels.epanechnikov_integral_segment(
        coeffs, s.scale_prod()[None, :], tn, tf, valid
    )
    tr = float(jnp.exp(-jnp.sum(dens * s.attrs["sigma_t"][:, 0], axis=-1))[0])
    assert 0.05 < tr < 0.95  # the test is vacuous at the extremes
    np.testing.assert_allclose(out.mean(axis=0), tr, rtol=0.08)

    # scattering variant actually finds interactions
    f2 = scene.EllipsoidsFactory()
    f2.add(mean=[0, 0, 0], scale=0.5, sigma_t=0.35, albedo=0.9)
    s2 = f2.build(extent=1.0)
    xi = jax.random.uniform(jax.random.PRNGKey(3), (n,), minval=1e-7)
    found, dead, t_s, alb, _, _ = free_flight(
        s2, o, d, xi, cfg, jnp.ones((n,), bool)
    )
    fr = float(jnp.mean(found))
    assert abs(fr - (1.0 - tr)) < 0.05, (fr, 1.0 - tr)


def test_adaptive_tail_capacity():
    """Per-bounce adaptive caps: tail caps equal to the head caps change
    nothing (bitwise); generous-but-smaller tail caps on a simple medium
    agree with the full render to MC tolerance."""
    f = scene.EllipsoidsFactory()
    f.add(mean=[0, 0, 0], scale=0.5, sigma_t=3.0, albedo=0.8)
    f.add(mean=[0.4, 0.1, 0.2], scale=0.4, sigma_t=2.0, albedo=0.7)
    s = f.build()
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    n = 4096
    o, d = dup_rays([0.0, 0.0, -4.0], [0, 0, 1], n)
    base = dict(max_overlaps=4, max_windows=4, chunk_size=8, bounce_cap=16)
    cfg0 = PRBConfig(**base)
    cfg_same = PRBConfig(
        tail_after=1, tail_overlaps=4, tail_windows=4, **base
    )
    out0 = np.asarray(radiance(s, em, o, d, cfg0, jax.random.PRNGKey(7)))
    out_same = np.asarray(
        radiance(s, em, o, d, cfg_same, jax.random.PRNGKey(7))
    )
    np.testing.assert_array_equal(out0, out_same)

    cfg_small = PRBConfig(
        tail_after=1, tail_overlaps=2, tail_windows=3, tail_budget=64,
        **base
    )
    out_s = np.asarray(
        radiance(s, em, o, d, cfg_small, jax.random.PRNGKey(7))
    )
    assert np.isfinite(out_s).all()
    np.testing.assert_allclose(
        out_s.mean(axis=0), out0.mean(axis=0), rtol=0.05
    )


def test_suggest_budgets_covers_need():
    """count_intervals must equal the collection pass's entered-interval
    count, and suggest_budgets at percentile=100 must cover the max need
    (no budget kill on the sampled rays)."""
    from volprim_tpu.models.prb import (
        _collect_intervals, count_intervals, suggest_budgets,
    )

    rng = np.random.default_rng(3)
    f = scene.EllipsoidsFactory()
    for _ in range(300):
        f.add(
            mean=rng.normal(size=3) * 0.6,
            scale=rng.uniform(0.05, 0.3, size=3),
            sigma_t=2.0, albedo=0.8,
        )
    s = f.build()
    cam = scene.CameraSpecs(
        name="c", width=16, height=16,
        to_world=scene.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    o, d = scene.generate_rays(cam, jitter=False)
    cfg = PRBConfig(
        max_overlaps=4, max_windows=4, collect_budget=512, chunk_size=128,
        use_clusters=False,
    )
    need = np.asarray(count_intervals(s, o, d, cfg.chunk_size))
    # budget 512 > 300 prims: collection is uncapped — finite entries
    # must equal the counting scan
    entry, _, _, t_budget, _ = _collect_intervals(s, None, o, d, cfg)
    n_open = np.asarray(jnp.sum(jnp.isfinite(entry), axis=-1))
    np.testing.assert_array_equal(need, n_open)
    assert np.isinf(np.asarray(t_budget)).all()  # nothing overflowed

    cfg2 = suggest_budgets(s, o, d, cfg, percentile=100.0)
    assert cfg2.collect_budget >= need.max()
    assert cfg2.collect_budget % 16 == 0
    # windows can consume the whole budget
    assert cfg2.max_windows * cfg2.max_overlaps >= cfg2.collect_budget


def test_spp_group_estimator_equivalent():
    """render(spp_group=g) folds g samples into one wavefront (round-5 spp
    amortization). The estimator must be unchanged: g=1 reproduces the
    ungrouped render bitwise (same key path), and grouped renders agree
    with the ungrouped mean within Monte Carlo noise."""
    from volprim_tpu import models as vmodels

    s = single_gaussian(sigma_t=6.0, albedo=0.8)
    sky = envmap.procedural_sky()
    cam = scene.CameraSpecs(
        name="c", width=16, height=16,
        to_world=scene.look_at([0, 0, -3.0], [0, 0, 0], [0, 1, 0]),
        fov=35.0,
    )
    cfg = PRBConfig(max_overlaps=4, max_windows=4, chunk_size=256,
                    bounce_cap=8)

    def render(spp, g):
        return np.asarray(
            vmodels.render(
                s, cam, radiance, cfg, sky, spp=spp, seed=7, spp_group=g
            )
        )

    img_a = render(8, 1)
    img_a2 = render(8, 1)
    np.testing.assert_array_equal(img_a, img_a2)  # deterministic
    img_g = render(8, 4)
    assert np.isfinite(img_g).all()
    # same estimator, different sample keys: means agree to MC noise
    assert abs(img_g.mean() - img_a.mean()) < 6.0 * img_a.std() / np.sqrt(
        img_a.size / 3
    )
    # non-divisible group sizes fall back to the largest divisor
    img_g3 = render(8, 3)  # g -> 2
    assert np.isfinite(img_g3).all()
