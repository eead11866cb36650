"""Kernel math vs numerical quadrature (the unit-test layer SURVEY.md §4
prescribes: closed forms checked against dense integration of eval())."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volprim_tpu.ops import kernels, quadric, quaternion, sh

jax.config.update("jax_enable_x64", False)


def random_setup(seed, n_rays=16, n_prims=8, aniso=True):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n_rays, 3)).astype(np.float32) * 2.0
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    centers = rng.normal(size=(n_prims, 3)).astype(np.float32)
    if aniso:
        scales = rng.uniform(0.2, 1.5, size=(n_prims, 3)).astype(np.float32)
    else:
        scales = np.tile(
            rng.uniform(0.3, 1.0, size=(n_prims, 1)).astype(np.float32), (1, 3)
        )
    quats = rng.normal(size=(n_prims, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    return map(jnp.asarray, (o, d, centers, scales, quats))


def quad_eval(o, d, centers, scales, quats, t):
    """Mahalanobis^2 q(t) for all (ray, prim, t) via explicit geometry."""
    rot = np.asarray(quaternion.to_rotation_matrix(quats))
    p = (
        np.asarray(o)[:, None, None, :]
        + np.asarray(d)[:, None, None, :] * t[None, None, :, None]
    )  # [R, 1, T, 3] broadcast against prims
    rel = p - np.asarray(centers)[None, :, None, :]
    local = np.einsum("cji,rctj->rcti", rot, rel) / np.asarray(scales)[None, :, None, :]
    return np.sum(local**2, axis=-1)  # [R, C, T]


def test_pair_coeffs_match_outer():
    o, d, centers, scales, quats = random_setup(0)
    outer = quadric.ray_prim_coeffs(o, d, centers, scales, quats)
    # pair_coeffs with broadcast shapes must reproduce the outer product
    pair = quadric.pair_coeffs(
        o[:, None, :], d[:, None, :], centers[None], scales[None], quats[None]
    )
    np.testing.assert_allclose(outer.a, pair.a, rtol=1e-4)
    np.testing.assert_allclose(outer.b, pair.b, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(outer.c, pair.c, rtol=1e-3, atol=1e-3)


def test_quadric_matches_geometry():
    o, d, centers, scales, quats = random_setup(1)
    coeffs = quadric.ray_prim_coeffs(o, d, centers, scales, quats)
    ts = np.linspace(-3.0, 3.0, 7, dtype=np.float32)
    q_geom = quad_eval(o, d, centers, scales, quats, ts)
    a, b, c = map(np.asarray, coeffs)
    q_coef = (
        a[..., None] * ts**2 + 2.0 * b[..., None] * ts + c[..., None]
    )
    np.testing.assert_allclose(q_geom, q_coef, rtol=2e-3, atol=2e-3)


def test_gemm_features_match_direct():
    o, d, centers, scales, quats = random_setup(7)
    direct = quadric.ray_prim_coeffs(o, d, centers, scales, quats)
    pf = quadric.prim_features(centers, scales, quats)
    fa, fb, fc = quadric.ray_features(o, d)
    hp = jax.lax.Precision.HIGHEST
    np.testing.assert_allclose(
        jnp.dot(fa, pf, precision=hp), direct.a, rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        jnp.dot(fb, pf, precision=hp), direct.b, rtol=1e-3, atol=1e-2
    )
    np.testing.assert_allclose(
        jnp.dot(fc, pf, precision=hp), direct.c, rtol=1e-3, atol=5e-2
    )


def test_intersect_extent():
    o, d, centers, scales, quats = random_setup(2)
    coeffs = quadric.ray_prim_coeffs(o, d, centers, scales, quats)
    extent = 3.0
    valid, t0, t1 = quadric.intersect_extent(coeffs, extent)
    valid, t0, t1 = map(np.asarray, (valid, t0, t1))
    ts = np.linspace(-20.0, 20.0, 20001, dtype=np.float32)
    q = quad_eval(o, d, centers, scales, quats, ts)
    inside = q <= extent**2
    brute_valid = inside.any(axis=-1) & (ts[np.argmax(inside[..., ::-1].cumsum(-1) > 0, axis=-1)] is not None)
    # brute entry/exit from the dense scan
    has = inside.any(axis=-1)
    first = np.where(has, ts[np.argmax(inside, axis=-1)], np.inf)
    last_idx = inside.shape[-1] - 1 - np.argmax(inside[..., ::-1], axis=-1)
    last = np.where(has, ts[last_idx], -np.inf)
    brute_valid = has & (last > 0)
    np.testing.assert_array_equal(valid, brute_valid)
    np.testing.assert_allclose(t0[valid], first[valid], atol=5e-3)
    np.testing.assert_allclose(t1[valid], last[valid], atol=5e-3)


def test_gaussian_integral_full_vs_quadrature():
    o, d, centers, scales, quats = random_setup(3)
    coeffs = quadric.ray_prim_coeffs(o, d, centers, scales, quats)
    s_prod = (scales[:, 0] * scales[:, 1] * scales[:, 2])[None, :]
    active = jnp.ones(coeffs.a.shape, bool)
    closed = np.asarray(
        kernels.gaussian_integral_full(coeffs, s_prod, active)
    )
    ts = np.linspace(-40.0, 40.0, 40001, dtype=np.float32)
    q = quad_eval(o, d, centers, scales, quats, ts)
    pdf = np.exp(-0.5 * q) / (
        (2 * np.pi) ** 1.5 * np.asarray(s_prod)[..., None]
    )
    quad = np.trapezoid(pdf, ts, axis=-1)
    np.testing.assert_allclose(closed, quad, rtol=2e-3, atol=1e-6)


def test_gaussian_integral_segment_vs_quadrature():
    o, d, centers, scales, quats = random_setup(4)
    coeffs = quadric.ray_prim_coeffs(o, d, centers, scales, quats)
    s_prod = (scales[:, 0] * scales[:, 1] * scales[:, 2])[None, :]
    t0v, t1v = 0.3, 2.1
    t0 = jnp.full(coeffs.a.shape, t0v)
    t1 = jnp.full(coeffs.a.shape, t1v)
    active = jnp.ones(coeffs.a.shape, bool)
    closed = np.asarray(
        kernels.gaussian_integral_segment(coeffs, s_prod, t0, t1, active)
    )
    ts = np.linspace(t0v, t1v, 4001, dtype=np.float32)
    q = quad_eval(o, d, centers, scales, quats, ts)
    pdf = np.exp(-0.5 * q) / ((2 * np.pi) ** 1.5 * np.asarray(s_prod)[..., None])
    quad = np.trapezoid(pdf, ts, axis=-1)
    np.testing.assert_allclose(closed, quad, rtol=5e-3, atol=1e-7)


def test_gaussian_inv_cdf_roundtrip():
    o, d, centers, scales, quats = random_setup(5, n_rays=8, n_prims=4)
    coeffs = quadric.ray_prim_coeffs(o, d, centers, scales, quats)
    s_prod = (scales[:, 0] * scales[:, 1] * scales[:, 2])[None, :]
    active = jnp.ones(coeffs.a.shape, bool)
    full = kernels.gaussian_integral_full(coeffs, s_prod, active)
    sigma_t = 2.0 / jnp.maximum(full, 1e-6)  # so optical depth is O(1)
    chi = jnp.full(coeffs.a.shape, 0.4)
    t_s = kernels.gaussian_inv_cdf(coeffs, s_prod, sigma_t, chi, active)
    # CDF(t_s) should equal -log(chi)/sigma_t: check via segment integral
    # from far behind to t_s. The segment form masks t1 <= 0 (common.py:208),
    # so only check samples in front of the origin.
    t_lo = jnp.full(coeffs.a.shape, -100.0)
    cdf = kernels.gaussian_integral_segment(coeffs, s_prod, t_lo, t_s, active)
    target = -jnp.log(chi) / sigma_t
    sel = np.asarray(t_s) > 1e-3
    assert sel.sum() >= 6  # enough coverage
    np.testing.assert_allclose(
        np.asarray(cdf)[sel], np.asarray(target)[sel], rtol=2e-2
    )


def test_epanechnikov_segment_vs_quadrature():
    o, d, centers, scales, quats = random_setup(6)
    coeffs = quadric.ray_prim_coeffs(o, d, centers, scales, quats)
    s_prod = (scales[:, 0] * scales[:, 1] * scales[:, 2])[None, :]
    # integrate over the support [q <= 1] so the polynomial form is exact
    valid, t0, t1 = quadric.intersect_extent(coeffs, 1.0)
    active = valid & (t0 > 0)
    closed = np.asarray(
        kernels.epanechnikov_integral_segment(coeffs, s_prod, t0, t1, active)
    )
    # quadrature of the normalized epanechnikov pdf along the ray
    t0n, t1n = np.asarray(t0), np.asarray(t1)
    steps = np.linspace(0.0, 1.0, 2001, dtype=np.float32)
    closed_sel = closed[np.asarray(active)]
    rows, cols = np.nonzero(np.asarray(active))
    quads = []
    for r_i, c_i in zip(rows[:50], cols[:50]):
        ts = t0n[r_i, c_i] + (t1n[r_i, c_i] - t0n[r_i, c_i]) * steps
        q = quad_eval(
            o[r_i:r_i + 1], d[r_i:r_i + 1],
            centers[c_i:c_i + 1], scales[c_i:c_i + 1], quats[c_i:c_i + 1], ts,
        )[0, 0]
        pdf = 15.0 / (8.0 * np.pi * np.asarray(s_prod)[0, c_i]) * np.maximum(
            1.0 - q, 0.0
        )
        quads.append(np.trapezoid(pdf, ts))
    sel = closed[rows[:50], cols[:50]]
    np.testing.assert_allclose(sel, np.asarray(quads), rtol=1e-2, atol=1e-7)


def test_peak_response():
    o, d, centers, scales, quats = random_setup(8)
    coeffs = quadric.ray_prim_coeffs(o, d, centers, scales, quats)
    peak = np.asarray(kernels.gaussian_peak_response(coeffs))
    ts = np.linspace(-30.0, 30.0, 60001, dtype=np.float32)
    q = quad_eval(o, d, centers, scales, quats, ts)
    brute = np.exp(-0.5 * q.min(axis=-1))
    np.testing.assert_allclose(peak, brute, rtol=1e-3, atol=1e-5)


def test_sh_orthonormality():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(200000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    basis = np.asarray(sh.eval_basis(jnp.asarray(d, jnp.float32), 3))
    gram = basis.T @ basis / d.shape[0] * 4.0 * np.pi
    np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


def test_normalization_factor_matches_reference_form():
    scales = jnp.asarray([[0.5, 0.7, 0.9]])
    nf = np.asarray(kernels.gaussian_normalization_factor(scales))[0]
    sx, sy, sz = 0.5, 0.7, 0.9
    expected = 1.0 / (
        0.5 * 4.0 * np.pi
        * np.sqrt((sx**2 * sy**2 + sx**2 * sz**2 + sy**2 * sz**2) / 3.0)
    )
    assert abs(nf - expected) < 1e-6
    nf_e = np.asarray(kernels.epanechnikov_normalization_factor(scales))[0]
    expected_e = 5.0 / (
        2.0 * np.pi
        * np.sqrt((sx**2 * sy**2 + sx**2 * sz**2 + sy**2 * sz**2) / 3.0)
    )
    assert abs(nf_e - expected_e) < 1e-5


def test_kernel_dispatch():
    k = kernels.Kernel("gaussian", normalized=True, full_range=True)
    assert k.normalization_factor(jnp.ones((2, 3))).shape == (2,)
    with pytest.raises(ValueError):
        kernels.Kernel("triangle")


def test_gaussian_segment_taus_matches_broadcast():
    """The shared-boundary antiderivative equals the per-segment broadcast
    of gaussian_integral_segment when segment boundaries subdivide the
    intervals exactly (the prb window-walk contract)."""
    import numpy as np

    from volprim_tpu.ops import kernels as K
    from volprim_tpu.ops.quadric import QuadricCoeffs

    rng = np.random.default_rng(11)
    r, k = 64, 6
    a = jnp.asarray(rng.uniform(0.5, 50.0, (r, k)), jnp.float32)
    b = jnp.asarray(rng.normal(0.0, 3.0, (r, k)), jnp.float32)
    # keep q_min = c - b^2/a in a lively range
    c = b * b / a + jnp.asarray(rng.uniform(0.0, 6.0, (r, k)), jnp.float32)
    coeffs = QuadricCoeffs(a, b, c)
    s_prod = jnp.asarray(rng.uniform(0.01, 1.0, (r, k)), jnp.float32)
    sigma = jnp.asarray(rng.uniform(0.1, 5.0, (r, k)), jnp.float32)
    entry = jnp.asarray(np.sort(rng.uniform(0.0, 4.0, (r, k)), axis=-1),
                        jnp.float32)
    exit_t = entry + jnp.asarray(rng.uniform(0.05, 2.0, (r, k)), jnp.float32)
    # padding rows like the window walk produces
    entry = entry.at[:, -1].set(jnp.inf)
    exit_t = exit_t.at[:, -1].set(jnp.inf)
    events = jnp.sort(jnp.concatenate([entry, exit_t], axis=-1), axis=-1)

    taus = K.gaussian_segment_taus(coeffs, s_prod, sigma, entry, exit_t,
                                   events)
    assert np.isfinite(np.asarray(taus)).all()

    t0s, t1s = events[:, :-1], events[:, 1:]
    mids = 0.5 * (t0s + t1s)
    cover = (entry[:, None, :] <= mids[:, :, None]) & (
        exit_t[:, None, :] >= mids[:, :, None]
    )
    c3 = QuadricCoeffs(a[:, None, :], b[:, None, :], c[:, None, :])
    dens = K.gaussian_integral_segment(
        c3, s_prod[:, None, :], t0s[:, :, None], t1s[:, :, None], cover
    )
    ref = jnp.sum(dens * sigma[:, None, :], axis=-1)
    valid = jnp.isfinite(t1s) & (t1s > t0s)
    np.testing.assert_allclose(
        np.asarray(jnp.where(valid, taus, 0.0)),
        np.asarray(jnp.where(valid, ref, 0.0)),
        rtol=2e-4, atol=2e-5,
    )


def test_gaussian_segment_taus_padded_events_contribute_zero():
    """Non-finite (padding) event boundaries map to each pair's exit: a
    segment whose right boundary is +inf must contribute a NON-NEGATIVE tau
    (the remaining pair mass), and a fully-padded segment exactly zero —
    without any caller-side valid_seg masking (advisor round-2 finding)."""
    import numpy as np

    from volprim_tpu.ops import kernels as K
    from volprim_tpu.ops.quadric import QuadricCoeffs

    r, k = 4, 3
    a = jnp.full((r, k), 4.0)
    b = jnp.full((r, k), -2.0)
    c = b * b / a + 0.5
    coeffs = QuadricCoeffs(a, b, c)
    s_prod = jnp.full((r, k), 0.1)
    sigma = jnp.full((r, k), 2.0)
    entry = jnp.tile(jnp.asarray([0.1, 0.3, jnp.inf]), (r, 1))
    exit_t = jnp.tile(jnp.asarray([1.0, 1.4, jnp.inf]), (r, 1))
    # events: two real boundaries then +inf padding
    events = jnp.tile(
        jnp.asarray([0.1, 0.3, 1.0, 1.4, jnp.inf, jnp.inf]), (r, 1)
    )
    taus = np.asarray(
        K.gaussian_segment_taus(coeffs, s_prod, sigma, entry, exit_t, events)
    )
    assert np.isfinite(taus).all()
    assert (taus >= 0.0).all(), taus
    # segment [1.4, inf) covers no pair mass (all exits <= 1.4) -> 0;
    # segment [inf, inf) is pure padding -> 0
    np.testing.assert_allclose(taus[:, 3], 0.0, atol=1e-7)
    np.testing.assert_allclose(taus[:, 4], 0.0, atol=1e-7)


def test_epanechnikov_inv_cdf_roundtrip():
    """Closed-form (Cardano) Epanechnikov free-flight inverse: at the
    returned t, sigma_t * CDF(entry -> t) must equal -log(chi) — checked
    against the closed-form segment integral AND numerical quadrature of
    the pdf. The reference raises NotImplementedError here (common.py:
    279-285); this exceeds parity."""
    import numpy as np

    from volprim_tpu.ops import kernels as K
    from volprim_tpu.ops.quadric import QuadricCoeffs

    rng = np.random.default_rng(5)
    n = 256
    a = jnp.asarray(rng.uniform(1.0, 40.0, n), jnp.float32)
    # support entirely at positive t (free-flight domain; the closed-form
    # segment integral used for verification masks t1 <= 0, and the support
    # half-width sqrt((1-q_min)/a) <= 1 < t_star here)
    t_star = jnp.asarray(rng.uniform(2.0, 4.0, n), jnp.float32)
    b = -a * t_star
    # q_min inside the support (q < 1)
    c = b * b / a + jnp.asarray(rng.uniform(0.0, 0.9, n), jnp.float32)
    coeffs = QuadricCoeffs(a, b, c)
    s_prod = jnp.asarray(rng.uniform(0.01, 0.5, n), jnp.float32)
    sigma_t = jnp.asarray(rng.uniform(0.5, 20.0, n), jnp.float32)
    chi = jnp.asarray(rng.uniform(0.02, 0.98, n), jnp.float32)
    active = jnp.ones((n,), bool)

    t_s = np.asarray(
        K.epanechnikov_inv_cdf(coeffs, s_prod, sigma_t, chi, active)
    )
    assert np.isfinite(t_s).all()

    # support bounds: q(t) = 1
    q_min = np.asarray(K.gaussian_q_min(coeffs))
    t_star = np.asarray(-b / a)
    half = np.sqrt((1.0 - q_min) / np.asarray(a))
    tn, tf = t_star - half, t_star + half
    # within-mass samples must land inside the support
    tau_total = np.asarray(
        K.epanechnikov_integral_segment(
            coeffs, s_prod, jnp.asarray(tn), jnp.asarray(tf), active
        )
    ) * np.asarray(sigma_t)
    in_mass = -np.log(np.asarray(chi)) < tau_total * (1 - 1e-4)
    assert (t_s[in_mass] > tn[in_mass] - 1e-5).all()
    assert (t_s[in_mass] < tf[in_mass] + 1e-5).all()

    # closed-form segment integral up to t_s reproduces -log(chi)
    tau_at = np.asarray(
        K.epanechnikov_integral_segment(
            coeffs, s_prod, jnp.asarray(tn), jnp.asarray(t_s), active
        )
    ) * np.asarray(sigma_t)
    np.testing.assert_allclose(
        tau_at[in_mass], -np.log(np.asarray(chi))[in_mass],
        rtol=2e-3, atol=2e-4,
    )

    # quadrature cross-check of the first 16 rows
    for i in range(16):
        if not in_mass[i]:
            continue
        ts = np.linspace(tn[i], t_s[i], 4001)
        q = (np.asarray(a)[i] * ts + 2 * np.asarray(b)[i]) * ts + np.asarray(c)[i]
        pdf = np.maximum(
            15.0 / (8.0 * np.pi * np.asarray(s_prod)[i]) * (1.0 - q), 0.0
        )
        quad = np.trapezoid(pdf, ts) * np.asarray(sigma_t)[i]
        np.testing.assert_allclose(
            quad, -np.log(np.asarray(chi)[i]), rtol=3e-3, atol=3e-4
        )

    # beyond-total-mass samples clamp to the support exit
    chi_tiny = jnp.full((n,), 1e-12, jnp.float32)
    t_exit = np.asarray(
        K.epanechnikov_inv_cdf(coeffs, s_prod, sigma_t, chi_tiny, active)
    )
    big = tau_total < -np.log(1e-12) * 0.5
    np.testing.assert_allclose(t_exit[big], tf[big], rtol=1e-3, atol=1e-4)
