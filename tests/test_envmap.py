"""Environment-map importance sampling: distribution + unbiasedness.

Validates the continuous CDF inversion in
``EnvironmentMap.sample_direction`` (reference behavior: Mitsuba's
Hierarchical2D continuous inversion used by the ``envmap`` plugin for NEE,
``volprim_prb.py:165-235``): directions must NOT be quantised to texel
centers, per-texel frequencies must follow the sin-weighted luminance pmf,
and the returned pdf must make the MC estimate of the total emitted power
unbiased even at very low map resolution.
"""

import jax
import jax.numpy as jnp
import numpy as np

from volprim_tpu.ops import envmap


def _tiny_map(h=8, w=16, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.uniform(0.05, 1.0, size=(h, w, 3)).astype(np.float32)
    data[2, 5] = 40.0  # a bright "sun" texel to stress the pmf spread
    return envmap.EnvironmentMap.from_array(data)


def test_intra_texel_stratification():
    """Samples fill texels continuously (old code pinned u,v at centers)."""
    em = _tiny_map()
    h, w = em.lum.shape
    key = jax.random.PRNGKey(0)
    s2 = jax.random.uniform(key, (20000, 2))
    d, _, _ = em.sample_direction(s2)
    u, v = envmap._dir_to_uv(d)
    fu = np.asarray(u * w - np.floor(u * w))
    fv = np.asarray(v * h - np.floor(v * h))
    for frac in (fu, fv):
        assert abs(frac.mean() - 0.5) < 0.02
        assert abs(frac.std() - np.sqrt(1 / 12)) < 0.02
        # not concentrated at the center
        assert (np.abs(frac - 0.5) > 0.25).mean() > 0.4


def test_texel_frequencies_match_pmf():
    """Chi-square-style frequency check against the sampling pmf."""
    em = _tiny_map()
    h, w = em.lum.shape
    key = jax.random.PRNGKey(1)
    n = 200_000
    s2 = jax.random.uniform(key, (n, 2))
    d, _, _ = em.sample_direction(s2)
    u, v = envmap._dir_to_uv(d)
    x = np.clip(np.asarray(u * w).astype(np.int32), 0, w - 1)
    y = np.clip(np.asarray(v * h).astype(np.int32), 0, h - 1)
    counts = np.zeros((h, w))
    np.add.at(counts, (y, x), 1.0)
    pmf = np.asarray(em.lum / em.lum_integral)
    expected = pmf * n
    chi2 = np.sum((counts - expected) ** 2 / np.maximum(expected, 1e-9))
    # df = h*w - 1 = 127; P(chi2 > 200) < 1e-4
    assert chi2 < 200.0, f"chi2={chi2:.1f}"


def test_power_estimate_unbiased():
    """E[L(d) / pdf(d)] equals the analytic texel-sum power integral."""
    em = _tiny_map(h=6, w=12, seed=3)
    h, w = em.lum.shape
    key = jax.random.PRNGKey(2)
    s2 = jax.random.uniform(key, (400_000, 2))
    d, rad, pdf = em.sample_direction(s2)
    est = float(jnp.mean(jnp.mean(rad, axis=-1) / pdf))
    # analytic: sum over texels of mean-radiance * texel solid angle,
    # integrating sin(theta) exactly over each row
    theta_e = np.linspace(0.0, np.pi, h + 1)
    row_sa = (np.cos(theta_e[:-1]) - np.cos(theta_e[1:])) * (2 * np.pi / w)
    mean_rad = np.asarray(em.data).mean(-1)
    truth = float((mean_rad * row_sa[:, None]).sum())
    # bilinear eval vs nearest-texel pdf leaves a small smoothing residual
    assert abs(est - truth) / truth < 0.03, (est, truth)


def test_pdf_direction_consistent_with_sample():
    em = _tiny_map()
    key = jax.random.PRNGKey(4)
    s2 = jax.random.uniform(key, (4096, 2))
    d, _, pdf_s = em.sample_direction(s2)
    pdf_q = em.pdf_direction(d)
    # exclude the pole caps: reconstructing theta = arccos(d.y) there is
    # ill-conditioned in f32, so sin(theta) (hence the pdf) loses relative
    # accuracy for reasons unrelated to the sampler
    keep = np.abs(np.asarray(d[..., 1])) < 0.999
    np.testing.assert_allclose(
        np.asarray(pdf_q)[keep], np.asarray(pdf_s)[keep], rtol=2e-4
    )
