"""PRB coverage extensions: window continuation on dense scenes, HG phase."""

import jax
import jax.numpy as jnp
import numpy as np

from volprim_tpu import scene
from volprim_tpu.models import prb
from volprim_tpu.models.prb import PRBConfig, free_flight, radiance
from volprim_tpu.ops import envmap


def chain_scene(n=24, sigma_t=0.6, albedo=0.0):
    """Many gaussians in a row along +z: more intervals than one window."""
    f = scene.EllipsoidsFactory()
    for i in range(n):
        f.add(
            mean=[0.0, 0.0, float(i) * 0.3], scale=0.25,
            sigma_t=sigma_t, albedo=albedo,
        )
    return f.build()


def test_window_continuation_matches_big_window():
    """Free-flight through 24 overlapping gaussians must agree whether the
    intervals fit in one window or need continuations."""
    s = chain_scene()
    n = 2048
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -3.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    xi = jax.random.uniform(jax.random.PRNGKey(0), (n,), minval=1e-7)
    act = jnp.ones((n,), bool)

    big = PRBConfig(max_overlaps=32, max_windows=1, chunk_size=32)
    small = PRBConfig(max_overlaps=6, max_windows=8, chunk_size=32)
    f_big, d_big, t_big, _, _, _ = free_flight(s, o, d, xi, big, act)
    f_small, d_small, t_small, _, _, _ = free_flight(s, o, d, xi, small, act)

    assert not bool(jnp.any(d_big)) and not bool(jnp.any(d_small))
    np.testing.assert_array_equal(np.asarray(f_big), np.asarray(f_small))
    sel = np.asarray(f_big)
    np.testing.assert_allclose(
        np.asarray(t_big)[sel], np.asarray(t_small)[sel], rtol=1e-3, atol=1e-3
    )


def test_window_exhaustion_marks_dead():
    s = chain_scene()
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    xi = jnp.asarray([1e-7])  # essentially never interacts (T never < xi)
    cfg = PRBConfig(max_overlaps=4, max_windows=1, chunk_size=32)
    found, dead, _, _, _, _ = free_flight(s, o, d, xi, cfg, jnp.ones((1,), bool))
    assert bool(dead[0]) and not bool(found[0])


def test_cluster_gathering_matches_bruteforce():
    """Per-ray cluster-culled interval gathering must reproduce the
    brute-force free-flight results exactly (no truncation case)."""
    s = chain_scene(24, sigma_t=0.8, albedo=0.5)
    n = 2048
    o = jnp.tile(jnp.asarray([[0.05, -0.02, -3.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    xi = jax.random.uniform(jax.random.PRNGKey(2), (n,), minval=1e-7)
    act = jnp.ones((n,), bool)

    brute = PRBConfig(
        max_overlaps=8, max_windows=6, chunk_size=32, use_clusters=False
    )
    clust = PRBConfig(
        max_overlaps=8, max_windows=6, cluster_size=8, cluster_candidates=4,
        use_clusters=True,
    )
    f_b, d_b, t_b, a_b, _, _ = free_flight(s, o, d, xi, brute, act)
    f_c, d_c, t_c, a_c, _, _ = free_flight(s, o, d, xi, clust, act)
    assert not bool(jnp.any(d_b)) and not bool(jnp.any(d_c))
    np.testing.assert_array_equal(np.asarray(f_b), np.asarray(f_c))
    sel = np.asarray(f_b)
    np.testing.assert_allclose(
        np.asarray(t_b)[sel], np.asarray(t_c)[sel], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(a_b)[sel], np.asarray(a_c)[sel], rtol=1e-4, atol=1e-5
    )


def test_hg_phase_sampling_distribution():
    """HG-sampled cos(theta) must match the HG pdf moments."""
    cfg = PRBConfig(phase="hg", phase_g=0.6)
    n = 20000
    d_in = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    wo, pdf = prb._sample_phase(jax.random.PRNGKey(0), d_in, cfg)
    cos_t = np.asarray(jnp.sum(d_in * wo, axis=-1))
    # E[cos theta] = g for Henyey-Greenstein (forward scattering)
    assert abs(cos_t.mean() - 0.6) < 0.02
    # the sampler's reported pdf must agree with eval_phase_pdf at the same
    # directions (this is the MIS consistency requirement; it caught a
    # forward/backward cosine convention bug)
    pdf_eval = np.asarray(prb.eval_phase_pdf(-d_in, wo, cfg))
    np.testing.assert_allclose(np.asarray(pdf), pdf_eval, rtol=1e-4)
    # forward-scattering: pdf at forward-sampled dirs should mostly exceed
    # the isotropic density
    assert np.median(pdf_eval) > 1.0 / (4.0 * np.pi)


def test_hg_furnace():
    """Energy conservation holds for anisotropic phase too."""
    f = scene.EllipsoidsFactory()
    f.add(mean=[0, 0, 0], scale=0.5, sigma_t=3.0, albedo=1.0)
    s = f.build()
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    n = 2048
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -5.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    cfg = PRBConfig(
        max_overlaps=4, max_windows=2, chunk_size=8, bounce_cap=48,
        phase="hg", phase_g=0.5,
    )
    out = np.asarray(radiance(s, em, o, d, cfg, jax.random.PRNGKey(3)))
    assert abs(out[:, 0].mean() - 1.0) < 0.04


def test_compaction_statistically_equivalent():
    """Active-ray compaction (sorted chunks + skipped dead chunks) changes
    only the RNG partitioning: estimates agree to MC noise and runs are
    deterministic."""
    s = chain_scene(12, sigma_t=0.8, albedo=0.7)
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    n = 4096
    rng = np.random.default_rng(0)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -3.0]]), (n, 1))
    dd = rng.normal(size=(n, 3)) * 0.2 + [0, 0, 1.0]
    d = jnp.asarray(
        (dd / np.linalg.norm(dd, axis=-1, keepdims=True)).astype(np.float32)
    )
    base = dict(max_overlaps=8, max_windows=4, bounce_cap=16, chunk_size=32,
                use_clusters=False)
    a = np.asarray(radiance(
        s, em, o, d, PRBConfig(compact_chunk=0, **base), jax.random.PRNGKey(5)
    ))
    b = np.asarray(radiance(
        s, em, o, d, PRBConfig(compact_chunk=512, **base),
        jax.random.PRNGKey(5),
    ))
    b2 = np.asarray(radiance(
        s, em, o, d, PRBConfig(compact_chunk=512, **base),
        jax.random.PRNGKey(5),
    ))
    np.testing.assert_array_equal(b, b2)  # deterministic
    assert np.isfinite(b).all()
    assert abs(a.mean() - b.mean()) < 0.01, (a.mean(), b.mean())


def test_recollection_rounds_resolve_long_chain():
    """Re-collection rounds (round 4): a ray crossing far more intervals
    than collect_budget must RESUME past the collection bound instead of
    budget-dying (the round-3 one-shot collection killed 100% of rays on
    the bench's overlapped stress scene), and must agree with the exact
    jump-path escape decision on rays neither path kills. A chain keeps
    the SIMULTANEOUS overlap (~5) below max_overlaps while the total
    interval count (~240) needs ~10 collection rounds at budget 24 —
    capacity rules match the reference's overlap stack: simultaneous
    overlap must fit the window; total length no longer needs to fit the
    collection budget."""
    s = chain_scene(240, sigma_t=0.003, albedo=0.0)
    n = 512
    rng = np.random.default_rng(7)
    off = rng.uniform(-0.2, 0.2, (n, 2)).astype(np.float32)
    o = jnp.asarray(
        np.concatenate([off, np.full((n, 1), -3.0, np.float32)], axis=-1)
    )
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    xi = jax.random.uniform(jax.random.PRNGKey(1), (n,), minval=1e-7)
    act = jnp.ones((n,), bool)

    tight = PRBConfig(
        max_overlaps=8, max_windows=4, collect_budget=24,
        collect_rounds=24, chunk_size=128, jump=False,
    )
    exact = PRBConfig(max_overlaps=8, max_windows=16, chunk_size=128)
    f_t, dead_t, t_t, _, _, _ = free_flight(s, o, d, xi, tight, act)
    f_e, dead_e, t_e, _, _, _ = free_flight(s, o, d, xi, exact, act)
    f_t, dead_t, f_e, dead_e = (
        np.asarray(f_t), np.asarray(dead_t), np.asarray(f_e),
        np.asarray(dead_e),
    )
    # the rounds must rescue the wavefront from the tiny per-round budget
    assert dead_t.mean() < 0.02, dead_t.mean()
    # the config must actually produce both outcomes for the test to mean
    # anything
    assert 0.05 < f_e.mean() < 0.95, f_e.mean()
    live = ~dead_t & ~dead_e
    agree = (f_t == f_e)[live].mean()
    assert agree > 0.98, agree
    both = f_t & f_e
    assert both.any()
    t_t, t_e = np.asarray(t_t), np.asarray(t_e)
    rel = np.abs(t_t[both] - t_e[both]) / np.maximum(t_e[both], 1e-6)
    assert rel.max() < 5e-3, rel.max()


def test_recollection_rounds_cluster_path():
    """The cluster-index collection must also resume across rounds (its
    per-round reach is bounded by both the interval budget and the
    cluster-candidate pool)."""
    s = chain_scene(240, sigma_t=0.003, albedo=0.0)
    n = 256
    rng = np.random.default_rng(11)
    off = rng.uniform(-0.2, 0.2, (n, 2)).astype(np.float32)
    o = jnp.asarray(
        np.concatenate([off, np.full((n, 1), -3.0, np.float32)], axis=-1)
    )
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    xi = jax.random.uniform(jax.random.PRNGKey(2), (n,), minval=1e-7)
    act = jnp.ones((n,), bool)

    cl = PRBConfig(
        max_overlaps=8, max_windows=4, collect_budget=24,
        collect_rounds=24, use_clusters=True, cluster_size=32,
        chunk_size=128,
    )
    exact = PRBConfig(max_overlaps=8, max_windows=16, chunk_size=128)
    index = prb.build_ff_index(s, cl)
    f_c, dead_c, t_c, _, _, _ = free_flight(s, o, d, xi, cl, act, index=index)
    f_e, dead_e, t_e, _, _, _ = free_flight(s, o, d, xi, exact, act)
    f_c, dead_c, f_e, dead_e = (
        np.asarray(f_c), np.asarray(dead_c), np.asarray(f_e),
        np.asarray(dead_e),
    )
    assert dead_c.mean() < 0.02, dead_c.mean()
    live = ~dead_c & ~dead_e
    agree = (f_c == f_e)[live].mean()
    assert agree > 0.98, agree
