"""Tiled rf fast path vs the exact-order integrator."""

import jax
import jax.numpy as jnp
import numpy as np

from volprim_tpu import models, scene
from volprim_tpu.models import rf, rf_tiled


def surface_scene(n=400, seed=0):
    """3DGS-like shell of small anisotropic primitives on a sphere."""
    rng = np.random.default_rng(seed)
    f = scene.EllipsoidsFactory()
    for _ in range(n):
        p = rng.normal(size=3)
        p /= np.linalg.norm(p)
        f.add(
            mean=p * rng.uniform(0.9, 1.1),
            scale=rng.uniform(0.02, 0.08, size=3),
            euler_deg=rng.uniform(-90, 90, size=3),
            opacities=rng.uniform(0.3, 0.95),
            sh_coeffs=rng.normal(size=3).astype(np.float32) * 0.4,
        )
    return f.build()


def test_tiled_matches_exact():
    s = surface_scene()
    cam = scene.CameraSpecs(
        name="c", width=64, height=64,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    cfg_exact = rf.RFConfig(max_depth=64, srgb_primitives=False, chunk_size=512)
    cfg_tiled = rf_tiled.RFTiledConfig(
        max_depth=64, srgb_primitives=False,
        tile_pixels=256, max_candidates=256, segment=64, tile_group=4,
        use_clusters=False,  # flat culling: 400 prims -> clusters too coarse
    )
    # jitter off in both paths so only the ordering approximation differs
    o, d = scene.generate_rays(cam, jitter=False)
    img_exact = np.asarray(
        rf.radiance(s, None, o, d, cfg_exact, jax.random.PRNGKey(0))
    ).reshape(64, 64, 3)
    img_tiled = np.asarray(
        rf_tiled.render(s, cam, cfg_tiled, None, spp=1, seed=0, jitter=False)
    )
    assert np.isfinite(img_tiled).all()
    # shared-depth-order approximation: compare via PSNR (the quality bar
    # 3DGS rasterizers meet vs ray tracers)
    mse = np.mean((img_exact - img_tiled) ** 2)
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 35.0, f"tiled vs exact PSNR {psnr:.2f} dB"


def test_cluster_path_matches_exact():
    s = surface_scene(6400, seed=3)
    cam = scene.CameraSpecs(
        name="c", width=64, height=64,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    cfg_exact = rf.RFConfig(max_depth=64, srgb_primitives=False, chunk_size=1024)
    cfg_tiled = rf_tiled.RFTiledConfig(
        max_depth=64, srgb_primitives=False,
        tile_pixels=256, max_candidates=2048, segment=128, tile_group=4,
        use_clusters=True, cluster_size=32,
    )
    o, d = scene.generate_rays(cam, jitter=False)
    img_exact = np.asarray(
        rf.radiance(s, None, o, d, cfg_exact, jax.random.PRNGKey(0))
    ).reshape(64, 64, 3)
    img_tiled = np.asarray(
        rf_tiled.render(s, cam, cfg_tiled, None, spp=1, seed=0, jitter=False)
    )
    mse = np.mean((img_exact - img_tiled) ** 2)
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 30.0, f"cluster-tiled vs exact PSNR {psnr:.2f} dB"


import pytest


@pytest.mark.parametrize("backend", ["pallas", "pallas2"])
def test_pallas_backend_matches_xla(backend):
    s = surface_scene(6400, seed=3)
    cam = scene.CameraSpecs(
        name="c", width=32, height=32,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    kw = dict(
        max_depth=64, srgb_primitives=False,
        tile_pixels=256, max_candidates=512, segment=128, tile_group=2,
        use_clusters=True, cluster_size=32,
    )
    img_xla = np.asarray(
        rf_tiled.render(
            s, cam, rf_tiled.RFTiledConfig(**kw), None, spp=1, seed=0,
            jitter=False,
        )
    )
    img_pl = np.asarray(
        rf_tiled.render(
            s, cam, rf_tiled.RFTiledConfig(backend=backend, **kw), None,
            spp=1, seed=0, jitter=False,
        )
    )
    assert np.isfinite(img_pl).all()
    np.testing.assert_allclose(img_pl, img_xla, rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("backend", ["pallas", "pallas2"])
def test_pallas_gradients_match_xla(backend):
    """Custom-VJP backward kernel vs XLA autodiff on the same pipeline."""
    s = surface_scene(800, seed=5)
    cam = scene.CameraSpecs(
        name="c", width=32, height=32,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    kw = dict(
        max_depth=48, srgb_primitives=False,
        tile_pixels=256, max_candidates=256, segment=64, tile_group=2,
        use_clusters=True, cluster_size=32,
    )
    target = jnp.zeros((32, 32, 3))

    def loss(params, bk):
        s2 = scene.EllipsoidScene(
            params["centers"], s.scales, s.quats,
            {**s.attrs, "opacities": params["opacities"],
             "sh_coeffs": params["sh_coeffs"]},
            s.extent,
        )
        cfg = rf_tiled.RFTiledConfig(backend=bk, **kw)
        img = rf_tiled.render(s2, cam, cfg, None, spp=1, seed=0, jitter=False)
        return jnp.mean((img - target) ** 2)

    params = {
        "centers": s.centers,
        "opacities": s.attrs["opacities"],
        "sh_coeffs": s.attrs["sh_coeffs"],
    }
    g_xla = jax.grad(lambda p: loss(p, "xla"))(params)
    g_pl = jax.grad(lambda p: loss(p, backend))(params)
    # pallas2 reparameterizes the quadric (camera-relative c0), so f32
    # rounding at clamp boundaries shifts a handful of elements by ~0.5%.
    atol = 2e-3 if backend == "pallas" else 8e-3
    for k in params:
        a, b = np.asarray(g_xla[k]), np.asarray(g_pl[k])
        assert np.isfinite(b).all(), k
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(
            b / scale, a / scale, atol=atol,
            err_msg=f"gradient mismatch for {k}",
        )


def test_tiled_gradients_flow():
    s = surface_scene(100)
    cam = scene.CameraSpecs(
        name="c", width=32, height=32,
        to_world=scene.look_at([0, 0, -3.5], [0, 0, 0], [0, 1, 0]), fov=45.0,
    )
    cfg = rf_tiled.RFTiledConfig(
        max_depth=32, srgb_primitives=False,
        tile_pixels=256, max_candidates=128, segment=64, tile_group=2,
        use_clusters=False,
    )

    def loss(opac):
        s2 = scene.EllipsoidScene(
            s.centers, s.scales, s.quats,
            {**s.attrs, "opacities": opac}, s.extent,
        )
        return jnp.mean(rf_tiled.render(s2, cam, cfg, None, spp=1, seed=0))

    g = jax.grad(loss)(s.attrs["opacities"])
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert (np.abs(g) > 0).sum() > 10  # gradients reach many primitives


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_small_scene_segment_padding(backend):
    """Scenes smaller than cfg.segment must render on every backend (the
    shortlist is padded to a segment multiple instead of tripping the
    Pallas kernel's divisibility assert)."""
    s = surface_scene(100, seed=7)
    cam = scene.CameraSpecs(
        name="c", width=32, height=32,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    cfg = rf_tiled.RFTiledConfig(
        max_depth=32, srgb_primitives=False,
        tile_pixels=256, max_candidates=4096, segment=256, tile_group=2,
        use_clusters=True, cluster_size=32, backend=backend,
    )
    img = np.asarray(rf_tiled.render(s, cam, cfg, None, spp=1, jitter=False))
    assert np.isfinite(img).all()
    assert img.max() > 0


def test_fused_backend_matches_xla_order():
    """v3 fused kernel vs the XLA compositor on the identical cluster-order
    shortlist (prim_resort=False): only the q formulation differs
    (closest-approach p^T M p vs c - b^2/a), so images must agree to float
    noise; early_exit must not change the image at all."""
    s = surface_scene(6400, seed=3)
    cam = scene.CameraSpecs(
        name="c", width=32, height=32,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    kw = dict(
        max_depth=64, srgb_primitives=False,
        tile_pixels=256, max_candidates=512, segment=128, tile_group=2,
        use_clusters=True, cluster_size=32,
    )
    img_xla = np.asarray(
        rf_tiled.render(
            s, cam, rf_tiled.RFTiledConfig(prim_resort=False, **kw),
            None, spp=1, seed=0, jitter=False,
        )
    )
    img_f = np.asarray(
        rf_tiled.render(
            s, cam, rf_tiled.RFTiledConfig(backend="fused", **kw),
            None, spp=1, seed=0, jitter=False,
        )
    )
    img_fe = np.asarray(
        rf_tiled.render(
            s, cam,
            rf_tiled.RFTiledConfig(backend="fused", early_exit=True, **kw),
            None, spp=1, seed=0, jitter=False,
        )
    )
    assert np.isfinite(img_f).all()
    np.testing.assert_allclose(img_f, img_xla, rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(img_fe, img_f, rtol=1e-5, atol=1e-6)


def test_two_level_cull_matches_single_level():
    """Strip-coarse + per-tile refinement must reproduce the single-level
    shortlist when the coarse stage over-collects (coarse_factor x)."""
    s = surface_scene(6400, seed=3)
    cam = scene.CameraSpecs(
        name="c", width=64, height=64,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    kw = dict(
        max_depth=64, srgb_primitives=False, tile_pixels=256,
        max_candidates=1024, segment=128, use_clusters=True, cluster_size=16,
        backend="fused",
    )
    a = np.asarray(rf_tiled.render(
        s, cam, rf_tiled.RFTiledConfig(**kw), None, spp=1, seed=0,
        jitter=False,
    ))
    b = np.asarray(rf_tiled.render(
        s, cam, rf_tiled.RFTiledConfig(coarse_group=4, coarse_factor=4, **kw),
        None, spp=1, seed=0, jitter=False,
    ))
    mse = np.mean((a - b) ** 2)
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 45.0, psnr


def test_refinement_recovers_truncated_tiles():
    """refine_fraction=1.0 with factor f must equal a base pass with an
    f-times-larger shortlist (exact mechanics), and partial refinement must
    not regress the base."""
    s = surface_scene(6400, seed=3)
    cam = scene.CameraSpecs(
        name="c", width=64, height=64,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    kw = dict(
        max_depth=64, srgb_primitives=False, tile_pixels=256,
        segment=128, use_clusters=True, cluster_size=16, backend="fused",
    )
    full = np.asarray(rf_tiled.render(
        s, cam,
        rf_tiled.RFTiledConfig(
            max_candidates=512, refine_fraction=1.0, refine_factor=4, **kw
        ),
        None, spp=1, seed=0, jitter=False,
    ))
    big = np.asarray(rf_tiled.render(
        s, cam, rf_tiled.RFTiledConfig(max_candidates=2048, **kw),
        None, spp=1, seed=0, jitter=False,
    ))
    np.testing.assert_allclose(full, big, rtol=1e-5, atol=1e-6)


def test_fused_gradients_match_xla():
    """composite3's custom-VJP backward (closest-approach q adjoints,
    transposed layout) vs XLA autodiff on the same cluster-order pipeline."""
    s = surface_scene(800, seed=5)
    cam = scene.CameraSpecs(
        name="c", width=32, height=32,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    kw = dict(
        max_depth=48, srgb_primitives=False,
        tile_pixels=256, max_candidates=256, segment=64, tile_group=2,
        use_clusters=True, cluster_size=32,
    )
    target = jnp.zeros((32, 32, 3))

    def loss(params, bk):
        s2 = scene.EllipsoidScene(
            params["centers"], s.scales, s.quats,
            {**s.attrs, "opacities": params["opacities"],
             "sh_coeffs": params["sh_coeffs"]},
            s.extent,
        )
        cfg = rf_tiled.RFTiledConfig(
            backend=bk, prim_resort=False, **kw
        )
        img = rf_tiled.render(s2, cam, cfg, None, spp=1, seed=0, jitter=False)
        return jnp.mean((img - target) ** 2)

    params = {
        "centers": s.centers,
        "opacities": s.attrs["opacities"],
        "sh_coeffs": s.attrs["sh_coeffs"],
    }
    g_xla = jax.grad(lambda p: loss(p, "xla"))(params)
    g_f = jax.grad(lambda p: loss(p, "fused"))(params)
    # the closest-approach q evaluates hit/clamp masks with different f32
    # rounding than the xla path's c - b^2/a, so a handful of elements sit
    # on flipped boundary masks (same class as the pallas2 tolerance)
    for k in params:
        a, b = np.asarray(g_xla[k]), np.asarray(g_f[k])
        assert np.isfinite(b).all(), k
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(
            b / scale, a / scale, atol=8e-3,
            err_msg=f"gradient mismatch for {k}",
        )


def test_kernel_batch_bitwise_and_small_tiles():
    """Subtile batching (kernel_batch>1) is a pure scheduling change: the
    fused render at 8x8-pixel tiles must be bitwise identical for
    kernel_batch 1 vs 4, and small tiles must track the exact-order image
    at least as well as the 16x16 baseline (tighter shared-order axis)."""
    s = surface_scene(6400, seed=3)
    cam = scene.CameraSpecs(
        name="c", width=64, height=64,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    kw = dict(
        max_depth=64, srgb_primitives=False,
        tile_pixels=64, max_candidates=512, segment=128,
        use_clusters=True, cluster_size=16, backend="fused",
    )
    img1 = np.asarray(
        rf_tiled.render(
            s, cam, rf_tiled.RFTiledConfig(kernel_batch=1, **kw),
            None, spp=1, seed=0, jitter=False,
        )
    )
    img4 = np.asarray(
        rf_tiled.render(
            s, cam, rf_tiled.RFTiledConfig(kernel_batch=4, **kw),
            None, spp=1, seed=0, jitter=False,
        )
    )
    assert np.isfinite(img4).all()
    np.testing.assert_array_equal(img1, img4)

    # gradients are also scheduling-invariant
    def loss(prims, kb):
        cfg = rf_tiled.RFTiledConfig(kernel_batch=kb, **kw)
        img = rf_tiled.render(prims, cam, cfg, None, spp=1, seed=0,
                              jitter=False)
        return jnp.mean(img**2)

    g1 = jax.grad(lambda p: loss(p, 1))(s)
    g4 = jax.grad(lambda p: loss(p, 4))(s)
    np.testing.assert_array_equal(
        np.asarray(g1.centers), np.asarray(g4.centers)
    )
    np.testing.assert_array_equal(
        np.asarray(g1.attrs["opacities"]), np.asarray(g4.attrs["opacities"])
    )


def test_strip_candidate_refinement_matches_full_recull():
    """With two-level culling, the refine pass re-culls against the strip's
    candidate list; when that list covers the refined budget it must match
    a base pass with the refined shortlist size (up to clusters outside
    the smaller base pass's strip list — a handful of far-tail pixels)."""
    s = surface_scene(6400, seed=3)
    cam = scene.CameraSpecs(
        name="c", width=64, height=64,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    kw = dict(
        max_depth=64, srgb_primitives=False, tile_pixels=256,
        segment=128, use_clusters=True, cluster_size=16, backend="fused",
        coarse_group=4, coarse_factor=8, super_group=4,
    )
    refined = np.asarray(rf_tiled.render(
        s, cam,
        rf_tiled.RFTiledConfig(
            max_candidates=512, refine_fraction=1.0, refine_factor=2, **kw
        ),
        None, spp=1, seed=0, jitter=False,
    ))
    big = np.asarray(rf_tiled.render(
        s, cam, rf_tiled.RFTiledConfig(max_candidates=1024, **kw),
        None, spp=1, seed=0, jitter=False,
    ))
    mse = np.mean((refined - big) ** 2)
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 55.0, psnr


def test_block_major_tile_order_small_tiles():
    """coarse_group strips are 2D tile blocks: the film reconstruction must
    be loss-free for every (tile, group) shape (cg=16 at 8x8 tiles makes
    4x4 blocks; compare against single-level culling at full budget)."""
    s = surface_scene(3200, seed=7)
    cam = scene.CameraSpecs(
        name="c", width=64, height=64,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    kw = dict(
        max_depth=64, srgb_primitives=False, tile_pixels=64,
        max_candidates=3200 // 16 * 16, segment=64, use_clusters=True,
        cluster_size=16, backend="fused", kernel_batch=4,
    )
    a = np.asarray(rf_tiled.render(
        s, cam, rf_tiled.RFTiledConfig(**kw), None, spp=1, seed=0,
        jitter=False,
    ))
    b = np.asarray(rf_tiled.render(
        s, cam,
        rf_tiled.RFTiledConfig(
            coarse_group=16, coarse_factor=8, super_group=4, **kw
        ),
        None, spp=1, seed=0, jitter=False,
    ))
    mse = np.mean((a - b) ** 2)
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 45.0, psnr


def test_negative_radius_never_culled_in():
    """r < 0 marks padding/neutral sphere slots (suprows convention): they
    must never get a finite cull key, even when the cone contains their
    center (advisor round-2 medium finding: neutral rows at (0,0,0) entered
    shortlists of cones containing the world origin)."""
    from volprim_tpu.accel import tiles as tiling

    origin = jnp.asarray([0.0, 0.0, -3.0])
    axis = jnp.asarray([[0.0, 0.0, 1.0]])  # looks straight at the origin
    cos_half = jnp.asarray([0.95])
    cx = jnp.asarray([[0.0, 0.0]])
    cy = jnp.asarray([[0.0, 0.0]])
    cz = jnp.asarray([[0.0, 0.5]])
    radii = jnp.asarray([[-1.0, 0.2]])  # slot 0 = padding, slot 1 = real
    keys = tiling.cone_cull_keys_cols(
        origin, axis, cos_half, cx, cy, cz, radii
    )
    assert not np.isfinite(np.asarray(keys)[0, 0])
    assert np.isfinite(np.asarray(keys)[0, 1])
    keys_b = tiling.cone_cull_keys_batch(
        origin, axis, cos_half,
        jnp.stack([jnp.zeros(3), jnp.asarray([0.0, 0.0, 0.5])]),
        jnp.asarray([-1.0, 0.2]),
    )
    assert not np.isfinite(np.asarray(keys_b)[0, 0])
    assert np.isfinite(np.asarray(keys_b)[0, 1])


def test_tile_shape_override_odd_film():
    """Films whose dimensions defeat the greedy tile factorization render
    with an explicit cfg.tile_shape (advisor round-2 finding)."""
    s = surface_scene(200)
    cam = scene.CameraSpecs(
        name="c", width=50, height=44,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    cfg = rf_tiled.RFTiledConfig(
        max_depth=64, srgb_primitives=False,
        tile_pixels=40, tile_shape=(4, 10), max_candidates=128, segment=64,
        tile_group=4, use_clusters=False,
    )
    img = rf_tiled.render(s, cam, cfg, None, spp=1, seed=0, jitter=False)
    assert img.shape == (44, 50, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_budget_classes_match_fixed_budget():
    """Adaptive per-tile budget classes: with class budgets that cover
    every tile's need, the render equals the fixed-big-budget render (same
    shortlist contents and depth order; only the segment grouping of the
    log-space sums differs)."""
    s = surface_scene(6400, seed=3)
    cam = scene.CameraSpecs(
        name="c", width=64, height=64,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    base = dict(
        max_depth=64, srgb_primitives=False, tile_pixels=256,
        segment=64, cluster_size=16, backend="fused", early_exit=False,
        kernel_batch=2,
    )
    cfg_fix = rf_tiled.RFTiledConfig(max_candidates=6400, **base)
    cfg_cls = rf_tiled.RFTiledConfig(
        max_candidates=6400,
        budget_classes=((0.5, 400), (0.5, 400)), **base
    )
    img_fix = np.asarray(
        rf_tiled.render(s, cam, cfg_fix, None, spp=1, seed=0, jitter=False)
    )
    img_cls = np.asarray(
        rf_tiled.render(s, cam, cfg_cls, None, spp=1, seed=0, jitter=False)
    )
    assert np.isfinite(img_cls).all()
    np.testing.assert_allclose(img_cls, img_fix, rtol=1e-4, atol=1e-5)

    # heterogeneous budgets sized to the scene's need distribution (the
    # 16 tiles need 66-71 / 119-132 / 219-233 clusters by quartile): class
    # budgets covering each quartile's need reproduce the full render
    cfg_h = rf_tiled.RFTiledConfig(
        max_candidates=6400,
        budget_classes=((0.25, 80), (0.5, 140), (0.25, 400)), **base
    )
    img_h = np.asarray(
        rf_tiled.render(s, cam, cfg_h, None, spp=1, seed=0, jitter=False)
    )
    # uniform budget at the classed AVERAGE (190): truncates the hard
    # quartile, which the classed render covers
    cfg_u = rf_tiled.RFTiledConfig(max_candidates=190 * 16, **base)
    img_u = np.asarray(
        rf_tiled.render(s, cam, cfg_u, None, spp=1, seed=0, jitter=False)
    )

    def psnr_vs_fix(img):
        mse = np.mean((img - img_fix) ** 2)
        return -10 * np.log10(max(mse, 1e-12))

    # coverage claim: budgets >= per-quartile need reproduce the full
    # render; the cost-comparable uniform budget truncates the hard tiles
    assert psnr_vs_fix(img_h) > 40.0, psnr_vs_fix(img_h)
    assert psnr_vs_fix(img_h) > psnr_vs_fix(img_u) + 3.0, (
        psnr_vs_fix(img_h), psnr_vs_fix(img_u)
    )

    # two-level cull path with classes
    cfg_2l = rf_tiled.RFTiledConfig(
        max_candidates=1024, coarse_group=4, coarse_factor=8, super_group=4,
        budget_classes=((0.25, 80), (0.5, 140), (0.25, 240)), **base
    )
    img_2l = np.asarray(
        rf_tiled.render(s, cam, cfg_2l, None, spp=1, seed=0, jitter=False)
    )
    assert np.isfinite(img_2l).all()
    mse = np.mean((img_2l - img_fix) ** 2)
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 28.0, f"two-level classed PSNR {psnr:.1f} dB"


def test_kernel_compact_matches_uncompacted():
    """In-kernel column compaction is exact: the conservative cone-sphere
    mask only drops columns no ray in the subtile can hit, so the render
    must match the uncompacted walk (up to the one-hot move's single extra
    f32 rounding). Gradients (backward walks the uncompacted stream) must
    also agree."""
    s = surface_scene(6400, seed=3)
    cam = scene.CameraSpecs(
        name="c", width=64, height=64,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    base = dict(
        max_depth=64, srgb_primitives=False, tile_pixels=256,
        max_candidates=2048, segment=128, cluster_size=16, backend="fused",
        early_exit=False, kernel_batch=2,
    )
    cfg0 = rf_tiled.RFTiledConfig(**base)
    cfg1 = rf_tiled.RFTiledConfig(kernel_compact=True, **base)
    img0 = np.asarray(
        rf_tiled.render(s, cam, cfg0, None, spp=1, seed=0, jitter=False)
    )
    img1 = np.asarray(
        rf_tiled.render(s, cam, cfg1, None, spp=1, seed=0, jitter=False)
    )
    assert np.isfinite(img1).all()
    np.testing.assert_allclose(img1, img0, rtol=5e-4, atol=5e-5)

    # gradients through the compacted forward (custom VJP) stay correct
    def loss(opac, cfg):
        import dataclasses as dc

        s2 = dc.replace(s, attrs={**s.attrs, "opacities": opac})
        st = rf_tiled.build_state(s2, cfg)
        return jnp.sum(
            rf_tiled.render_state(st, cam, cfg, None, spp=1, seed=0,
                                  jitter=False) ** 2
        )

    g0 = np.asarray(jax.grad(loss)(s.attrs["opacities"], cfg0))
    g1 = np.asarray(jax.grad(loss)(s.attrs["opacities"], cfg1))
    np.testing.assert_allclose(g1, g0, rtol=1e-3, atol=1e-5)


def test_feat_major_layout_matches_default():
    """feat_major=True feeds the kernel [F, T, S]/[3k, T, S] tables built
    by middle-axis takes (no transpose relayouts). The kernel math is
    identical, the gathered values are identical f32s, so the image must
    be bitwise equal to the tile-major layout — with and without in-kernel
    compaction — and gradients must agree to float noise (the backward
    scatter through the take differs only in reduction order)."""
    s = surface_scene(6400, seed=3)
    cam = scene.CameraSpecs(
        name="c", width=32, height=32,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    kw = dict(
        max_depth=64, srgb_primitives=False,
        tile_pixels=256, max_candidates=512, segment=128,
        use_clusters=True, cluster_size=16, backend="fused",
        coarse_group=4, coarse_factor=4,
    )
    for compact in (False, True):
        imgs = {}
        for fm in (False, True):
            cfg = rf_tiled.RFTiledConfig(
                feat_major=fm, kernel_compact=compact, **kw
            )
            imgs[fm] = np.asarray(
                rf_tiled.render(
                    s, cam, cfg, None, spp=1, seed=0, jitter=False
                )
            )
        assert np.isfinite(imgs[True]).all()
        np.testing.assert_array_equal(
            imgs[True], imgs[False],
            err_msg=f"feat_major image mismatch (compact={compact})",
        )

    # budget classes + feat_major (the bench config shape)
    cfg_cls = rf_tiled.RFTiledConfig(
        feat_major=True, kernel_compact=True,
        budget_classes=((0.5, 16), (0.5, 32)), **kw
    )
    cfg_ref = rf_tiled.RFTiledConfig(
        kernel_compact=True,
        budget_classes=((0.5, 16), (0.5, 32)), **kw
    )
    img_cls = np.asarray(
        rf_tiled.render(s, cam, cfg_cls, None, spp=1, seed=0, jitter=False)
    )
    img_ref = np.asarray(
        rf_tiled.render(s, cam, cfg_ref, None, spp=1, seed=0, jitter=False)
    )
    np.testing.assert_array_equal(img_cls, img_ref)


def test_feat_major_gradients_match():
    s = surface_scene(800, seed=5)
    cam = scene.CameraSpecs(
        name="c", width=32, height=32,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    kw = dict(
        max_depth=48, srgb_primitives=False,
        tile_pixels=256, max_candidates=256, segment=64,
        use_clusters=True, cluster_size=32, backend="fused",
    )
    target = jnp.zeros((32, 32, 3))

    def loss(params, fm):
        s2 = scene.EllipsoidScene(
            params["centers"], s.scales, s.quats,
            {**s.attrs, "opacities": params["opacities"],
             "sh_coeffs": params["sh_coeffs"]},
            s.extent,
        )
        cfg = rf_tiled.RFTiledConfig(feat_major=fm, **kw)
        img = rf_tiled.render(s2, cam, cfg, None, spp=1, seed=0, jitter=False)
        return jnp.mean((img - target) ** 2)

    params = {
        "centers": s.centers,
        "opacities": s.attrs["opacities"],
        "sh_coeffs": s.attrs["sh_coeffs"],
    }
    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_fm = jax.grad(lambda p: loss(p, True))(params)
    for k in params:
        a, b = np.asarray(g_ref[k]), np.asarray(g_fm[k])
        assert np.isfinite(b).all(), k
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(
            b / scale, a / scale, atol=1e-5,
            err_msg=f"feat_major gradient mismatch for {k}",
        )


def test_feat_major_compact_gradients_match():
    """fm backward under in-kernel compaction (the train-step config):
    the compacted backward's phase-1 rebuild + transposed one-hot scatter
    must read/write the [F, T, S] layout correctly."""
    s = surface_scene(800, seed=5)
    cam = scene.CameraSpecs(
        name="c", width=32, height=32,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    kw = dict(
        max_depth=48, srgb_primitives=False,
        tile_pixels=256, max_candidates=256, segment=64,
        use_clusters=True, cluster_size=32, backend="fused",
        kernel_compact=True,
    )
    target = jnp.zeros((32, 32, 3))

    def loss(params, fm):
        s2 = scene.EllipsoidScene(
            params["centers"], s.scales, s.quats,
            {**s.attrs, "opacities": params["opacities"],
             "sh_coeffs": params["sh_coeffs"]},
            s.extent,
        )
        cfg = rf_tiled.RFTiledConfig(feat_major=fm, **kw)
        img = rf_tiled.render(s2, cam, cfg, None, spp=1, seed=0, jitter=False)
        return jnp.mean((img - target) ** 2)

    params = {
        "centers": s.centers,
        "opacities": s.attrs["opacities"],
        "sh_coeffs": s.attrs["sh_coeffs"],
    }
    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_fm = jax.grad(lambda p: loss(p, True))(params)
    for k in params:
        a, b = np.asarray(g_ref[k]), np.asarray(g_fm[k])
        assert np.isfinite(b).all(), k
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(
            b / scale, a / scale, atol=1e-5,
            err_msg=f"feat_major compact gradient mismatch for {k}",
        )


def test_cluster_sort_tracks_exact_better():
    """Pack-time intra-cluster depth sort must (a) stay finite and match
    the unsorted image closely (same primitive set, order changes only
    within cs-blocks), and (b) track the exact-order xla image at least
    as well as the unsorted fused render."""
    s = surface_scene(6400, seed=3)
    cam = scene.CameraSpecs(
        name="c", width=32, height=32,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    kw = dict(
        max_depth=64, srgb_primitives=False,
        tile_pixels=256, max_candidates=512, segment=128,
        use_clusters=True, cluster_size=16, backend="fused",
        feat_major=True, kernel_compact=True,
    )
    # reference: the TRUE exact-order integrator (per-ray entry order) —
    # an xla resort=True render would itself be center-depth-keyed and
    # bias the comparison against the entry-keyed sort
    from volprim_tpu.models import rf as rf_exact
    from volprim_tpu import scene as vscene

    o_r, d_r = vscene.generate_rays(cam, jitter=False)
    ecfg = rf_exact.RFConfig(
        max_depth=64, srgb_primitives=False, chunk_size=1024
    )
    img_exact = np.asarray(
        jax.jit(
            lambda o_, d_: rf_exact.radiance(
                s, None, o_, d_, ecfg, jax.random.PRNGKey(0)
            )
        )(o_r, d_r)
    ).reshape(32, 32, 3)

    def psnr(a, b):
        return -10 * np.log10(np.mean((a - b) ** 2) + 1e-12)

    img0 = np.asarray(
        rf_tiled.render(
            s, cam, rf_tiled.RFTiledConfig(**kw), None,
            spp=1, seed=0, jitter=False,
        )
    )
    img1 = np.asarray(
        rf_tiled.render(
            s, cam, rf_tiled.RFTiledConfig(cluster_sort=True, **kw), None,
            spp=1, seed=0, jitter=False,
        )
    )
    assert np.isfinite(img1).all()
    assert psnr(img1, img0) > 25.0  # same set, intra-block order only
    assert psnr(img1, img_exact) >= psnr(img0, img_exact) - 0.2


def test_traced_max_depth_binds():
    """max_depth enters the fused kernel as a traced SMEM scalar — verify
    the cap actually reaches the walk: a tight cap must match the xla
    backend at the same cap and differ from an uncapped render."""
    s = surface_scene(6400, seed=3)
    cam = scene.CameraSpecs(
        name="c", width=32, height=32,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    kw = dict(
        srgb_primitives=False, tile_pixels=256, max_candidates=512,
        segment=128, use_clusters=True, cluster_size=16,
    )
    def render(backend, md, fm=False):
        extra = dict(feat_major=fm) if backend == "fused" else dict(
            prim_resort=False
        )
        return np.asarray(
            rf_tiled.render(
                s, cam,
                rf_tiled.RFTiledConfig(backend=backend, max_depth=md, **extra, **kw),
                None, spp=1, seed=0, jitter=False,
            )
        )

    f4 = render("fused", 4)
    f_uncapped = render("fused", 100000)
    x4 = render("xla", 4)
    # the cap must bind on this scene ...
    assert np.abs(f_uncapped - f4).max() > 1e-3
    # ... and the fused walk must count hits exactly like the xla scan
    np.testing.assert_allclose(f4, x4, rtol=1e-3, atol=2e-3)
    # feat_major reads the same SMEM scalar
    np.testing.assert_array_equal(render("fused", 4, fm=True), f4)


def test_cluster_resort_probe_order_independent_limit():
    """prim_resort='cluster' (the xla-path ordering probe) only permutes
    ids WITHIN cs-blocks: in the low-opacity limit compositing is
    order-independent, so all three resort modes must agree to first
    order; at full opacity the probe must stay finite and keep the same
    primitive set (identical beta)."""
    s0 = surface_scene(3200, seed=7)
    lo = scene.EllipsoidScene(
        s0.centers, s0.scales, s0.quats,
        {**s0.attrs, "opacities": s0.attrs["opacities"] * 1e-3},
        s0.extent,
    )
    cam = scene.CameraSpecs(
        name="c", width=32, height=32,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    kw = dict(
        max_depth=64, srgb_primitives=False, tile_pixels=256,
        max_candidates=512, segment=128, use_clusters=True,
        cluster_size=16, backend="xla", coarse_group=0,
    )
    imgs = {}
    for rs in (False, "cluster", "cluster-entry", "entry", True):
        imgs[rs] = np.asarray(
            rf_tiled.render(
                lo, cam, rf_tiled.RFTiledConfig(prim_resort=rs, **kw),
                None, spp=1, seed=0, jitter=False,
            )
        )
    # second-order (alpha^2) terms + f32 summation order bound the
    # agreement; first-order magnitudes here are ~1e-3
    for rs in ("cluster-entry", "entry"):
        np.testing.assert_allclose(imgs[rs], imgs[False], rtol=2e-3,
                                   atol=1e-6, err_msg=rs)
    np.testing.assert_allclose(imgs["cluster"], imgs[False], rtol=2e-3,
                               atol=1e-6)
    np.testing.assert_allclose(imgs["cluster"], imgs[True], rtol=2e-3,
                               atol=1e-6)


def test_order_band_full_segment_matches_exact_order():
    """With a single segment and band = segment - 1 every pair is
    corrected, so the banded composite equals the fully per-ray-SORTED
    composite — which is what the exact integrator (models/rf.py,
    entry-t ordered march per volprim_rf.py:124-146) computes. Residual
    difference is f32 summation order + the slightly different
    saturation-kill rule, so compare by (high) PSNR."""
    s = surface_scene(200, seed=11)
    cam = scene.CameraSpecs(
        name="c", width=32, height=32,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    o, d = scene.generate_rays(cam, jitter=False)
    cfg_exact = rf.RFConfig(
        max_depth=256, srgb_primitives=False, chunk_size=256
    )
    img_exact = np.asarray(
        rf.radiance(s, None, o, d, cfg_exact, jax.random.PRNGKey(0))
    ).reshape(32, 32, 3)
    kw = dict(
        max_depth=512, srgb_primitives=False, tile_pixels=256,
        max_candidates=256, segment=256, use_clusters=False,
        backend="xla",
    )
    def psnr_vs_exact(band):
        img = np.asarray(rf_tiled.render(
            s, cam, rf_tiled.RFTiledConfig(order_band=band, **kw), None,
            spp=1, seed=0, jitter=False,
        ))
        assert np.isfinite(img).all()
        mse = np.mean((img - img_exact) ** 2)
        return -10 * np.log10(max(mse, 1e-12))

    p0 = psnr_vs_exact(0)
    p_full = psnr_vs_exact(255)
    assert p_full > 50.0, f"full-band vs exact PSNR {p_full:.2f} dB"
    assert p_full > p0 + 5.0, f"band 255 {p_full:.2f} <= band 0 {p0:.2f}"


def test_order_band_monotone_quality():
    """Growing the band corrects strictly more inversions: PSNR vs exact
    must improve monotonically (by a margin at the first step) on the
    dense cluster scene where the stream order is the binding error."""
    s = surface_scene(6400, seed=3)
    cam = scene.CameraSpecs(
        name="c", width=32, height=32,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    o, d = scene.generate_rays(cam, jitter=False)
    cfg_exact = rf.RFConfig(
        max_depth=512, srgb_primitives=False, chunk_size=1024
    )
    img_exact = np.asarray(
        rf.radiance(s, None, o, d, cfg_exact, jax.random.PRNGKey(0))
    ).reshape(32, 32, 3)
    kw = dict(
        max_depth=512, srgb_primitives=False, tile_pixels=256,
        max_candidates=6400, segment=256, use_clusters=True,
        cluster_size=16, backend="xla", prim_resort=False,
    )
    ps = {}
    for band in (0, 16, 64):
        img = np.asarray(rf_tiled.render(
            s, cam, rf_tiled.RFTiledConfig(order_band=band, **kw), None,
            spp=1, seed=0, jitter=False,
        ))
        mse = np.mean((img - img_exact) ** 2)
        ps[band] = -10 * np.log10(max(mse, 1e-12))
    assert ps[16] > ps[0] + 1.0, ps
    assert ps[64] > ps[16], ps


def test_order_band_fused_matches_xla():
    """The in-kernel banded order correction (log-space, pltpu.roll) must
    match the xla compositor's mul/div form on the identical cluster-order
    stream — including under kernel_compact, where the correction applies
    to the compacted stream. A handful of near-tie pairs may flip between
    the two t_near roundings (closest-approach vs c - b^2/a form), so
    compare by PSNR rather than allclose, and require the quality GAIN
    (vs the exact integrator) that band 16 buys on the xla path."""
    s = surface_scene(6400, seed=3)
    cam = scene.CameraSpecs(
        name="c", width=32, height=32,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    o, d = scene.generate_rays(cam, jitter=False)
    img_exact = np.asarray(
        rf.radiance(
            s, None, o, d,
            rf.RFConfig(max_depth=512, srgb_primitives=False,
                        chunk_size=1024),
            jax.random.PRNGKey(0),
        )
    ).reshape(32, 32, 3)
    kw = dict(
        max_depth=512, srgb_primitives=False,
        tile_pixels=256, max_candidates=2048, segment=256, tile_group=2,
        use_clusters=True, cluster_size=16,
    )

    def psnr(a, b):
        return -10 * np.log10(max(np.mean((a - b) ** 2), 1e-12))

    imgs = {}
    for name, cfg in {
        "xla16": rf_tiled.RFTiledConfig(
            prim_resort=False, order_band=16, backend="xla", **kw),
        "f0": rf_tiled.RFTiledConfig(backend="fused", order_band=0, **kw),
        "f16": rf_tiled.RFTiledConfig(backend="fused", order_band=16, **kw),
        "fc16": rf_tiled.RFTiledConfig(
            backend="fused", order_band=16, kernel_compact=True, **kw),
    }.items():
        imgs[name] = np.asarray(
            rf_tiled.render(s, cam, cfg, None, spp=1, seed=0, jitter=False)
        )
        assert np.isfinite(imgs[name]).all(), name
    # same correction, two roundings: images nearly identical
    assert psnr(imgs["f16"], imgs["xla16"]) > 45.0
    # the correction must buy quality vs exact in-kernel too
    p0, p16 = psnr(imgs["f0"], img_exact), psnr(imgs["f16"], img_exact)
    assert p16 > p0 + 1.0, (p0, p16)
    # compact drops only guaranteed-no-hit columns: band interacts only
    # through segment boundaries of the compacted stream
    assert psnr(imgs["fc16"], img_exact) > p0 + 1.0


def test_order_band_fused_gradients_match_xla():
    """The fused backward's banded adjoint (transposed band operator on
    the weight adjoints) vs plain XLA autodiff through the xla path's
    band correction — the keys' own dependence is zero a.e. in both, so
    the gradients must agree to the usual boundary-mask tolerance."""
    s = surface_scene(800, seed=5)
    cam = scene.CameraSpecs(
        name="c", width=32, height=32,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    kw = dict(
        max_depth=48, srgb_primitives=False,
        tile_pixels=256, max_candidates=256, segment=64, tile_group=2,
        use_clusters=True, cluster_size=32, order_band=8,
    )
    target = jnp.zeros((32, 32, 3))

    def loss(params, bk):
        s2 = scene.EllipsoidScene(
            params["centers"], s.scales, s.quats,
            {**s.attrs, "opacities": params["opacities"],
             "sh_coeffs": params["sh_coeffs"]},
            s.extent,
        )
        cfg = rf_tiled.RFTiledConfig(
            backend=bk, prim_resort=False, **kw
        )
        img = rf_tiled.render(s2, cam, cfg, None, spp=1, seed=0, jitter=False)
        return jnp.mean((img - target) ** 2)

    params = {
        "centers": s.centers,
        "opacities": s.attrs["opacities"],
        "sh_coeffs": s.attrs["sh_coeffs"],
    }
    g_xla = jax.grad(lambda p: loss(p, "xla"))(params)
    g_f = jax.grad(lambda p: loss(p, "fused"))(params)
    for k in params:
        a, b = np.asarray(g_xla[k]), np.asarray(g_f[k])
        assert np.isfinite(b).all(), k
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(
            b / scale, a / scale, atol=8e-3,
            err_msg=f"banded gradient mismatch for {k}",
        )


def test_cluster_sort_decoupled_from_feat_major():
    """round-5 (r4 verdict #10): cluster_sort must work in the default
    cluster-row layout too — same entry-key intra-cluster permute, so the
    fm and non-fm csort renders must agree to layout-rounding tolerance
    (fm is bitwise vs non-fm unsorted; the permute is shared math)."""
    s = surface_scene(6400, seed=3)
    cam = scene.CameraSpecs(
        name="c", width=32, height=32,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    kw = dict(
        max_depth=64, srgb_primitives=False,
        tile_pixels=256, max_candidates=512, segment=128,
        use_clusters=True, cluster_size=16, backend="fused",
        kernel_compact=True, cluster_sort=True,
    )
    img_fm = np.asarray(
        rf_tiled.render(
            s, cam, rf_tiled.RFTiledConfig(feat_major=True, **kw), None,
            spp=1, seed=0, jitter=False,
        )
    )
    img_nofm = np.asarray(
        rf_tiled.render(
            s, cam, rf_tiled.RFTiledConfig(feat_major=False, **kw), None,
            spp=1, seed=0, jitter=False,
        )
    )
    assert np.isfinite(img_nofm).all()
    np.testing.assert_allclose(img_nofm, img_fm, atol=1e-5)


def test_band_classes_per_class():
    """Per-class banding: uniform band_classes must reproduce the global
    order_band render exactly; banding only the deepest-need class must
    (a) stay finite, (b) equal the unbanded render on tiles owned by
    unbanded classes, and (c) move toward the all-banded image."""
    s = surface_scene(6400, seed=3)
    cam = scene.CameraSpecs(
        name="c", width=32, height=32,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    kw = dict(
        max_depth=64, srgb_primitives=False,
        tile_pixels=256, max_candidates=512, segment=128,
        use_clusters=True, cluster_size=16, backend="fused",
        budget_classes=((0.5, 16), (0.5, 32)),
    )

    def render(**extra):
        return np.asarray(
            rf_tiled.render(
                s, cam, rf_tiled.RFTiledConfig(**kw, **extra), None,
                spp=1, seed=0, jitter=False,
            )
        )

    img_b0 = render(order_band=0)
    img_b8 = render(order_band=8)
    img_uniform = render(order_band=0, band_classes=(8, 8))
    np.testing.assert_allclose(img_uniform, img_b8, atol=1e-6)
    img_top = render(order_band=0, band_classes=(0, 8))
    assert np.isfinite(img_top).all()
    # the partially banded image sits between the endpoints: identical to
    # unbanded where classes are unbanded, identical to banded elsewhere
    d_top = np.abs(img_top - img_b0) > 1e-7
    d_all = np.abs(img_b8 - img_b0) > 1e-7
    # banding a subset may only change a subset of the pixels banding
    # everything changes
    assert d_top.sum() <= d_all.sum()
    # inherit-None entries fall back to order_band
    img_inherit = render(order_band=8, band_classes=(None, 8))
    np.testing.assert_allclose(img_inherit, img_b8, atol=1e-6)
