"""Tomography integrator: analytic checks, semantics, gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from volprim_tpu import models, scene
from volprim_tpu.models.tomography import TomographyConfig, radiance
from volprim_tpu.ops import envmap, kernels, quadric


def single_gaussian_scene(sigma_t=2.0, scale=0.5):
    f = scene.EllipsoidsFactory()
    f.add(mean=[0.0, 0.0, 0.0], scale=scale, sigma_t=sigma_t, albedo=0.9)
    return f.build()


def test_single_gaussian_transmittance():
    s = single_gaussian_scene()
    em = envmap.ConstantEmitter(radiance=jnp.asarray([1.0, 1.0, 1.0]))
    o = jnp.asarray([[0.0, 0.0, -5.0], [0.0, 3.0, -5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    cfg = TomographyConfig(max_depth=-1, chunk_size=8)
    out = np.asarray(radiance(s, em, o, d, cfg))
    # ray 0 through the center: tau = sigma_t * full line integral
    coeffs = quadric.ray_prim_coeffs(o, d, s.centers, s.scales, s.quats)
    full = kernels.gaussian_integral_full(
        coeffs, s.scale_prod()[None, :], jnp.ones_like(coeffs.a, bool)
    )
    expected0 = np.exp(-2.0 * float(full[0, 0]))
    np.testing.assert_allclose(out[0], expected0, rtol=1e-5)
    # ray 1 misses the 3-sigma extent entirely: pure env
    np.testing.assert_allclose(out[1], 1.0, rtol=1e-6)


def test_max_depth_blackout():
    # three gaussians along the ray; max_depth=2 -> ray goes black
    f = scene.EllipsoidsFactory()
    for z in (-1.0, 0.0, 1.0):
        f.add(mean=[0.0, 0.0, z], scale=0.1, sigma_t=1.0, albedo=0.5)
    s = f.build()
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    o = jnp.asarray([[0.0, 0.0, -5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    out2 = np.asarray(radiance(s, em, o, d, TomographyConfig(max_depth=2, chunk_size=8)))
    out3 = np.asarray(radiance(s, em, o, d, TomographyConfig(max_depth=3, chunk_size=8)))
    assert np.all(out2 == 0.0)
    assert np.all(out3 > 0.0)


def test_ray_inside_primitive_skips_it():
    # BVH backface-culling semantics: origin inside the extent ellipsoid
    s = single_gaussian_scene()
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    o = jnp.asarray([[0.0, 0.0, 0.0]])  # at the gaussian center
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    out = np.asarray(radiance(s, em, o, d, TomographyConfig(chunk_size=8)))
    np.testing.assert_allclose(out, 1.0, rtol=1e-6)


def test_gradient_matches_finite_differences():
    s = single_gaussian_scene(sigma_t=1.5)
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    o = jnp.asarray([[0.2, -0.1, -5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    cfg = TomographyConfig(max_depth=-1, chunk_size=8)

    def loss(sig):
        s2 = scene.EllipsoidScene(
            s.centers, s.scales, s.quats,
            {**s.attrs, "sigma_t": sig}, s.extent,
        )
        return jnp.sum(radiance(s2, em, o, d, cfg))

    sig0 = s.attrs["sigma_t"]
    g = jax.grad(loss)(sig0)
    eps = 1e-3
    fd = (loss(sig0 + eps) - loss(sig0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 0]), float(fd), rtol=1e-3)


def test_gradient_wrt_centers():
    s = single_gaussian_scene(sigma_t=1.5)
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    o = jnp.asarray([[0.3, 0.0, -5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    cfg = TomographyConfig(max_depth=-1, chunk_size=8)

    def loss(centers):
        s2 = scene.EllipsoidScene(centers, s.scales, s.quats, s.attrs, s.extent)
        return jnp.sum(radiance(s2, em, o, d, cfg))

    g = jax.grad(loss)(s.centers)
    eps = 1e-3
    for axis in range(3):
        delta = jnp.zeros_like(s.centers).at[0, axis].add(eps)
        fd = (loss(s.centers + delta) - loss(s.centers - delta)) / (2 * eps)
        np.testing.assert_allclose(
            float(g[0, axis]), float(fd), rtol=5e-2, atol=1e-5
        )


def test_render_smoke_image():
    s = scene.load_ply("/root/reference/resources/smoke.ply")
    # boost sigma_t like render_volume.py:66 does
    s.attrs["sigma_t"] = s.attrs["sigma_t"] * 200.0
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    cam = scene.CameraSpecs(
        name="c", width=48, height=48,
        to_world=scene.look_at([-4.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0, 1, 0]),
        fov=40.0,
    )
    img = models.render(
        s, cam, radiance, TomographyConfig(max_depth=-1), em, spp=2, seed=0
    )
    img = np.asarray(img)
    assert img.shape == (48, 48, 3)
    assert np.all(np.isfinite(img))
    assert img.min() >= 0.0 and img.max() <= 1.0 + 1e-5
    # the plume must absorb something
    assert img.min() < 0.9


def test_gridvol_scattering_furnace():
    """Uniform grid, albedo 1, constant env: radiance == env (furnace)."""
    from volprim_tpu.models import gridvol
    from volprim_tpu.scene.vol import GridVolume

    grid = GridVolume(
        data=jnp.ones((8, 8, 8, 1)) * 0.8,
        bbox_min=jnp.asarray([-1.0, -1.0, -1.0]),
        bbox_max=jnp.asarray([1.0, 1.0, 1.0]),
    )
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    cfg = gridvol.GridVolumeConfig(
        sigma_scale=3.0, albedo=1.0, bounce_cap=64, tracking_steps=64,
        shadow_steps=64,
    )
    n = 4096
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -3.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    out = np.asarray(gridvol.radiance_scattering(
        grid, em, o, d, cfg, jax.random.PRNGKey(0)
    ))
    assert np.isfinite(out).all()
    assert abs(out[:, 0].mean() - 1.0) < 0.03, out[:, 0].mean()


def test_gridvol_scattering_absorbing_limit():
    """albedo=0 reduces to the absorption marcher (transmittance x env)."""
    from volprim_tpu.models import gridvol
    from volprim_tpu.scene.vol import GridVolume

    rng = np.random.default_rng(0)
    data = jnp.asarray(
        rng.uniform(0.1, 0.9, size=(6, 6, 6, 1)).astype(np.float32)
    )
    grid = GridVolume(
        data=data,
        bbox_min=jnp.asarray([-1.0, -1.0, -1.0]),
        bbox_max=jnp.asarray([1.0, 1.0, 1.0]),
    )
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    cfg = gridvol.GridVolumeConfig(
        sigma_scale=2.0, albedo=0.0, bounce_cap=8, tracking_steps=96,
        num_steps=256,
    )
    n = 8192
    rng2 = np.random.default_rng(1)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -3.0]]), (n, 1))
    dd = rng2.normal(size=(n, 3)) * 0.1 + [0, 0, 1.0]
    d = jnp.asarray(
        (dd / np.linalg.norm(dd, axis=-1, keepdims=True)).astype(np.float32)
    )
    mc = np.asarray(gridvol.radiance_scattering(
        grid, em, o, d, cfg, jax.random.PRNGKey(1)
    ))
    ref = np.asarray(gridvol.radiance(grid, em, o, d, cfg))
    # delta tracking is unbiased: means agree to MC noise
    assert abs(mc[:, 0].mean() - ref[:, 0].mean()) < 0.015
