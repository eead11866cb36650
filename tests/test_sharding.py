"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 layer 4: the TPU answer to multi-node testing)."""

import jax
import jax.numpy as jnp
import numpy as np

from volprim_tpu import models, parallel, scene
from volprim_tpu.models import tomography
from volprim_tpu.ops import envmap


def make_scene():
    f = scene.EllipsoidsFactory()
    rng = np.random.default_rng(0)
    for _ in range(20):
        f.add(
            mean=rng.normal(size=3) * 0.5,
            scale=rng.uniform(0.05, 0.2, size=3),
            sigma_t=rng.uniform(0.5, 2.0),
            albedo=0.9,
        )
    return f.build()


def test_eight_devices():
    assert jax.device_count() == 8


def test_sharded_render_matches_single():
    s = make_scene()
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    cam = scene.CameraSpecs(
        name="c", width=32, height=16,  # 512 rays = 64/device
        to_world=scene.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]), fov=45.0,
    )
    cfg = tomography.TomographyConfig(chunk_size=32)
    mesh = parallel.data_mesh()

    img_single = jax.jit(
        lambda p: models.render(p, cam, tomography.radiance, cfg, em, spp=2)
    )(s)
    img_sharded = jax.jit(
        lambda p: models.render(
            p, cam, tomography.radiance, cfg, em, spp=2, mesh=mesh
        )
    )(s)
    np.testing.assert_allclose(
        np.asarray(img_single), np.asarray(img_sharded), rtol=1e-4, atol=1e-5
    )


def test_sharded_gradient_matches_single():
    s = make_scene()
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    cam = scene.CameraSpecs(
        name="c", width=32, height=16,
        to_world=scene.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]), fov=45.0,
    )
    cfg = tomography.TomographyConfig(chunk_size=32)
    mesh = parallel.data_mesh()
    target = jnp.zeros((16, 32, 3))

    def loss(sig, mesh_arg):
        s2 = scene.EllipsoidScene(
            s.centers, s.scales, s.quats,
            {**s.attrs, "sigma_t": sig}, s.extent,
        )
        img = models.render(
            s2, cam, tomography.radiance, cfg, em, spp=1, mesh=mesh_arg
        )
        return jnp.mean((img - target) ** 2)

    g1 = jax.jit(jax.grad(lambda p: loss(p, None)))(s.attrs["sigma_t"])
    g2 = jax.jit(jax.grad(lambda p: loss(p, mesh)))(s.attrs["sigma_t"])
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-7)
