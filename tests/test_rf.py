"""Radiance-field integrator: compositing order, transmittance model, grads."""

import jax
import jax.numpy as jnp
import numpy as np

from volprim_tpu import models, scene
from volprim_tpu.models.rf import RFConfig, gather_hits, radiance
from volprim_tpu.ops import sh


def emissive_scene(entries):
    """entries: list of (center, scale, opacity, rgb). Degree-0 SH."""
    f = scene.EllipsoidsFactory()
    c0 = 0.28209479177387814
    for center, scale, opacity, rgb in entries:
        # invert emission model: E = max(c0 * coeff + 0.5, 0) -> coeff
        coeff = (np.asarray(rgb) - 0.5) / c0
        f.add(mean=center, scale=scale, opacities=opacity, sh_coeffs=coeff)
    return f.build()


def test_gather_hits_ordering():
    s = emissive_scene(
        [
            ([0.0, 0.0, 2.0], 0.1, 0.5, [1, 0, 0]),
            ([0.0, 0.0, -1.0], 0.1, 0.5, [0, 1, 0]),  # behind
            ([0.0, 0.0, 1.0], 0.1, 0.5, [0, 0, 1]),
        ]
    )
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t, ids = gather_hits(s, o, d, k=4, chunk_size=8)
    t, ids = np.asarray(t)[0], np.asarray(ids)[0]
    assert np.isfinite(t[0]) and np.isfinite(t[1])
    assert not np.isfinite(t[2])  # only two hits in front
    assert ids[0] == 2 and ids[1] == 0  # nearest first


def test_single_primitive_radiance():
    opacity, rgb = 0.7, [0.9, 0.6, 0.3]
    s = emissive_scene([([0.0, 0.0, 1.0], 0.2, opacity, rgb)])
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    cfg = RFConfig(max_depth=8, srgb_primitives=False, chunk_size=8)
    out = np.asarray(radiance(s, None, o, d, cfg, jax.random.PRNGKey(0)))[0]
    # central ray: peak response is exactly 1 -> alpha = opacity
    np.testing.assert_allclose(out, np.asarray(rgb) * opacity, rtol=1e-4)


def test_compositing_order():
    # near red (alpha .5) in front of far blue (alpha .5):
    # L = .5*red + .5*.5*blue
    s = emissive_scene(
        [
            ([0.0, 0.0, 2.0], 0.1, 0.5, [0.0, 0.0, 1.0]),
            ([0.0, 0.0, 1.0], 0.1, 0.5, [1.0, 0.0, 0.0]),
        ]
    )
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    cfg = RFConfig(max_depth=8, srgb_primitives=False, chunk_size=8)
    out = np.asarray(radiance(s, None, o, d, cfg, jax.random.PRNGKey(0)))[0]
    np.testing.assert_allclose(out, [0.5, 0.0, 0.25], atol=1e-4)


def test_beta_kill():
    # a stack of opaque primitives: far ones must not contribute;
    # total = sum over first few until beta < 0.01
    entries = [
        ([0.0, 0.0, float(z)], 0.05, 0.9, [1.0, 1.0, 1.0]) for z in range(1, 9)
    ]
    s = emissive_scene(entries)
    o = jnp.asarray([[0.0, 0.0, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    cfg = RFConfig(max_depth=16, srgb_primitives=False, chunk_size=8)
    out = np.asarray(radiance(s, None, o, d, cfg, jax.random.PRNGKey(0)))[0]
    # manual front-to-back with kill at beta<=0.01 (matches rf:172-174)
    l, beta = 0.0, 1.0
    for _ in range(8):
        l += beta * 0.9
        beta *= 0.1
        if beta <= 0.01:
            break
    np.testing.assert_allclose(out, l, rtol=1e-3)


def test_sh_view_dependence():
    # degree-1 SH: emission varies with view direction
    c0 = 0.28209479177387814
    coeffs = np.zeros((4, 3), np.float32)
    coeffs[0] = (0.6 - 0.5) / c0  # DC -> 0.6
    coeffs[3] = 0.4  # -C1 * x term
    f = scene.EllipsoidsFactory()
    f.add(mean=[0, 0, 0], scale=0.2, opacities=0.8,
          sh_coeffs=coeffs.reshape(-1))
    s = f.build()
    cfg = RFConfig(max_depth=4, srgb_primitives=False, chunk_size=8)
    o = jnp.asarray([[-3.0, 0.0, 0.0], [3.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    out = np.asarray(radiance(s, None, o, d, cfg, jax.random.PRNGKey(0)))
    basis_px = np.asarray(sh.eval_basis(jnp.asarray([[1.0, 0, 0]]), 1))[0]
    e_px = max(basis_px @ coeffs[:, 0] + 0.5, 0.0) * 0.8
    np.testing.assert_allclose(out[0, 0], e_px, rtol=1e-4)
    assert abs(out[0, 0] - out[1, 0]) > 0.05  # view-dependent


def test_rf_gradients():
    s = emissive_scene(
        [
            ([0.0, 0.0, 1.0], 0.2, 0.6, [0.8, 0.4, 0.2]),
            ([0.1, 0.0, 2.0], 0.25, 0.4, [0.2, 0.7, 0.5]),
        ]
    )
    o = jnp.asarray([[0.0, 0.0, -3.0], [0.05, 0.02, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    cfg = RFConfig(max_depth=8, srgb_primitives=False, chunk_size=8)
    key = jax.random.PRNGKey(0)

    def loss(opac):
        s2 = scene.EllipsoidScene(
            s.centers, s.scales, s.quats,
            {**s.attrs, "opacities": opac}, s.extent,
        )
        return jnp.sum(radiance(s2, None, o, d, cfg, key))

    op0 = s.attrs["opacities"]
    g = jax.grad(loss)(op0)
    eps = 1e-3
    for i in range(2):
        delta = jnp.zeros_like(op0).at[i, 0].add(eps)
        fd = (loss(op0 + delta) - loss(op0 - delta)) / (2 * eps)
        np.testing.assert_allclose(float(g[i, 0]), float(fd), rtol=2e-2)


def test_rf_render_image():
    rng = np.random.default_rng(0)
    f = scene.EllipsoidsFactory()
    for _ in range(50):
        f.add(
            mean=rng.normal(size=3) * 0.5,
            scale=rng.uniform(0.05, 0.15, size=3),
            euler_deg=rng.uniform(-90, 90, size=3),
            opacities=rng.uniform(0.2, 0.9),
            sh_coeffs=rng.normal(size=3) * 0.3,
        )
    s = f.build()
    cam = scene.CameraSpecs(
        name="c", width=32, height=32,
        to_world=scene.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]), fov=45.0,
    )
    img = models.render(
        s, cam, radiance, RFConfig(max_depth=32), None, spp=2, seed=0
    )
    img = np.asarray(img)
    assert img.shape == (32, 32, 3)
    assert np.all(np.isfinite(img)) and img.min() >= 0.0
    assert img.max() > 0.05  # something rendered
