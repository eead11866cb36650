"""Scene data model + I/O tests (PLY codec, .vol grids, assets, factory)."""

import jax.numpy as jnp
import numpy as np

from volprim_tpu import scene


def make_scene(n=5, with_sh=False, seed=0):
    rng = np.random.default_rng(seed)
    f = scene.EllipsoidsFactory()
    for i in range(n):
        attrs = dict(
            sigma_t=rng.uniform(0.1, 1.0),
            albedo=rng.uniform(0.2, 0.9, size=3),
        )
        if with_sh:
            attrs = dict(
                opacities=rng.uniform(0.1, 0.9),
                sh_coeffs=rng.normal(size=12).astype(np.float32),
            )
        f.add(
            mean=rng.normal(size=3),
            scale=rng.uniform(0.05, 0.3, size=3),
            euler_deg=rng.uniform(-90, 90, size=3),
            **attrs,
        )
    return f.build()


def test_factory_and_pack_roundtrip():
    s = make_scene()
    assert s.num_prims == 5
    data = s.pack_data()
    assert data.shape == (50,)
    s2 = scene.EllipsoidScene.from_packed_data(data, attrs=s.attrs)
    np.testing.assert_allclose(s2.centers, s.centers)
    np.testing.assert_allclose(s2.quats, s.quats)


def test_ply_roundtrip(tmp_path):
    s = make_scene()
    path = str(tmp_path / "test.ply")
    scene.save_ply(s, path)
    s2 = scene.load_ply(path)
    np.testing.assert_allclose(s2.centers, s.centers, rtol=1e-5)
    np.testing.assert_allclose(s2.scales, s.scales, rtol=1e-5)
    np.testing.assert_allclose(s2.quats, s.quats, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        s2.attrs["sigma_t"], s.attrs["sigma_t"], rtol=1e-5
    )
    np.testing.assert_allclose(s2.attrs["albedo"], s.attrs["albedo"], rtol=1e-5)


def test_ply_roundtrip_3dgs(tmp_path):
    s = make_scene(with_sh=True)
    path = str(tmp_path / "gs.ply")
    scene.save_ply(s, path)
    s2 = scene.load_ply(path)
    np.testing.assert_allclose(
        s2.attrs["opacities"], s.attrs["opacities"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        s2.attrs["sh_coeffs"], s.attrs["sh_coeffs"], rtol=1e-4, atol=1e-5
    )


def test_smoke_ply_loads():
    s = scene.load_ply("/root/reference/resources/smoke.ply")
    assert s.num_prims == 835
    assert "sigma_t" in s.attrs and "albedo" in s.attrs
    # scales stored as logs around -3.4 -> exp in (0.02, 0.05)
    assert 0.01 < float(jnp.min(s.scales)) < float(jnp.max(s.scales)) < 0.06
    # quats renormalized, w-first reordered to xyzw
    norms = jnp.linalg.norm(s.quats, axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)
    assert float(jnp.mean(s.quats[:, 3])) > 0.99  # w component dominant


def test_vol_roundtrip(tmp_path):
    g = scene.procedural_smoke(res=16)
    path = str(tmp_path / "t.vol")
    scene.save_vol(g, path)
    g2 = scene.load_vol(path)
    np.testing.assert_allclose(g2.data, g.data)
    np.testing.assert_allclose(g2.bbox_min, g.bbox_min)
    # trilinear sampling: interior point matches, outside is zero
    p = jnp.asarray([[0.5, 0.5, 0.5], [2.0, 0.0, 0.0]])
    v = g2.sample(p)
    assert v[0, 0] >= 0.0 and v[1, 0] == 0.0


def test_asset_roundtrip(tmp_path):
    s = make_scene()
    cams = [
        scene.CameraSpecs(
            name="c0", width=32, height=24,
            to_world=scene.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]), fov=40.0,
        )
    ]
    folder = str(tmp_path / "asset")
    scene.save_asset(
        folder, s, cams,
        integrator={"type": "volprim_tomography", "max_depth": -1},
        emitters={"env": {"type": "constant", "radiance": 1.0}},
    )
    loaded = scene.load_asset(folder)
    assert loaded["primitives"].num_prims == 5
    assert loaded["cameras"][0].width == 32
    assert loaded["integrator"]["type"] == "volprim_tomography"


def test_lattice_init():
    s = scene.lattice_init(4)
    assert s.num_prims == 64
    assert float(jnp.min(s.centers)) == -1.0
