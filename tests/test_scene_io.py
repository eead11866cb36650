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


def test_reference_asset_roundtrip(tmp_path):
    """save_reference_asset writes an importable Python-asset dir that
    load_reference_asset (and, structurally, the reference's asset_to_dict)
    reads back: primitives, cameras and emitter survive the round trip."""
    import jax.numpy as jnp

    from volprim_tpu.ops.envmap import ConstantEmitter
    from volprim_tpu.scene import asset_interop

    rng = np.random.default_rng(0)
    n = 17
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    prims = scene.EllipsoidScene(
        centers=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        scales=jnp.asarray(
            rng.uniform(0.05, 0.4, size=(n, 3)).astype(np.float32)
        ),
        quats=jnp.asarray(quats),
        attrs={
            "sigma_t": jnp.asarray(
                rng.uniform(0.1, 2.0, size=(n, 1)).astype(np.float32)
            ),
            "albedo": jnp.asarray(
                rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
            ),
        },
    )
    cams = [
        scene.CameraSpecs(
            name=f"c{i}", width=64, height=48,
            to_world=scene.look_at(
                [0, 0.5, -3 - i], [0, 0, 0], [0, 1, 0]
            ),
            fov=40.0 + i,
        )
        for i in range(2)
    ]
    em = ConstantEmitter(radiance=jnp.ones(3) * 0.8)

    out = tmp_path / "asset"
    asset_interop.save_reference_asset(str(out), prims, cams, em)
    assert (out / "__init__.py").exists()
    assert (out / "data" / "root.object.ply").exists()

    back = asset_interop.load_reference_asset(str(out))
    p2 = back["primitives"]
    np.testing.assert_allclose(
        np.asarray(p2.centers), np.asarray(prims.centers), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(p2.scales), np.asarray(prims.scales), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(p2.attrs["sigma_t"]), np.asarray(prims.attrs["sigma_t"]),
        rtol=1e-5,
    )
    assert len(back["cameras"]) == 2
    c0 = back["cameras"][0]
    assert (c0.width, c0.height) == (64, 48)
    np.testing.assert_allclose(
        c0.to_world, cams[0].to_world, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(back["emitter"].radiance), 0.8, rtol=1e-6
    )


def test_reference_asset_reader_handles_reference_style_file(tmp_path):
    """Reader executes an __init__.py shaped exactly like the reference's
    dict_to_asset output (io.py:253-273), incl. T().look_at and np.load."""
    import jax.numpy as jnp

    from volprim_tpu.scene import asset_interop

    out = tmp_path / "asset"
    (out / "data").mkdir(parents=True)
    np.save(out / "data" / "root.object.extras.npy", np.ones((4, 1)))
    # a minimal reference-style ellipsoid PLY via our own codec
    rng = np.random.default_rng(1)
    quats = rng.normal(size=(4, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    prims = scene.EllipsoidScene(
        centers=jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32)),
        scales=jnp.asarray(np.full((4, 3), 0.3, np.float32)),
        quats=jnp.asarray(quats),
        attrs={"sigma_t": jnp.asarray(np.full((4, 1), 1.5, np.float32))},
    )
    from volprim_tpu.scene import ply as ply_io

    ply_io.save_ply(prims, str(out / "data" / "root.object.ply"))

    (out / "__init__.py").write_text(
        "import os\n"
        "from os.path import join, dirname\n"
        "import numpy as np\n"
        "import drjit as dr\n"
        "import mitsuba as mi\n"
        "from mitsuba.scalar_rgb import ScalarTransform4f as T\n"
        "\n"
        "OBJECTS = {\n"
        "    'resources': { 'type': 'resources', 'path': dirname(__file__) },\n"
        "    'object': {\n"
        "        'type': 'ellipsoidsmesh',\n"
        "        'filename': r'data/root.object.ply',\n"
        "        'extra': np.load(join(dirname(__file__), 'data/root.object.extras.npy')),\n"
        "    },\n"
        "}\n"
        "\n"
        "SENSORS = {\n"
        "    'sensor': {\n"
        "        'type': 'perspective',\n"
        "        'fov': 39.0,\n"
        "        'to_world': T().look_at(\n"
        "             origin=[0, 1, -4],\n"
        "             target=[0, 0, 0],\n"
        "             up=[0, 1, 0],\n"
        "         ),\n"
        "        'film': { 'type': 'hdrfilm', 'width': 32, 'height': 24 },\n"
        "    },\n"
        "}\n"
        "\n"
        "EMITTERS = {\n"
        "    'environment': { 'type': 'constant',\n"
        "        'radiance': { 'type': 'rgb', 'value': 1.0 } },\n"
        "}\n"
    )
    back = asset_interop.load_reference_asset(str(out))
    assert back["primitives"].num_prims == 4
    assert back["cameras"][0].fov == 39.0
    assert back["emitter"] is not None


def test_mangled_asset_fails_loudly(tmp_path):
    """Hand-edited assets that the stand-in environment cannot faithfully
    execute must raise, not silently mis-parse (round-2 advisor finding):
    nested imports, __import__, unresolved mi.* constructs and unknown
    plugin types all error; strict=False restores the permissive read."""
    import pytest

    from volprim_tpu.scene import asset_interop

    def write(body):
        d = tmp_path / "asset"
        d.mkdir(exist_ok=True)
        (d / "__init__.py").write_text(body)
        return str(d)

    # multi-line import: the old line filter dropped only the first line,
    # leaving ` ScalarTransform4f as T)` to crash or worse; the AST strip
    # handles it (this must LOAD fine)
    p = write(
        "from mitsuba.scalar_rgb import (\n"
        "    ScalarTransform4f as T)\n"
        "OBJECTS = {}\nSENSORS = {}\nEMITTERS = {}\n"
    )
    asset_interop.load_reference_asset(p)

    # import inside a function/if: refuse
    p = write(
        "def f():\n    import os\n    return 1\n"
        "OBJECTS = {}\nSENSORS = {}\nEMITTERS = {}\n"
    )
    with pytest.raises(ValueError, match="import inside"):
        asset_interop.load_reference_asset(p)

    # __import__: refuse
    p = write(
        "x = __import__('os')\nOBJECTS = {}\nSENSORS = {}\nEMITTERS = {}\n"
    )
    with pytest.raises(ValueError, match="__import__"):
        asset_interop.load_reference_asset(p)

    # unresolved mi.* construct leaking into the dicts: refuse in strict
    p = write(
        "import mitsuba as mi\n"
        "OBJECTS = { 'thing': { 'type': 'ply', 'weird': mi.Unknown } }\n"
        "SENSORS = {}\nEMITTERS = {}\n"
    )
    with pytest.raises(ValueError, match="unresolved Mitsuba"):
        asset_interop.load_reference_asset(p)
    asset_interop.load_reference_asset(p, strict=False)

    # unknown emitter plugin type: refuse in strict, skip otherwise
    p = write(
        "OBJECTS = {}\nSENSORS = {}\n"
        "EMITTERS = { 'e': { 'type': 'projector' } }\n"
    )
    with pytest.raises(ValueError, match="unknown emitter type"):
        asset_interop.load_reference_asset(p)
    out = asset_interop.load_reference_asset(p, strict=False)
    assert out["emitter"] is None
