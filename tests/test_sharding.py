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


def surface_scene_big(n=3200, seed=3):
    from tests.test_rf_tiled import surface_scene

    return surface_scene(n, seed)


def test_rf_tiled_sharded_bitmatches_single():
    """Flagship path: tile axis sharded over the 8-device mesh must produce
    the *bitwise* identical image (per-tile RNG keys; no collectives in the
    frame)."""
    from volprim_tpu.models import rf_tiled

    s = surface_scene_big()
    cam = scene.CameraSpecs(
        name="c", width=64, height=64,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    mesh = parallel.data_mesh()
    # order_band is pure per-tile math: the sharded frame must stay
    # bitwise identical with the banded correction on, both backends
    for backend in ("xla", "fused"):
        cfg = rf_tiled.RFTiledConfig(
            max_depth=48, srgb_primitives=False,
            tile_pixels=256, max_candidates=512, segment=128, tile_group=2,
            use_clusters=True, cluster_size=32, backend=backend,
            order_band=8,
        )
        state = rf_tiled.build_state(s, cfg)
        img1 = jax.jit(
            lambda st: rf_tiled.render_state(st, cam, cfg, None, spp=2, seed=1)
        )(state)
        img8 = jax.jit(
            lambda st: rf_tiled.render_state(
                st, cam, cfg, None, spp=2, seed=1, mesh=mesh
            )
        )(state)
        np.testing.assert_array_equal(
            np.asarray(img1), np.asarray(img8), err_msg=backend
        )


def test_rf_tiled_sharded_gradients_match():
    """Training path (pallas backend is differentiable) under the mesh."""
    from volprim_tpu.models import rf_tiled

    s = surface_scene_big(800, seed=5)
    cam = scene.CameraSpecs(
        name="c", width=64, height=32,  # 8 tiles of 16x16 = 1/device
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    mesh = parallel.data_mesh()
    cfg = rf_tiled.RFTiledConfig(
        max_depth=32, srgb_primitives=False,
        tile_pixels=256, max_candidates=256, segment=64, tile_group=2,
        use_clusters=True, cluster_size=32,
    )
    target = jnp.zeros((32, 64, 3))

    def loss(opac, mesh_arg):
        s2 = scene.EllipsoidScene(
            s.centers, s.scales, s.quats,
            {**s.attrs, "opacities": opac}, s.extent,
        )
        st = rf_tiled.build_state(s2, cfg)
        img = rf_tiled.render_state(
            st, cam, cfg, None, spp=1, seed=0, jitter=False, mesh=mesh_arg
        )
        return jnp.mean((img - target) ** 2)

    g1 = jax.jit(jax.grad(lambda p: loss(p, None)))(s.attrs["opacities"])
    g8 = jax.jit(jax.grad(lambda p: loss(p, mesh)))(s.attrs["opacities"])
    # grad reductions accumulate in a different order under the mesh
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g8), rtol=1e-3, atol=1e-8
    )


def test_prb_sharded_render_and_grad_match():
    """prb wavefront sharded over rays: render + sigma_t gradients."""
    from volprim_tpu.models import prb

    s = make_scene()
    s.attrs["albedo"] = jnp.full((s.num_prims, 3), 0.8)
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    cam = scene.CameraSpecs(
        name="c", width=16, height=16,  # 256 rays = 32/device
        to_world=scene.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]), fov=45.0,
    )
    cfg = prb.PRBConfig(
        max_overlaps=8, max_windows=3, bounce_cap=6, chunk_size=32,
        cluster_size=8,
    )
    mesh = parallel.data_mesh()

    img1 = jax.jit(
        lambda p: models.render(p, cam, prb.radiance, cfg, em, spp=2, seed=3)
    )(s)
    img8 = jax.jit(
        lambda p: models.render(
            p, cam, prb.radiance, cfg, em, spp=2, seed=3, mesh=mesh
        )
    )(s)
    np.testing.assert_allclose(
        np.asarray(img1), np.asarray(img8), rtol=1e-4, atol=1e-5
    )

    target = jnp.zeros((16, 16, 3))

    def loss(sig, mesh_arg):
        s2 = scene.EllipsoidScene(
            s.centers, s.scales, s.quats,
            {**s.attrs, "sigma_t": sig}, s.extent,
        )
        img = models.render(
            s2, cam, prb.radiance, cfg, em, spp=1, seed=3, mesh=mesh_arg
        )
        return jnp.mean((img - target) ** 2)

    g1 = jax.jit(jax.grad(lambda p: loss(p, None)))(s.attrs["sigma_t"])
    g8 = jax.jit(jax.grad(lambda p: loss(p, mesh)))(s.attrs["sigma_t"])
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g8), rtol=2e-3, atol=1e-7
    )


def test_rf_tiled_compact_and_classes_sharded():
    """Round-3 paths under the mesh: kernel_compact stays bitwise-equal
    sharded vs single-device; budget_classes is statistically equal (the
    per-shard need ordering changes class assignment) — check PSNR."""
    from volprim_tpu.models import rf_tiled

    s = surface_scene_big()
    cam = scene.CameraSpecs(
        name="c", width=64, height=64,
        to_world=scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    mesh = parallel.data_mesh()
    cfg = rf_tiled.RFTiledConfig(
        max_depth=48, srgb_primitives=False,
        tile_pixels=256, max_candidates=512, segment=128,
        use_clusters=True, cluster_size=16, backend="fused",
        kernel_compact=True, kernel_batch=2,
    )
    state = rf_tiled.build_state(s, cfg)
    img1 = jax.jit(
        lambda st: rf_tiled.render_state(st, cam, cfg, None, spp=1, seed=1)
    )(state)
    img8 = jax.jit(
        lambda st: rf_tiled.render_state(
            st, cam, cfg, None, spp=1, seed=1, mesh=mesh
        )
    )(state)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img8))

    cfg_c = rf_tiled.RFTiledConfig(
        max_depth=48, srgb_primitives=False,
        tile_pixels=256, max_candidates=512, segment=128,
        use_clusters=True, cluster_size=16, backend="fused",
        # per-shard sorting with only 2 tiles/shard makes class
        # ASSIGNMENT degenerate (documented: statistically equal only at
        # realistic tiles/shard); budgets that cover need per class test
        # the sharded mechanism itself
        budget_classes=((0.5, 64), (0.5, 200)), kernel_batch=2,
    )
    st_c = rf_tiled.build_state(s, cfg_c)
    i1 = np.asarray(
        jax.jit(
            lambda st: rf_tiled.render_state(
                st, cam, cfg_c, None, spp=1, seed=1
            )
        )(st_c)
    )
    i8 = np.asarray(
        jax.jit(
            lambda st: rf_tiled.render_state(
                st, cam, cfg_c, None, spp=1, seed=1, mesh=mesh
            )
        )(st_c)
    )
    assert np.isfinite(i8).all()
    mse = np.mean((i1 - i8) ** 2)
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 25.0, f"sharded classes PSNR {psnr:.1f}"


def test_init_multihost_single_process_fallback():
    """The DCN init path (SURVEY §2.2): in a single-process environment
    jax.distributed.initialize has no coordinator, so init_multihost must
    return False (single-process fallback) without raising — and the
    local data mesh must keep working afterwards. On a real pod slice the
    same call returns True and data_mesh spans all hosts."""
    from volprim_tpu import parallel

    ok = parallel.init_multihost()
    assert ok in (False, True)  # no-raise contract; False off-pod
    m = parallel.data_mesh()
    assert m.devices.size == len(jax.devices())


def test_init_multihost_bad_coordinator_is_nonfatal():
    """Explicit-but-unreachable coordinator args must fall back to
    single-process (returns False), not raise at import/render time."""
    from volprim_tpu import parallel

    assert parallel.init_multihost(
        coordinator_address="127.0.0.1:1",  # nothing joins here
        num_processes=2,
        process_id=0,
        timeout_s=5,
    ) is False


def test_init_multihost_two_process_collective(tmp_path):
    """The DCN path EXERCISED, not just written: two real processes join
    through jax.distributed (coordinator on localhost), form the global
    8-device mesh (4 virtual CPU devices each), and run a cross-process
    psum — the same runtime machinery a TPU pod slice uses, minus the
    physical DCN. SURVEY §2.2's last unticked box."""
    import os
    import socket
    import subprocess
    import sys as _sys

    worker = tmp_path / "dcn_worker.py"
    worker.write_text(
        "import os, sys\n"
        "sys.path.insert(0, %r)\n"
        "port, rank = sys.argv[1], int(sys.argv[2])\n"
        "os.environ['XLA_FLAGS'] = "
        "'--xla_force_host_platform_device_count=4'\n"
        "os.environ.setdefault('VOLPRIM_TPU_NO_COMPILE_CACHE', '1')\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from volprim_tpu import parallel\n"
        "ok = parallel.init_multihost(f'127.0.0.1:{port}', 2, rank,\n"
        "                             timeout_s=120)\n"
        "assert ok\n"
        "assert jax.process_count() == 2\n"
        "assert jax.device_count() == 8\n"
        "import jax.numpy as jnp\n"
        "out = jax.pmap(lambda x: jax.lax.psum(x, 'i'), axis_name='i')(\n"
        "    jnp.ones((jax.local_device_count(),)))\n"
        "assert float(out[0]) == 8.0, float(out[0])\n"
        "assert parallel.data_mesh().devices.size == 8\n"
        "print(f'rank{rank} OK')\n"
        % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")
    }
    procs = [
        subprocess.Popen(
            [_sys.executable, str(worker), str(port), str(r)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for r in (0, 1)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-2000:]}"
        assert f"rank{r} OK" in out
