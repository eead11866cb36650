"""BoundedAdam semantics + a miniature end-to-end tomography optimization
(the pytest version of examples/optimize_volume.py, BASELINE config #4)."""

import jax
import jax.numpy as jnp
import numpy as np

from volprim_tpu import models, optim, scene
from volprim_tpu.models import gridvol, tomography
from volprim_tpu.ops import envmap
from volprim_tpu.scene import EllipsoidScene
from volprim_tpu.scene.cameras import CameraSpecs, look_at, rotate_y


def test_adam_converges_quadratic():
    opt = optim.BoundedAdam(lr=0.1)
    params = {"x": jnp.asarray([3.0, -2.0])}
    state = opt.init(params)
    for _ in range(200):
        g = {"x": 2.0 * params["x"]}
        params, state = opt.step(params, g, state)
    np.testing.assert_allclose(np.asarray(params["x"]), 0.0, atol=1e-3)


def test_adam_bounds_halving():
    # stepping over the bound moves halfway to it and resets moments
    opt = optim.BoundedAdam(lr=1.0)
    opt.set_bounds("x", lower=0.0)
    params = {"x": jnp.asarray([0.1])}
    state = opt.init(params)
    g = {"x": jnp.asarray([10.0])}  # large positive grad -> huge step down
    params, state = opt.step(params, g, state)
    # would go far below 0 -> instead x = 0.1 - 0.5*(0.1-0) = 0.05
    np.testing.assert_allclose(np.asarray(params["x"]), [0.05], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state.m["x"]), [0.0])


def test_adam_nan_grads_zeroed():
    opt = optim.BoundedAdam(lr=0.1)
    params = {"x": jnp.asarray([1.0])}
    state = opt.init(params)
    params, state = opt.step(params, {"x": jnp.asarray([jnp.nan])}, state)
    np.testing.assert_allclose(np.asarray(params["x"]), [1.0])


def test_state_checkpoint_roundtrip(tmp_path):
    opt = optim.BoundedAdam(lr=0.1)
    params = {"x": jnp.asarray([1.0, 2.0])}
    state = opt.init(params)
    params, state = opt.step(params, {"x": jnp.asarray([0.5, -0.5])}, state)
    path = str(tmp_path / "ckpt.npz")
    optim.save_state(path, params, state)
    p2, s2 = optim.load_state(path)
    np.testing.assert_allclose(p2["x"], params["x"])
    np.testing.assert_allclose(s2.m["x"], state.m["x"])
    assert int(s2.t["x"]) == 1


def test_tomography_optimization_e2e():
    """Miniature optimize_volume: fit a 4^3 lattice to a procedural plume."""
    res = 24
    cam_count = 3
    cameras = [
        CameraSpecs(
            name=f"c{i}", width=res, height=res,
            to_world=rotate_y(120.0 * i - 60.0)
            @ look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]),
            fov=40.0,
        )
        for i in range(cam_count)
    ]
    grid = scene.procedural_smoke(res=16)
    gcfg = gridvol.GridVolumeConfig(sigma_scale=5.0, num_steps=64)
    grid_t = gridvol.transform_grid(grid, gcfg)
    emitter = envmap.ConstantEmitter(radiance=jnp.ones(3))
    ref = jnp.clip(
        models.render_batch(
            grid_t, cameras, gridvol.radiance, gcfg, emitter, spp=4
        ),
        0.0, 1.0,
    )

    prims = scene.lattice_init(4, init_sigmat=1e-4, init_albedo=0.9)
    cfg = tomography.TomographyConfig(max_depth=-1, chunk_size=64)

    opt = optim.BoundedAdam()
    opt.set_learning_rate({"centers": 0.015, "scales": 1e-4, "sigmat": 1e-4})
    opt.set_bounds("scales", lower=1e-6)
    opt.set_bounds("sigmat", lower=1e-8, upper=1e-3)
    params = {
        "centers": prims.centers,
        "scales": prims.scales,
        "sigmat": prims.attrs["sigma_t"],
    }
    state = opt.init(params)

    def to_scene(p):
        return EllipsoidScene(
            p["centers"], p["scales"], prims.quats,
            {"sigma_t": p["sigmat"], "albedo": prims.attrs["albedo"]},
            prims.extent,
        )

    @jax.jit
    def step(p, s, seed):
        def loss_fn(p):
            img = models.render_batch(
                to_scene(p), cameras, tomography.radiance, cfg, emitter,
                spp=1, seed=seed,
            )
            return optim.l1(ref, img)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        p, s = opt.step(p, grads, s)
        return p, s, loss

    losses = []
    for it in range(12):
        params, state, loss = step(params, state, it)
        losses.append(float(loss))

    assert np.isfinite(losses).all()
    # reference learning rates are small (sigmat_lr=1e-4 vs bound 1e-3);
    # 12 iterations give ~10% reduction — check steady descent.
    assert losses[-1] < losses[0] * 0.95, f"no convergence: {losses}"
    assert losses[-1] < min(losses[:3]), f"not descending: {losses}"
    # sigma_t respected its bounds
    assert float(params["sigmat"].min()) >= 1e-8
    assert float(params["sigmat"].max()) <= 1e-3


def test_render_with_spp_grad():
    """spp_grad == spp reproduces plain AD exactly; spp_grad < spp gives a
    cheaper, still-correlated adjoint (mi.render spp/spp_grad semantics)."""
    import jax

    from volprim_tpu import models, scene
    from volprim_tpu.models import tomography
    from volprim_tpu.ops import envmap

    f = scene.EllipsoidsFactory()
    rng = np.random.default_rng(0)
    for _ in range(12):
        f.add(mean=rng.normal(size=3) * 0.4, scale=0.2,
              sigma_t=rng.uniform(0.5, 2.0), albedo=0.8)
    s = f.build()
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    cam = scene.CameraSpecs(
        name="c", width=16, height=16,
        to_world=scene.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]), fov=45.0,
    )
    cfg = tomography.TomographyConfig(chunk_size=16)
    target = jnp.zeros((16, 16, 3))

    def loss_plain(sig):
        s2 = scene.EllipsoidScene(
            s.centers, s.scales, s.quats, {**s.attrs, "sigma_t": sig},
            s.extent,
        )
        img = models.render(
            s2, cam, tomography.radiance, cfg, em, spp=4, seed=3
        )
        return jnp.mean((img - target) ** 2)

    def loss_split(sig, sg):
        s2 = scene.EllipsoidScene(
            s.centers, s.scales, s.quats, {**s.attrs, "sigma_t": sig},
            s.extent,
        )
        fr = models.render_with_spp_grad(
            cam, tomography.radiance, cfg, em, spp=4, spp_grad=sg, seed=3
        )
        return jnp.mean((fr(s2) - target) ** 2)

    g_plain = jax.grad(loss_plain)(s.attrs["sigma_t"])
    g_same = jax.grad(lambda p: loss_split(p, 4))(s.attrs["sigma_t"])
    np.testing.assert_allclose(np.asarray(g_plain), np.asarray(g_same),
                               rtol=1e-6)
    g_cheap = jax.grad(lambda p: loss_split(p, 1))(s.attrs["sigma_t"])
    g_cheap = np.asarray(g_cheap)
    g_ref = np.asarray(g_plain)
    assert np.isfinite(g_cheap).all()
    # cheap adjoint is a noisier estimate of the same gradient
    cos = (g_cheap * g_ref).sum() / (
        np.linalg.norm(g_cheap) * np.linalg.norm(g_ref) + 1e-12
    )
    assert cos > 0.9, cos
