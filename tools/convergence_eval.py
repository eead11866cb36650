"""Does training through the tiled (ordering-approximate) renderer hurt
converged quality? — the experiment that licenses the bench renderer for
training (VERDICT round-2 weak #2).

Protocol: a ground-truth splat scene renders reference views with the
EXACT per-ray-order integrator (models/rf.py). A perturbed copy is then
optimized against those references twice — once differentiating through
the exact renderer, once through the tiled renderer (cluster-depth
ordering approximation, the bench/training fast path). Both converged
scenes are evaluated with the EXACT renderer on a held-out view. If the
tiled-trained PSNR matches the exact-trained PSNR, the ordering
approximation is harmless for training.

Usage: python tools/convergence_eval.py [--iters 150] [--prims 2000]
(CPU by default; ~3-6 min.)
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--prims", type=int, default=2000)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--band", action="store_true",
                    help="also train through the csort+band16 quality mode")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from volprim_tpu import optim, scene
    from volprim_tpu.models import rf, rf_tiled

    rng = np.random.default_rng(0)
    n = args.prims
    f = scene.EllipsoidsFactory()
    for _ in range(n):
        p = rng.normal(size=3)
        p /= np.linalg.norm(p)
        f.add(
            mean=p * rng.uniform(0.9, 1.1),
            scale=rng.uniform(0.03, 0.1, size=3),
            euler_deg=rng.uniform(-90, 90, size=3),
            opacities=rng.uniform(0.3, 0.95),
            sh_coeffs=rng.normal(size=3).astype(np.float32) * 0.4,
        )
    gt = f.build()

    res = args.res
    cams = [
        scene.CameraSpecs(
            name=f"c{i}", width=res, height=res,
            to_world=scene.look_at(
                [3.5 * np.sin(th), 0.3, -3.5 * np.cos(th)], [0, 0, 0],
                [0, 1, 0],
            ),
            fov=45.0,
        )
        for i, th in enumerate(np.linspace(0, 2 * np.pi, 6, endpoint=False))
    ]
    train_cams, test_cam = cams[:5], cams[5]

    ecfg = rf.RFConfig(max_depth=64, srgb_primitives=False, chunk_size=512)

    def render_exact(prims, cam):
        o, d = scene.generate_rays(cam, jitter=False)
        return rf.radiance(
            prims, None, o, d, ecfg, jax.random.PRNGKey(0)
        ).reshape(res, res, 3)

    jexact = {
        id(c): jax.jit(lambda p_, c=c: render_exact(p_, c)) for c in cams
    }
    refs = [np.asarray(jexact[id(c)](gt)) for c in train_cams]
    ref_test = np.asarray(jexact[id(test_cam)](gt))

    # perturbed init: noisy opacities + SH, slightly jittered centers
    init = {
        "opacities": jnp.clip(
            gt.attrs["opacities"]
            + jnp.asarray(rng.normal(0, 0.25, (n, 1)).astype(np.float32)),
            1e-3, 1.0 - 1e-3,
        ),
        "sh_coeffs": gt.attrs["sh_coeffs"]
        + jnp.asarray(rng.normal(0, 0.3, (n, 3)).astype(np.float32)),
        "centers": gt.centers
        + jnp.asarray(rng.normal(0, 0.01, (n, 3)).astype(np.float32)),
    }

    tcfg = rf_tiled.RFTiledConfig(
        max_depth=64, srgb_primitives=False, tile_pixels=256,
        max_candidates=1024, segment=128, cluster_size=16, backend="xla",
        use_clusters=True,
    )
    # the band quality mode (order_band, round 4): same pipeline plus the
    # intra-cluster entry sort and the banded per-ray order correction —
    # trains through the mul/div prefix form (plain AD; the fused
    # backend's banded custom-VJP adjoint is tested to match it,
    # tests/test_rf_tiled.py::test_order_band_fused_matches_xla)
    bcfg = dataclasses.replace(
        tcfg, prim_resort="cluster-entry", order_band=16
    )

    def to_scene(p):
        return scene.EllipsoidScene(
            centers=p["centers"], scales=gt.scales, quats=gt.quats,
            attrs={"opacities": p["opacities"],
                   "sh_coeffs": p["sh_coeffs"]},
            extent=gt.extent,
        )

    def train(renderer: str):
        opt = optim.BoundedAdam(lr=5e-3)
        opt.set_bounds("opacities", lower=1e-4, upper=1.0 - 1e-4)
        params = dict(init)
        state = opt.init(params)

        def loss_fn(p, ci):
            prims = to_scene(p)
            if renderer == "exact":
                img = render_exact(prims, train_cams[ci])
            else:
                c = bcfg if renderer == "band" else tcfg
                st = rf_tiled.build_state(prims, c)
                img = rf_tiled.render_state(
                    st, train_cams[ci], c, None, spp=1, seed=0,
                    jitter=False,
                )
            return optim.l1(jnp.asarray(refs[ci]), img)

        steps = [
            jax.jit(
                lambda p, s, ci=ci: _step(opt, loss_fn, p, s, ci)
            )
            for ci in range(len(train_cams))
        ]
        t0 = time.time()
        for it in range(args.iters):
            ci = it % len(train_cams)
            params, state, loss = steps[ci](params, state)
            if it % 25 == 0:
                print(
                    f"  [{renderer}] iter {it} loss {float(loss):.5f}",
                    flush=True,
                )
        print(f"  [{renderer}] {time.time() - t0:.0f} s", flush=True)
        return params

    def _step(opt, loss_fn, p, s, ci):
        loss, grads = jax.value_and_grad(loss_fn)(p, ci)
        p, s = opt.step(p, grads, s)
        return p, s, loss

    def psnr_exact(p):
        img = np.asarray(jexact[id(test_cam)](to_scene(p)))
        mse = np.mean((img - ref_test) ** 2)
        return -10 * np.log10(max(mse, 1e-12))

    print(f"init held-out PSNR (exact render): {psnr_exact(init):.2f} dB",
          flush=True)
    p_tiled = train("tiled")
    psnr_tiled = psnr_exact(p_tiled)
    print(f"tiled-trained, exact-evaluated: {psnr_tiled:.2f} dB", flush=True)
    psnr_band = None
    if args.band:
        p_band = train("band")
        psnr_band = psnr_exact(p_band)
        print(
            f"band-trained (csort+band16), exact-evaluated: "
            f"{psnr_band:.2f} dB", flush=True,
        )
    p_exact = train("exact")
    psnr_ex = psnr_exact(p_exact)
    print(f"exact-trained, exact-evaluated: {psnr_ex:.2f} dB", flush=True)
    print(
        f"delta (tiled-trained - exact-trained): "
        f"{psnr_tiled - psnr_ex:+.2f} dB",
        flush=True,
    )
    if psnr_band is not None:
        print(
            f"delta (band-trained - exact-trained): "
            f"{psnr_band - psnr_ex:+.2f} dB",
            flush=True,
        )


if __name__ == "__main__":
    main()
