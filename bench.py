"""Headline benchmark: volprim_rf Mrays/sec on a synthetic 3DGS-scale scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference repo publishes no numbers (BASELINE.md: harness only), and the
truck dataset blobs are not in the snapshot, so the workload is a synthetic
3DGS-style scene (anisotropic rotated Gaussians, degree-1 SH) at the
render_3dg_asset.py defaults (spp=2, max_depth=128). vs_baseline is reported
against the north-star proxy of 100 Mrays/sec/chip (a mid-range published
3DGRT-class GPU figure) until a measured Dr.Jit-CUDA baseline exists.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import volprim_tpu as vp
    from volprim_tpu.models import rf

    n_prims = 65536
    width = height = 512
    spp = 2

    rng = np.random.default_rng(0)
    f_dc = rng.normal(size=(n_prims, 3)).astype(np.float32) * 0.3
    quats = rng.normal(size=(n_prims, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scene = vp.scene.EllipsoidScene(
        centers=jnp.asarray(rng.normal(size=(n_prims, 3)).astype(np.float32)),
        scales=jnp.asarray(
            rng.uniform(0.005, 0.05, size=(n_prims, 3)).astype(np.float32)
        ),
        quats=jnp.asarray(quats),
        attrs={
            "opacities": jnp.asarray(
                rng.uniform(0.2, 0.95, size=(n_prims, 1)).astype(np.float32)
            ),
            "sh_coeffs": jnp.asarray(
                np.concatenate(
                    [f_dc, rng.normal(size=(n_prims, 9)).astype(np.float32) * 0.1],
                    axis=1,
                )
            ),
        },
    )
    camera = vp.scene.CameraSpecs(
        name="bench", width=width, height=height,
        to_world=vp.scene.look_at([0, 0, -5], [0, 0, 0], [0, 1, 0]), fov=50.0,
    )
    cfg = rf.RFConfig(max_depth=128, rr_depth=128, chunk_size=4096)

    def run(prims):
        return vp.models.render(
            prims, camera, rf.radiance, cfg, None, spp=spp, seed=0
        )

    print(f"compiling on {jax.devices()[0]} ...", file=sys.stderr)
    jfn = jax.jit(run)
    out = jax.block_until_ready(jfn(scene))
    assert np.isfinite(np.asarray(out)).all()

    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(jfn(scene))
        times.append(time.perf_counter() - t0)
    exec_s = float(np.mean(times))
    n_rays = width * height * spp
    mrays = n_rays / exec_s / 1e6
    print(
        f"exec {exec_s * 1e3:.1f} ms for {n_rays} rays over {n_prims} prims",
        file=sys.stderr,
    )

    baseline_proxy = 100.0  # Mrays/sec, see module docstring
    print(
        json.dumps(
            {
                "metric": "volprim_rf_synthetic_3dgs_65k",
                "value": round(mrays, 3),
                "unit": "Mrays/sec/chip",
                "vs_baseline": round(mrays / baseline_proxy, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
