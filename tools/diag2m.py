"""Attribute the 2M-splat quality gap (20.8 dB vs exact) to its source.

Renders the bench 2M scene at 512^2 through the TILED pipeline with the
``xla`` backend (identical cull/shortlist graphs to the fused kernel, no
Pallas) and scores each config against the stored exact-order subsample
(tests/golden/bench2m_exact.npz). The config matrix separates:

  ceiling   gc=0  mc=8192  resort=True   near-exact: sanity of everything
  ordering  gc=0  mc=8192  resort=False  cluster-gather order (fused's order)
  budget    gc=0  mc=2048  resort=False  + per-tile budget truncation
  pool      gc=4  mc=2048  resort=False  + strip/supercluster pool recall
  pool-hi   gc=4  mc=8192  resort=False  pool recall at a generous budget

Run on CPU (no TPU needed): python tools/diag2m.py [config ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import volprim_tpu as vp
from volprim_tpu.models import rf_tiled

import importlib.util as _ilu

_spec = _ilu.spec_from_file_location(
    "benchmod",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
)
_bench = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bench)

CONFIGS = {
    "ceiling": dict(gc=0, mc=8192, resort=True),
    "ordering": dict(gc=0, mc=8192, resort=False),
    "budget": dict(gc=0, mc=2048, resort=False),
    "pool": dict(gc=4, mc=2048, resort=False),
    "pool-hi": dict(gc=4, mc=8192, resort=False),
}


def main():
    names = sys.argv[1:] or list(CONFIGS)
    n2m = 2097152
    scene = _bench.make_scene(n2m)
    camera = vp.scene.CameraSpecs(
        name="bench2m", width=512, height=512,
        to_world=vp.scene.look_at([0, 0.4, -3.2], [0, 0, 0], [0, 1, 0]),
        fov=50.0,
    )
    g = np.load(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests", "golden", "bench2m_exact.npz",
        )
    )
    sel, exact = g["sel"], g["exact"].astype(np.float32)

    for name in names:
        p = CONFIGS[name]
        cfg = rf_tiled.RFTiledConfig(
            max_depth=128, tile_pixels=256, max_candidates=p["mc"],
            segment=min(256, p["mc"]), cluster_size=16, backend="xla",
            coarse_group=p["gc"], coarse_factor=8, super_group=4,
            refine_fraction=0.0, prim_resort=p["resort"],
            srgb_primitives=True,
        )
        t0 = time.time()
        state = jax.jit(lambda pr: rf_tiled.build_state(pr, cfg))(scene)
        img = rf_tiled.render_state(
            state, camera, cfg, None, spp=1, seed=jnp.int32(0), jitter=False
        )
        sub = np.asarray(img).reshape(-1, 3)[sel]
        mse = float(np.mean((sub - exact) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        print(
            f"{name:9s} gc={p['gc']} mc={p['mc']} resort={p['resort']}: "
            f"PSNR {psnr:.2f} dB  ({time.time() - t0:.0f} s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
