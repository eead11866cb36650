"""Approximation bound vs shortlist budget at 1M splats (round 5).

The truck parity experiments showed training saturates the tiled
renderer's representational bound at the CLI's flat mc2048 config
(19.40 dB: TRUE scene rendered tiled vs exact GT on the held-out
views). This probe measures the same bound at richer budgets — the
direct evidence that the bound is a BUDGET knob, not a renderer limit
(the reference anchor is exact ordering, common.py:374-562).

Usage: python tools/truck_bound.py [--cpu] [--mc 8192 ...]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--mc", type=int, nargs="*", default=[2048, 8192])
ap.add_argument("--n_splats", type=int, default=1 << 20)
ap.add_argument("--res", type=int, default=256)
ap.add_argument("--spp", type=int, default=4)
ap.add_argument("--images", default="/tmp/refine_truck/images")
args = ap.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import bench
import volprim_tpu as vp
from volprim_tpu.models import rf_tiled
from volprim_tpu.scene import CameraSpecs, look_at

scene_true = bench.make_scene(args.n_splats, "surface")


def ring_cam(name, idx, count, elev):
    ang = 2.0 * np.pi * idx / count
    pos = [3.3 * np.sin(ang), elev, -3.3 * np.cos(ang)]
    return CameraSpecs(
        name=name, width=args.res, height=args.res,
        to_world=look_at(pos, [0, 0, 0], [0, 1, 0]), fov=50.0,
    )


cams_test = [ring_cam(f"test_{i:02d}", i + 0.5, 8, 0.6) for i in range(2)]
gt = {
    c.name: np.load(os.path.join(args.images, f"{c.name}.npy"))
    for c in cams_test
}
out = {}
for mc in args.mc:
    cfg = rf_tiled.RFTiledConfig(
        max_depth=128, kernel_type="gaussian",
        tile_pixels=256, max_candidates=mc, segment=256, cluster_size=16,
        backend="xla",  # quality bound only — no Mosaic variants
        coarse_group=4, coarse_factor=16, super_group=4,
    )
    st = jax.jit(lambda p, c=cfg: rf_tiled.build_state(p, c))(scene_true)
    vals = []
    for i, cam in enumerate(cams_test):
        t0 = time.time()
        img = np.asarray(
            jax.jit(
                lambda s, c=cam, k=cfg: rf_tiled.render_state(
                    st, c, k, None, spp=args.spp, seed=s
                )
            )(jnp.int32(1000 + i))
        )
        mse = float(np.mean((img - gt[cam.name]) ** 2))
        vals.append(-10 * np.log10(max(mse, 1e-12)))
        print(f"mc{mc} {cam.name}: {vals[-1]:.2f} dB ({time.time()-t0:.0f}s)",
              flush=True)
    out[f"bound_mc{mc}_db"] = round(float(np.mean(vals)), 2)
print(json.dumps(out))
