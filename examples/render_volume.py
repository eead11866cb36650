"""Render a volumetric-primitive asset with the PRB path tracer.

TPU-native counterpart of ``/root/reference/examples/render_volume.py``:
smoke.ply under an environment map, volprim_prb with NEE. The reference's
qwantani envmap EXR is stripped from the snapshot (.MISSING_LARGE_BLOBS), so
``--envmap`` falls back to a procedural dusk sky.
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import argparse
import os

import jax

import volprim_tpu as vp
from volprim_tpu.models import prb

parser = argparse.ArgumentParser(description="Render volume")
parser.add_argument("--output", type=str, default="smoke.exr")
parser.add_argument(
    "--volume", type=str, default="/root/reference/resources/smoke.ply"
)
parser.add_argument("--envmap", type=str, default=None, help="EXR/npy envmap")
parser.add_argument("--sigmat_scale", type=float, default=10.0)
parser.add_argument("--spp", type=int, default=64)
parser.add_argument("--max_depth", type=int, default=-1)
parser.add_argument("--width", type=int, default=512)
parser.add_argument("--height", type=int, default=512)
parser.add_argument(
    "--auto_budget", action="store_true",
    help="size collect_budget/max_windows from the measured per-ray "
    "interval-need distribution (prb.suggest_budgets) instead of the "
    "defaults — the need-fit discipline of the rf budget ladder",
)
parser.add_argument(
    "--walk_backend", type=str, default="xla", choices=["xla", "pallas"],
    help="free-flight window-walk backend: 'pallas' runs the fused "
    "VMEM-resident kernel (pallas_kernels/ffwalk.py)",
)
args = parser.parse_args()

scene = vp.scene.load_ply(args.volume)
scene.attrs["sigma_t"] = scene.attrs["sigma_t"] * args.sigmat_scale
print(f"Loaded {scene.num_prims} primitives")

if args.envmap:
    if args.envmap.endswith(".exr"):
        data = vp.utils.image.read_exr(args.envmap)
    else:
        import numpy as np

        data = np.load(args.envmap)
    emitter = vp.ops.envmap.EnvironmentMap.from_array(data)
else:
    emitter = vp.ops.envmap.procedural_sky()

# Camera from the reference scene dict (render_volume.py:37-62).
camera = vp.scene.CameraSpecs(
    name="cam",
    width=args.width,
    height=args.height,
    to_world=vp.scene.look_at(
        origin=[-3.98825, -0.306404, -1.74332e-07],
        target=[-2.99119, -0.229803, -1.30749e-07],
        up=[-0.076601, 0.997062, -3.34833e-09],
    ),
    fov=40.0,
)

cfg = prb.PRBConfig(
    max_depth=args.max_depth, walk_backend=args.walk_backend
)
if args.auto_budget:
    o_c, d_c = vp.scene.generate_rays(camera, jitter=False)
    cfg = prb.suggest_budgets(scene, o_c, d_c, cfg)
    print(
        f"auto budgets: collect_budget={cfg.collect_budget} "
        f"max_windows={cfg.max_windows} (p99.9 of measured per-ray need)"
    )
render = jax.jit(
    lambda prims: vp.models.render(
        prims, camera, prb.radiance, cfg, emitter, spp=args.spp, seed=0
    )
)
with vp.benchmark.single_run("Rendering"):
    img = render(scene)

print(f"Writing rendered image to {args.output}")
vp.utils.image.write_image(args.output, img)
if args.output.endswith(".exr"):
    vp.utils.image.write_image(os.path.splitext(args.output)[0] + ".png", img)
