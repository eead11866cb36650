"""Render a 3DGS asset (PLY + cameras.json) with the rf integrator.

TPU-native counterpart of ``/root/reference/examples/render_3dg_asset.py``:
same CLI surface (--ply/--cameras/--cam_index/--cam_scale/--spp/--max_depth/
--rr_depth/--kernel/--white_background), rendering through
``volprim_tpu.models.rf`` instead of Mitsuba's plugin stack.

Example:
    python examples/render_3dg_asset.py --ply point_cloud.ply \
        --cameras cameras.json --spp 2 --max_depth 128
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import argparse
import os

import jax
import jax.numpy as jnp

import volprim_tpu as vp
from volprim_tpu.models import rf

parser = argparse.ArgumentParser(description="Render 3DG asset")
parser.add_argument("--ply", type=str, required=True, help="Path to PLY 3DG file")
parser.add_argument("--cameras", type=str, required=True, help="Path to cameras.json")
parser.add_argument("--output", type=str, default="output", help="Output folder")
parser.add_argument("--cam_index", type=int, default=0)
parser.add_argument("--cam_scale", type=float, default=1.0)
parser.add_argument("--spp", type=int, default=2)
parser.add_argument("--max_depth", type=int, default=128)
parser.add_argument("--rr_depth", type=int, default=128)
parser.add_argument("--kernel", type=str, default="gaussian")
parser.add_argument("--white_background", action="store_true")
args = parser.parse_args()

scene = vp.scene.load_ply(args.ply)
print(f"Loaded {scene.num_prims} primitives from {args.ply}")

cam_specs = vp.cameras.JSONCameraSpecsIO.load(args.cameras)
camera = cam_specs[args.cam_index].scaled(args.cam_scale)
print(f"Camera {camera.name}: {camera.width}x{camera.height}")

cfg = rf.RFConfig(
    max_depth=args.max_depth,
    rr_depth=args.rr_depth,
    kernel_type=args.kernel,
)
emitter = (
    vp.ops.envmap.ConstantEmitter(radiance=jnp.ones(3))
    if args.white_background
    else None
)

render = jax.jit(
    lambda prims: vp.models.render(
        prims, camera, rf.radiance, cfg, emitter, spp=args.spp, seed=0
    )
)
with vp.benchmark.single_run("Rendering"):
    img = render(scene)

os.makedirs(args.output, exist_ok=True)
out = os.path.join(args.output, "output.exr")
print(f"Writing rendered image to {out}")
vp.utils.image.write_image(out, img)
vp.utils.image.write_image(os.path.join(args.output, "output.png"), img)
