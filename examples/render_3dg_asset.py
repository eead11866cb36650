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
parser.add_argument(
    "--renderer", choices=("exact", "tiled"), default="exact",
    help="'exact' = per-ray entry-order integrator (reference semantics); "
    "'tiled' = the tile-culled fast path (fused Pallas kernel on TPU, "
    "XLA elsewhere; 3DGS-raster-class ordering, see BENCH_DETAILS.json "
    "for the measured agreement)",
)
parser.add_argument(
    "--cluster_sort", action="store_true",
    help="tiled only: pack-time intra-cluster entry-depth sort "
    "(+~0.7 dB vs exact order at the bench scale for ~1-2 ms/frame)",
)
parser.add_argument(
    "--order_band", type=int, default=0,
    help="tiled only: banded per-ray entry-order correction — fixes "
    "stream-order inversions within +-band slots per ray (the route past "
    "the shared-axis ordering ceiling; 8-16 with --cluster_sort recovers "
    "most of the exact order). Extra per-pair cost ~ band/20 of the walk.",
)
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

if args.renderer == "tiled":
    from volprim_tpu.models import rf_tiled

    # largest <=16 divisors keep tiles square-ish on any film size
    th = max(d for d in range(1, 17) if camera.height % d == 0)
    tw = max(d for d in range(1, 17) if camera.width % d == 0)
    on_tpu = jax.default_backend() == "tpu"
    tcfg = rf_tiled.RFTiledConfig(
        max_depth=args.max_depth, kernel_type=args.kernel,
        tile_pixels=th * tw, tile_shape=(th, tw),
        max_candidates=2048, segment=256, cluster_size=16,
        use_clusters=True, early_exit=True,
        backend="fused" if on_tpu else "xla",
        kernel_compact=on_tpu, feat_major=on_tpu,
        cluster_sort=on_tpu and args.cluster_sort,
        order_band=args.order_band,
        coarse_group=4, coarse_factor=8, super_group=4,
        kernel_batch=4,
    )
    state = jax.jit(lambda p: rf_tiled.build_state(p, tcfg))(scene)
    render = jax.jit(
        lambda st: rf_tiled.render_state(
            st, camera, tcfg, emitter, spp=args.spp, seed=0
        )
    )
    with vp.benchmark.single_run("Rendering (tiled)"):
        img = render(state)
else:
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
