"""Render a saved volprim_tpu asset directory.

TPU-native counterpart of ``/root/reference/examples/render_asset.py``.
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

parser = argparse.ArgumentParser(description="Render a saved asset")
parser.add_argument("asset", type=str, help="Path to the asset directory")
parser.add_argument("--cam_index", type=int, default=0)
parser.add_argument("--cam_scale", type=float, default=1.0)
parser.add_argument("--spp", type=int, default=4)
parser.add_argument("--output", type=str, default="output.exr")
args = parser.parse_args()

# Auto-detect the asset flavor: the reference toolchain writes importable
# Python modules (volprim/io.py:87-273), this framework's native format is
# scene.json (vp.io). Both render through the same pipeline.
if os.path.exists(os.path.join(args.asset, "__init__.py")):
    from volprim_tpu.scene import asset_interop

    ref = asset_interop.load_reference_asset(args.asset)
    prims = ref["primitives"]
    if prims is None:
        raise SystemExit(
            f"{args.asset}: no ellipsoid object found in the asset's "
            "OBJECTS dictionary — nothing to render"
        )
    cams = ref["cameras"] or [
        vp.scene.CameraSpecs(
            name="default", width=512, height=512,
            to_world=vp.scene.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]),
            fov=45.0,
        )
    ]
    camera = cams[args.cam_index].scaled(args.cam_scale)
    integ = dict(ref["raw"].get("integrator") or {})
    name = ref["integrator"] or "volprim_tomography"
    cfg_cls = vp.models.CONFIGS[name]
    cfg = cfg_cls(**{
        k: v for k, v in integ.items()
        if k in cfg_cls.__dataclass_fields__
    })
    radiance_fn = vp.models.REGISTRY[name]
    emitter = ref["emitter"]
else:
    asset = vp.io.load_asset(args.asset)
    prims = asset["primitives"]
    camera = asset["cameras"][args.cam_index].scaled(args.cam_scale)

    integ = dict(asset["integrator"])
    name = integ.pop("type", "volprim_tomography")
    cfg_cls = vp.models.CONFIGS[name]
    cfg = cfg_cls(**{k: v for k, v in integ.items() if k in cfg_cls.__dataclass_fields__})
    radiance_fn = vp.models.REGISTRY[name]

    emitters = asset["emitters"]
    emitter = None
    if emitters:
        spec = next(iter(emitters.values()))
        if spec.get("type") == "constant":
            emitter = vp.ops.envmap.ConstantEmitter(
                radiance=jnp.full((3,), float(spec.get("radiance", 1.0)))
            )
        elif spec.get("type") == "envmap" and spec.get("array") in asset["arrays"]:
            emitter = vp.ops.envmap.EnvironmentMap.from_array(
                asset["arrays"][spec["array"]]
            )

render = jax.jit(
    lambda p: vp.models.render(
        p, camera, radiance_fn, cfg, emitter, spp=args.spp, seed=0
    )
)
with vp.benchmark.single_run("Rendering"):
    img = render(prims)

print(f"Writing rendered image to {args.output}")
vp.utils.image.write_image(args.output, img)
if args.output.endswith(".exr"):
    vp.utils.image.write_image(os.path.splitext(args.output)[0] + ".png", img)
