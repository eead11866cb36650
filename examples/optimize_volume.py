"""Tomographic reconstruction of an absorbing volume with primitives.

TPU-native counterpart of ``/root/reference/examples/optimize_volume.py``:
the full inverse pipeline — ring of randomized cameras, grid-volume reference
renders, a volprim_count^3 Gaussian-lattice init, a jitted batch-sensor
optimization loop (tomography adjoint + BoundedAdam with per-key learning
rates and bounds), pruning, asset export, PSNR + loss plots.

The snapshot's smoke.vol is stripped (.MISSING_LARGE_BLOBS); without
--volume_grid a procedural plume stands in.
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import argparse
import os
from os.path import join

import jax
import jax.numpy as jnp
import numpy as np

import volprim_tpu as vp
from volprim_tpu.models import gridvol, tomography
from volprim_tpu.scene import CameraSpecs, EllipsoidScene
from volprim_tpu.scene.cameras import look_at, rotate_x, rotate_y

parser = argparse.ArgumentParser(
    description="Optimize volumetric primitives from 3D grid"
)
parser.add_argument("--output", type=str, required=True)
parser.add_argument("--volume_grid", type=str, default=None, help=".vol file")
parser.add_argument("--cam_count", type=int, default=8)
parser.add_argument("--cam_res", type=int, default=256)
parser.add_argument("--ref_spp", type=int, default=32)
parser.add_argument(
    "--ref_mode", type=str, default="scattering",
    choices=["scattering", "absorption"],
    help="ground-truth renderer: 'scattering' matches the reference's "
    "prbvolpath + heterogeneous medium (optimize_volume.py:91-122); "
    "'absorption' is the round-1 transmittance-only marcher",
)
parser.add_argument("--ref_albedo", type=float, default=0.6,
                    help="medium albedo for scattering refs (:107)")
parser.add_argument("--opt_spp", type=int, default=1)
parser.add_argument("--grad_spp", type=int, default=0,
                    help="adjoint spp (mi.render spp_grad, :233); 0 = opt_spp")
parser.add_argument("--max_depth", type=int, default=-1)
parser.add_argument("--kernel", type=str, default="gaussian")
parser.add_argument("--iterations", type=int, default=64)
parser.add_argument("--volprim_count", type=int, default=16)
parser.add_argument("--init_albedo", type=float, default=0.9)
parser.add_argument("--init_sigmat", type=float, default=0.0001)
parser.add_argument("--no_prune", action="store_true")
parser.add_argument("--write_image_every", type=int, default=4)
parser.add_argument("--global_lr", type=float, default=1.0)
parser.add_argument("--centers_lr", type=float, default=0.015)
parser.add_argument("--scales_lr", type=float, default=0.0001)
parser.add_argument("--quats_lr", type=float, default=0.0001)
parser.add_argument("--sigmat_lr", type=float, default=0.0001)
parser.add_argument("--albedo_lr", type=float, default=0.0)
args = parser.parse_args()

os.makedirs(args.output, exist_ok=True)
os.makedirs(join(args.output, "frames"), exist_ok=True)

# Cameras: ring with randomized elevation (reference :69-87) -----------------
np.random.seed(0)
cameras = []
for i in range(args.cam_count):
    angle = 180.0 / args.cam_count * i - 90.0
    to_world = (
        rotate_y(angle)
        @ rotate_x(90.0 * np.random.rand() - 45.0)
        @ look_at(origin=[0, 0, 4], target=[0, 0, 0], up=[0, 1, 0])
    )
    cameras.append(
        CameraSpecs(
            name=f"cam_{i:04d}", width=args.cam_res, height=args.cam_res,
            to_world=to_world, fov=40.0,
        )
    )

# Reference images (reference :91-124) ---------------------------------------
grid = (
    vp.scene.load_vol(args.volume_grid)
    if args.volume_grid
    else vp.scene.procedural_smoke()
)
gcfg = gridvol.GridVolumeConfig(sigma_scale=5.0, albedo=args.ref_albedo)
grid_t = gridvol.transform_grid(grid, gcfg)
emitter = vp.ops.envmap.ConstantEmitter(radiance=jnp.ones(3))

print(f"Rendering reference images ({args.ref_mode}):")
ref_fn = (
    gridvol.radiance_scattering
    if args.ref_mode == "scattering"
    else gridvol.radiance
)
ref_image = jnp.clip(
    vp.models.render_batch(
        grid_t, cameras, ref_fn, gcfg, emitter, spp=args.ref_spp
    ),
    0.0, 1.0,
)
vp.utils.image.write_image(join(args.output, "reference.png"), ref_image)
vp.utils.image.write_image(join(args.output, "reference.exr"), ref_image)

# Initialize primitive lattice (reference :128-158) ---------------------------
prims = vp.scene.lattice_init(
    args.volprim_count, args.init_sigmat, args.init_albedo
)
cfg = tomography.TomographyConfig(
    max_depth=args.max_depth, kernel_type=args.kernel
)

init_img = vp.models.render_batch(
    prims, cameras, tomography.radiance, cfg, emitter, spp=args.ref_spp
)
vp.utils.image.write_image(join(args.output, "initial.png"), init_img)

# Optimizer (reference :192-229) ----------------------------------------------
opt = vp.optimizers.BoundedAdam()
opt.set_learning_rate(
    {
        "centers": args.global_lr * args.centers_lr,
        "scales": args.global_lr * args.scales_lr,
        "quats": args.global_lr * args.quats_lr,
        "sigmat": args.global_lr * args.sigmat_lr,
        "albedo": args.global_lr * args.albedo_lr,
    }
)
opt.set_bounds("scales", lower=1e-6)
opt.set_bounds("sigmat", lower=1e-8, upper=1e-3)
opt.set_bounds("albedo", lower=1e-8, upper=1.0)

params = {
    "centers": prims.centers,
    "scales": prims.scales,
    "quats": prims.quats,
    "sigmat": prims.attrs["sigma_t"],
    "albedo": prims.attrs["albedo"],
}
opt_state = opt.init(params)


def to_scene(p) -> EllipsoidScene:
    return EllipsoidScene(
        centers=p["centers"], scales=p["scales"], quats=p["quats"],
        attrs={"sigma_t": p["sigmat"], "albedo": p["albedo"]},
        extent=prims.extent,
    )


@jax.jit
def train_step(p, state, seed):
    def loss_fn(p):
        if args.grad_spp and args.grad_spp != args.opt_spp:
            fr = vp.models.render_with_spp_grad(
                cameras, tomography.radiance, cfg, emitter,
                spp=args.opt_spp, spp_grad=args.grad_spp, seed=seed,
            )
            img = fr(to_scene(p))
        else:
            img = vp.models.render_batch(
                to_scene(p), cameras, tomography.radiance, cfg, emitter,
                spp=args.opt_spp, seed=seed,
            )
        return vp.optimizers.l1(ref_image, img), img

    (loss, img), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
    psnr = vp.optimizers.psnr(ref_image, img)
    p, state = opt.step(p, grads, state)
    return p, state, loss, psnr, img


# Optimize! (reference :232-249) ----------------------------------------------
print("Run optimization:")
loss_list, psnr_list = [], []
for it in range(args.iterations):
    params, opt_state, loss, psnr, img = train_step(params, opt_state, it)
    loss_list.append(float(loss))
    psnr_list.append(float(psnr))
    if (it + 1) % args.write_image_every == 0:
        vp.utils.image.write_image(
            join(args.output, "frames", f"image_{it:04d}.png"), img
        )
    print(
        f"-- step {it + 1}/{args.iterations} | psnr={psnr_list[-1]:.4f} "
        f"| loss={loss_list[-1]:.4f}",
        end="\r",
    )
print("\nDone with optimization")

# Prune (reference :256-269) --------------------------------------------------
result = to_scene(params)
if not args.no_prune:
    valid = (params["sigmat"][:, 0] > 1e-6) & jnp.all(
        params["scales"] > 1e-4, axis=-1
    )
    idx = jnp.nonzero(valid)[0]
    print(
        f"Pruning {result.num_prims - idx.shape[0]} volumetric primitives "
        f"out of {result.num_prims}"
    )
    result = result.select(idx)

# Save results (reference :273-294) -------------------------------------------
final = vp.models.render_batch(
    result, cameras, tomography.radiance, cfg, emitter, spp=args.ref_spp
)
vp.utils.image.write_image(join(args.output, "optimized.png"), final)
vp.utils.image.write_image(join(args.output, "optimized.exr"), final)
vp.scene.save_asset(
    join(args.output, "optimized_asset"), result, cameras,
    integrator={"type": "volprim_tomography", "max_depth": args.max_depth},
    emitters={"environment": {"type": "constant"}},
)
print(f"PSNR: {float(vp.optimizers.psnr(ref_image, final)):.4f}")

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

for data, label in ((loss_list, "Loss"), (psnr_list, "PSNR")):
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.plot(data)
    ax.set_xlabel("Iteration")
    plt.ylabel(label)
    plt.title(label + " plot")
    plt.savefig(join(args.output, f"{label.lower()}.png"))
    plt.close(fig)
