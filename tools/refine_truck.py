"""Truck-scale training parity pipeline (round-4 directive #6).

The reference's acceptance surface for refine_3dg_dataset is real photos
(/root/reference/examples/refine_3dg_dataset.py:111-117); the snapshot's
large photo datasets are stripped, so this is the honest stand-in: a
framework-generated dataset (ground-truth views rendered by the EXACT
integrator), a perturbed >=1M-splat initial asset, training through the
tiled renderer via the actual CLI (examples/refine_3dg_dataset.py
--renderer tiled --images ...), and a held-out-view PSNR evaluated by the
exact renderer at EQUAL spp.

Writes REFINE_TRUCK.json at the repo root; bench.py folds it into
BENCH_DETAILS.json as the ``refine_truck`` block.

Usage:
  python tools/refine_truck.py                # 1M splats, TPU-sized
  python tools/refine_truck.py --tiny         # CPU smoke (seconds)
"""

import argparse
import json
import os
import runpy
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)

parser = argparse.ArgumentParser()
parser.add_argument("--n_splats", type=int, default=1 << 20)
parser.add_argument("--res", type=int, default=256)
parser.add_argument("--train_cams", type=int, default=8)
parser.add_argument("--test_cams", type=int, default=2)
parser.add_argument("--spp", type=int, default=4, help="GT + eval spp")
parser.add_argument("--iterations", type=int, default=256)
parser.add_argument("--workdir", type=str, default="/tmp/refine_truck")
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--tiny", action="store_true",
                    help="CPU smoke: 4096 splats, 64^2, 8 iters")
parser.add_argument(
    "--perturb", choices=("mild", "strong"), default="mild",
    help="initial-asset corruption severity. 'mild' (round-4 design) "
    "left the held-out gap (25.2 dB init) SMALLER than the tiled-vs-"
    "exact renderer gap at 1M splats, so cross-renderer eval could not "
    "show the training win; 'strong' scrambles appearance hard enough "
    "that recovery dominates the approximation bound")
args = parser.parse_args()

if args.tiny:
    args.n_splats, args.res, args.iterations = 4096, 64, 8
    args.train_cams, args.test_cams, args.spp = 3, 1, 2
    args.cpu = True

if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import numpy as np
import jax.numpy as jnp

import volprim_tpu as vp
from volprim_tpu.models import rf
from volprim_tpu.scene import CameraSpecs, EllipsoidScene, look_at

sys.path.insert(0, _repo)
import bench  # make_scene: the bench family's 3DGS-like surface shell

t_all = time.time()
os.makedirs(args.workdir, exist_ok=True)
img_dir = os.path.join(args.workdir, "images")
os.makedirs(img_dir, exist_ok=True)

# ---- ground-truth scene + cameras ----------------------------------------
scene_true = bench.make_scene(args.n_splats, "surface")
rng = np.random.default_rng(42)


def ring_cam(name, idx, count, elev=0.35):
    ang = 2.0 * np.pi * idx / count
    pos = [3.3 * np.sin(ang), elev, -3.3 * np.cos(ang)]
    return CameraSpecs(
        name=name, width=args.res, height=args.res,
        to_world=look_at(pos, [0, 0, 0], [0, 1, 0]), fov=50.0,
    )


cams_train = [
    ring_cam(f"train_{i:02d}", i, args.train_cams)
    for i in range(args.train_cams)
]
# held-out views: offset half a step on the same ring + different elevation
cams_test = [
    ring_cam(f"test_{i:02d}", i + 0.5, args.train_cams, elev=0.6)
    for i in range(args.test_cams)
]

ecfg = rf.RFConfig(max_depth=128, kernel_type="gaussian", chunk_size=2048)

# Block-streamed exact renderer: the monolithic [res^2 x spp] exact graph
# at 1M splats CRASHED the TPU tunnel worker (first queue run, 13:19Z) —
# stream fixed 16384-ray blocks through one jitted radiance instead (the
# bench exact-golden pattern). Box-filter semantics: each jittered sample
# lands in its own pixel, so blocks are separable and the average over
# spp seeds is the same estimator vp.models.render computes.
_BLK = 16384


def _exact_image(scene_eval, cam, seed):
    from volprim_tpu.models.base import _film_coords, rays_from_pixels

    h, w = cam.height, cam.width
    jrad = jax.jit(
        lambda o_, d_, k_: rf.radiance(scene_eval, None, o_, d_, ecfg, k_)
    )
    acc = np.zeros((h * w, 3), np.float32)
    base = jax.random.PRNGKey(seed)
    for s in range(args.spp):
        kf, kr = jax.random.split(jax.random.fold_in(base, s))
        px, py = _film_coords(cam, kf, jitter=True)
        o, d = rays_from_pixels(cam, px, py)
        for b0 in range(0, h * w, _BLK):
            sl = slice(b0, min(b0 + _BLK, h * w))
            acc[sl] += np.asarray(jrad(o[sl], d[sl], kr))
    return (acc / args.spp).reshape(h, w, 3)


def render_exact(cam, seed):
    return _exact_image(scene_true, cam, seed)


print(f"[refine_truck] GT: {args.n_splats} splats, "
      f"{args.train_cams}+{args.test_cams} cams at {args.res}^2, "
      f"spp {args.spp}", flush=True)
gt = {}
for i, cam in enumerate(cams_train + cams_test):
    t0 = time.time()
    # GT views are deterministic in (scene seed, camera, view seed):
    # resume from disk across queue retries — the tunnel died mid-GT
    # once and re-rendering ~5.4 min/view is the dominant retry cost
    path = os.path.join(img_dir, f"{cam.name}.npy")
    if os.path.exists(path):
        cached = np.load(path)
        # validate the resolution — a --tiny smoke shares the default
        # workdir and its 64^2 views must never satisfy a full run
        # (retry2 died on exactly that shape mismatch)
        if cached.shape == (args.res, args.res, 3):
            gt[cam.name] = cached
            print(f"  GT {cam.name}: cached", flush=True)
            continue
    img = render_exact(cam, i)
    gt[cam.name] = img
    np.save(path, img)
    print(f"  GT {cam.name}: {time.time() - t0:.1f}s "
          f"mean={img.mean():.4f}", flush=True)

# ---- perturbed initial asset ----------------------------------------------
# The training signal must do real work: scramble appearance (opacity +
# SH), keep geometry (the reference's refine also trains appearance-first:
# centers_lr defaults to 0).
op = np.asarray(scene_true.attrs["opacities"])
sh = np.asarray(scene_true.attrs["sh_coeffs"])
if args.perturb == "strong":
    op_p = np.clip(
        op * rng.uniform(0.05, 0.5, op.shape).astype(np.float32),
        1e-4, 0.995,
    )
    sh_p = sh * rng.uniform(0.0, 0.6, sh.shape).astype(np.float32) \
        + rng.normal(0, 0.6, sh.shape).astype(np.float32)
else:
    op_p = np.clip(
        op * rng.uniform(0.15, 0.9, op.shape).astype(np.float32),
        1e-4, 0.995,
    )
    sh_p = sh * rng.uniform(0.2, 1.0, sh.shape).astype(np.float32) \
        + rng.normal(0, 0.25, sh.shape).astype(np.float32)
scene_init = EllipsoidScene(
    centers=scene_true.centers, scales=scene_true.scales,
    quats=scene_true.quats,
    attrs={**scene_true.attrs, "opacities": jnp.asarray(op_p),
           "sh_coeffs": jnp.asarray(sh_p)},
    extent=scene_true.extent,
)
ply_path = os.path.join(args.workdir, "init.ply")
vp.scene.save_ply(scene_init, ply_path)
cam_path = os.path.join(args.workdir, "cameras.json")
vp.cameras.JSONCameraSpecsIO.write(cams_train, cam_path)

# initial quality on the held-out views (the gap training must close)
def heldout_psnr(scene_eval, tag):
    vals = []
    for i, cam in enumerate(cams_test):
        img = _exact_image(scene_eval, cam, 1000 + i)
        mse = float(np.mean((img - gt[cam.name]) ** 2))
        vals.append(-10 * np.log10(max(mse, 1e-12)))
    p = float(np.mean(vals))
    print(f"[refine_truck] held-out PSNR ({tag}): {p:.2f} dB", flush=True)
    return p


def heldout_psnr_tiled(scene_eval, tag):
    """Same-renderer protocol: the reference's acceptance PSNR renders
    with the integrator it trained (refine_3dg_dataset.py:202) — here
    the tiled trainer config. Isolates training quality from the tiled-
    vs-exact approximation bound that dominates cross-renderer eval at
    1M splats."""
    from volprim_tpu.models import rf_tiled

    tcfg = rf_tiled.RFTiledConfig(
        max_depth=128, kernel_type="gaussian",
        tile_pixels=256, max_candidates=2048, segment=256,
        cluster_size=16, backend="fused", early_exit=True,
        coarse_group=4, coarse_factor=8, super_group=4, kernel_batch=4,
    )
    st = jax.jit(lambda p: rf_tiled.build_state(p, tcfg))(scene_eval)
    vals = []
    for i, cam in enumerate(cams_test):
        img = np.asarray(
            jax.jit(
                lambda s, c=cam: rf_tiled.render_state(
                    st, c, tcfg, None, spp=args.spp, seed=s
                )
            )(jnp.int32(1000 + i))
        )
        mse = float(np.mean((img - gt[cam.name]) ** 2))
        vals.append(-10 * np.log10(max(mse, 1e-12)))
    p = float(np.mean(vals))
    print(f"[refine_truck] held-out PSNR tiled ({tag}): {p:.2f} dB",
          flush=True)
    return p


psnr_init = heldout_psnr(scene_init, "initial")

# ---- train via the actual CLI ---------------------------------------------
out_dir = os.path.join(args.workdir, "out")

# Resume: a previous run trained all iterations and saved the refined
# asset, then the TPU worker died on the CLI's final preview render —
# don't retrain, just evaluate (the asset is validated by splat count;
# a --tiny smoke's 4096-splat asset can share the workdir).
_asset_dir = os.path.join(out_dir, "refined_asset")
_resume = False
if os.path.exists(os.path.join(_asset_dir, "primitives.ply")):
    try:
        _prev = vp.scene.load_asset(_asset_dir)["primitives"]
        _resume = _prev.num_prims == args.n_splats
    except Exception:
        _resume = False
if _resume:
    print("[refine_truck] refined asset found on disk — skipping training",
          flush=True)

t_train = time.time()
sys.argv = [
    "refine_3dg_dataset.py",
    "--ply", ply_path,
    "--cameras", cam_path,
    "--images", img_dir,
    "--output", out_dir,
    "--cam_count", str(args.train_cams),
    "--cam_scale", "1.0",
    "--kernel", "gaussian",
    "--renderer", "tiled",
    "--iterations", str(args.iterations),
    "--opt_spp", "1",
    "--ref_spp", str(args.spp),
    "--max_depth", "128",
    "--write_image_every", "1000000",
]
if not _resume:
    runpy.run_path(
        os.path.join(_repo, "examples", "refine_3dg_dataset.py"),
        run_name="__main__",
    )
train_s = time.time() - t_train

# ---- evaluate the trained asset with the EXACT renderer at equal spp ------
refined = vp.scene.load_asset(
    os.path.join(out_dir, "refined_asset")
)["primitives"]
psnr_final = heldout_psnr(refined, "refined")
# the ceiling: GT re-rendered with a different seed at the same spp (pure
# Monte Carlo noise floor of the evaluation itself)
psnr_noise = heldout_psnr(scene_true, "gt-reseeded noise floor")
# same-renderer protocol (reference refine_3dg_dataset.py:202): tiled
# renders vs the GT photos stand-in — cheap (ms per view)
psnr_init_t = heldout_psnr_tiled(scene_init, "initial")
psnr_final_t = heldout_psnr_tiled(refined, "refined")
psnr_true_t = heldout_psnr_tiled(scene_true, "true scene (approx bound)")

block = {
    "n_splats": int(args.n_splats),
    "res": int(args.res),
    "train_cams": args.train_cams,
    "test_cams": args.test_cams,
    "spp": args.spp,
    "iterations": args.iterations,
    "renderer": "tiled",
    "perturb": args.perturb,
    "heldout_psnr_init_db": round(psnr_init, 2),
    "heldout_psnr_refined_db": round(psnr_final, 2),
    "heldout_psnr_noise_floor_db": round(psnr_noise, 2),
    "heldout_psnr_init_tiled_db": round(psnr_init_t, 2),
    "heldout_psnr_refined_tiled_db": round(psnr_final_t, 2),
    "heldout_psnr_true_tiled_db": round(psnr_true_t, 2),
    "train_wall_s": round(train_s, 1),
    "total_wall_s": round(time.time() - t_all, 1),
    # resumed runs evaluate a previously-trained asset (train_wall_s is
    # then not the training cost; the interrupted run's log has it)
    **({"train_resumed": True} if _resume else {}),
}
# tiny mode is a smoke test: keep its numbers out of the ledgered block
out_json = (
    os.path.join(args.workdir, "REFINE_TRUCK.json") if args.tiny
    else os.path.join(_repo, "REFINE_TRUCK.json")
)
# keyed by perturb severity so both experiments stay on record (an older
# flat-format file becomes the "mild" entry)
data = {}
if os.path.exists(out_json):
    try:
        with open(out_json) as f:
            data = json.load(f)
        if "n_splats" in data:  # legacy flat block
            data = {data.get("perturb", "mild"): data}
    except Exception:
        data = {}
data[args.perturb] = block
with open(out_json, "w") as f:
    json.dump(data, f, indent=1)
print(f"[refine_truck] {json.dumps(block)}", flush=True)
