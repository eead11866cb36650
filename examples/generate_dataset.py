"""Generate a synthetic 3DGS/NeRF training dataset from a primitive scene.

TPU-native counterpart of ``/root/reference/scripts/3dgs_input_generation/
data_generation.py`` + ``generate_dataset.ipynb``: icosphere camera rigs
around a scene, rendered train/test splits, Instant-NGP transforms json and
a seed point cloud.
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import argparse

import jax

import volprim_tpu as vp
from volprim_tpu.models import rf
from volprim_tpu.tooling import dataset

parser = argparse.ArgumentParser(description="Generate 3DGS training dataset")
parser.add_argument("--ply", type=str, required=True, help="3DGS PLY scene")
parser.add_argument("--output", type=str, required=True)
parser.add_argument("--resolution", type=int, default=256)
parser.add_argument("--radius", type=float, default=4.0)
parser.add_argument("--fov", type=float, default=45.0)
parser.add_argument("--subdivisions", type=int, default=1)
parser.add_argument("--test_fraction", type=float, default=0.15)
parser.add_argument("--spp", type=int, default=8)
parser.add_argument("--max_depth", type=int, default=64)
parser.add_argument("--points", type=int, default=100000)
args = parser.parse_args()

prims = vp.scene.load_ply(args.ply)
print(f"Loaded {prims.num_prims} primitives")

import numpy as np

center = np.asarray(prims.centers).mean(axis=0)
cams = dataset.icosphere_rig(
    center, args.radius, width=args.resolution, height=args.resolution,
    fov=args.fov, subdivisions=args.subdivisions,
)
n_test = max(1, int(len(cams) * args.test_fraction))
train_cams, test_cams = cams[n_test:], cams[:n_test]
print(f"{len(train_cams)} train / {len(test_cams)} test cameras")

cfg = rf.RFConfig(max_depth=args.max_depth)


def render_fn(cam, i):
    return vp.models.render(prims, cam, rf.radiance, cfg, None, spp=args.spp, seed=i)


pc = dataset.sample_point_cloud(prims, args.points, jax.random.PRNGKey(0))
dataset.generate(args.output, render_fn, train_cams, test_cams, point_cloud=pc)
print(f"Dataset written to {args.output}")
