"""Recover vertex BSDF attributes with the radiosity-equation loss.

TPU-native replacement for the reference's radiosity driver notebook
(``/root/reference/scripts/radiosity/run.ipynb``): build a synthetic mesh
scene with known ("ground truth") vertex BSDF attributes under an
environment light, pathtrace it into a :class:`RadianceCache`, then fit
*trainable* vertex attributes from a flat initialization by minimizing the
radiosity residual (radiance_cache.py:585-698)

    || Lo(x, wo) - Le(x) - (1/W) sum_i Li(x, wi_i) f(x, wi_i -> wo) ||^2

with gradients flowing only into the BSDF attributes. Prints the attribute
recovery error per iteration; writes the optimized attributes as .npz.
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from volprim_tpu import optim
from volprim_tpu.ops import bsdf as bsdf_ops
from volprim_tpu.ops import envmap
from volprim_tpu.scene import mesh as mesh_mod
from volprim_tpu.tooling import radiance_cache as rc

parser = argparse.ArgumentParser(description="Fit vertex BSDF attributes")
parser.add_argument("--output", type=str, default="radiosity_fit")
parser.add_argument("--iterations", type=int, default=60)
parser.add_argument("--num_points", type=int, default=64)
parser.add_argument("--num_wi", type=int, default=96)
parser.add_argument("--num_wo", type=int, default=1)
parser.add_argument("--lr", type=float, default=2e-2)
parser.add_argument("--bsdf", type=str, default="diffuse",
                    choices=["diffuse", "principled"])
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()

if args.cpu:
    jax.config.update("jax_platforms", "cpu")


def build_scene(model):
    """Ground-truth scene: a two-tone floor + a colored icosphere under the
    procedural sky (the run.ipynb synthetic recovery experiment)."""
    floor_a = mesh_mod.make_rect(
        [-1.5, 0.0, 0.0], [1.5, 0, 0], [0, 0, -3.0],
        attrs={"base_color": [0.8, 0.25, 0.2], "roughness": [0.8],
               "metallic": [0.0]},
    )
    floor_b = mesh_mod.make_rect(
        [1.5, 0.0, 0.0], [1.5, 0, 0], [0, 0, -3.0],
        attrs={"base_color": [0.2, 0.35, 0.8], "roughness": [0.4],
               "metallic": [0.0]},
    )
    ball = mesh_mod.make_icosphere(
        [0.0, 0.8, 0.0], 0.7, subdiv=1,
        attrs={"base_color": [0.25, 0.7, 0.3], "roughness": [0.5],
               "metallic": [0.3]},
    )
    m = mesh_mod.merge([floor_a, floor_b, ball])
    if isinstance(model, bsdf_ops.Diffuse):
        m.attrs.pop("roughness")
        m.attrs.pop("metallic")
    return m


def main():
    model = (
        bsdf_ops.Diffuse() if args.bsdf == "diffuse"
        else bsdf_ops.Principled(has_metallic=True)
    )
    mesh_gt = build_scene(model)
    em = envmap.procedural_sky(h=32, w=64)
    cache = rc.RadianceCache(
        emitter=em, mesh=mesh_gt, bsdf=model, integrator="prb",
    )

    # trainable attributes: flat init
    nv = mesh_gt.num_vertices
    train_attrs = {"base_color": jnp.full((nv, 3), 0.5)}
    if args.bsdf == "principled":
        train_attrs["roughness"] = jnp.full((nv, 1), 0.6)
        train_attrs["metallic"] = jnp.full((nv, 1), 0.1)

    opt = optim.BoundedAdam(lr=args.lr)
    for k in train_attrs:
        opt.set_bounds(k, lower=1e-3, upper=1.0 - 1e-3)
    state = opt.init(train_attrs)

    @jax.jit
    def step(params, st, key):
        def loss_fn(p):
            return rc.compute_loss(
                cache, mesh_gt, p, model, key,
                num_points=args.num_points, num_wi=args.num_wi,
                num_wo=args.num_wo,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, st = opt.step(params, grads, st)
        return params, st, loss

    key = jax.random.PRNGKey(args.seed)
    for it in range(args.iterations):
        train_attrs, state, loss = step(
            train_attrs, state, jax.random.fold_in(key, it)
        )
        err = float(jnp.mean(jnp.abs(
            train_attrs["base_color"] - mesh_gt.attrs["base_color"]
        )))
        if it % 5 == 0 or it == args.iterations - 1:
            print(
                f"iter {it:3d}  loss {float(loss):.5f}  "
                f"base_color MAE {err:.4f}", flush=True,
            )

    out = {k: np.asarray(v) for k, v in train_attrs.items()}
    np.savez(args.output + ".npz", **out)
    print(f"wrote {args.output}.npz (final base_color MAE {err:.4f})")
    return err


if __name__ == "__main__":
    main()
