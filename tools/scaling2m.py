"""Truck-scale (2M-splat) sharding validation on the virtual CPU mesh.

The round-2 verdict asked for a non-toy multichip measurement. This runs
the 2M bench scene at the full 512^2 film through the tiled renderer
(xla backend — CPU-executable; the fused kernel is TPU-only) with the
tile axis sharded over 1/2/4/8 virtual devices, and reports:

  - bitwise equality of the sharded frame vs single-device (per-tile RNG,
    no frame collectives — same property the test suite pins at toy size)
  - sharding OVERHEAD at constant work (virtual devices share the host's
    cores, so per-device speedup is meaningless — see SCALING.json note)

Appends a "scale2m" block to SCALING.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import volprim_tpu as vp
from volprim_tpu import parallel
from volprim_tpu.models import rf_tiled

import importlib.util as _ilu

_spec = _ilu.spec_from_file_location(
    "benchmod",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
)
_bench = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bench)


def main():
    scene = _bench.make_scene(2097152)
    camera = vp.scene.CameraSpecs(
        name="bench2m", width=512, height=512,
        to_world=vp.scene.look_at([0, 0.4, -3.2], [0, 0, 0], [0, 1, 0]),
        fov=50.0,
    )
    cfg = rf_tiled.RFTiledConfig(
        max_depth=512, tile_pixels=256, max_candidates=2048, segment=256,
        cluster_size=16, backend="xla", coarse_group=4, coarse_factor=16,
        super_group=4, refine_fraction=0.0, prim_resort=False,
        srgb_primitives=True,
    )
    state = jax.jit(lambda p: rf_tiled.build_state(p, cfg))(scene)

    devices = jax.devices()
    results = {}
    img_ref = None
    for nd in (1, 2, 4, 8):
        mesh = None if nd == 1 else parallel.data_mesh(devices[:nd])
        fn = jax.jit(
            lambda st, s, mesh=mesh: rf_tiled.render_state(
                st, camera, cfg, None, spp=1, seed=s, mesh=mesh
            )
        )
        img = np.asarray(fn(state, jnp.int32(1)))  # compile + warm
        if img_ref is None:
            img_ref = img
            assert np.isfinite(img_ref).all()
        else:
            bitwise = bool((img == img_ref).all())
            print(f"nd={nd}: bitwise vs single-device: {bitwise}")
            assert bitwise, f"sharded frame differs at nd={nd}"
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(state, jnp.int32(10 + i)))
            ts.append(time.perf_counter() - t0)
        results[nd] = round(float(np.min(ts)) * 1e3, 1)
        print(f"nd={nd}: frame {results[nd]:.1f} ms", flush=True)

    overhead = {
        nd: round(results[nd] / results[1] - 1.0, 3) for nd in results
    }
    block = {
        "scene": "2M splats, 512^2, mc2048, cf16, md512, xla backend",
        "frame_ms": results,
        "overhead_vs_1dev_constant_work": overhead,
        "bitwise_equal": True,
        "note": "virtual CPU devices share host cores: this validates the "
        "partitioned program + measures partitioning overhead, not speedup",
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.json",
    )
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data["scale2m"] = block
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(block))


if __name__ == "__main__":
    main()
