"""Attribute the 2M-splat quality gap to its sources, on CPU.

Renders the bench 2M scene at 512^2 through the TILED pipeline with the
``xla`` backend (identical cull/shortlist graphs to the fused kernel, no
Pallas) and scores each config against a PLATFORM-MATCHED exact reference
on a fixed 4096-ray subsample. Measured conclusions (round 3; facts in
CLAUDE.md):

  - the tiled-vs-exact ceiling at 2M is ~25.9 dB (zero truncation mc64k,
    md=512, per-prim resort) — the shared depth-order approximation at 8x
    overlap density (at 262k the same ceiling is ~31.2, +0.74 dB from the
    intra-cluster sort, 32.9 with full per-tile resort; tile size does
    NOT move it: the error is center-depth-vs-entry order, not cone
    width)
  - headline budget classes truncate 56% of uncapped need -> ~19-21 dB
  - cross-platform f32 divergence (CPU render vs TPU golden, identical
    algorithm) is 26.5 dB at 2M / 36 dB at 262k — goldens must be made
    on the measuring platform
  - per-ray hit counts stay small (p50=13, p99=86, max=218): candidates,
    not hits, are the cost; md=512 covers the tail
  - f32 summation noise floor: exact vs permuted-prims exact = 101 dB

Usage: python tools/diag2m.py [config ...]
  configs: ceiling ordering budget pool pool-hi mc16k mc32k mc64k
           csort hits noise
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import volprim_tpu as vp
from volprim_tpu.models import rf_tiled
from volprim_tpu.models import rf as rf_exact

import importlib.util as _ilu

_spec = _ilu.spec_from_file_location(
    "benchmod",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
)
_bench = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bench)

N2M = 2097152
MD_REF = 512  # covers the max observed 218 hits/ray

CONFIGS = {
    "ceiling": dict(gc=0, mc=65536, resort=True, md=MD_REF),
    "ordering": dict(gc=0, mc=65536, resort=False, md=MD_REF),
    "csort": dict(gc=0, mc=65536, resort="cluster", md=MD_REF),
    "csort-entry": dict(gc=0, mc=65536, resort="cluster-entry", md=MD_REF),
    "entry": dict(gc=0, mc=65536, resort="entry", md=MD_REF),
    "budget": dict(gc=0, mc=2048, resort=False, md=MD_REF),
    "pool": dict(gc=4, mc=2048, resort=False, md=MD_REF),
    "pool-hi": dict(gc=4, mc=8192, resort=False, md=MD_REF),
    "mc16k": dict(gc=0, mc=16384, resort=False, md=MD_REF),
    "mc32k": dict(gc=0, mc=32768, resort=False, md=MD_REF),
    "mc64k": dict(gc=0, mc=65536, resort=False, md=MD_REF),
    # banded per-ray order correction (order_band): the route PAST the
    # ~25.9 dB shared-axis ceiling — per-RAY entry-order fixes within a
    # +-band window of the stream (round 4)
    "csort-band16": dict(
        gc=0, mc=65536, resort="cluster-entry", md=MD_REF, band=16
    ),
    "csort-band64": dict(
        gc=0, mc=65536, resort="cluster-entry", md=MD_REF, band=64
    ),
    "band64": dict(gc=0, mc=65536, resort=False, md=MD_REF, band=64),
    "band255": dict(gc=0, mc=65536, resort=False, md=MD_REF, band=255),
    # entry resort + band: the entry-sorted stream leaves only LOCAL
    # residual inversions, which is exactly what a band fixes — measured
    # separately each gives 26.10 / 26.12 dB at 2M; the combination is
    # the candidate past both.
    "entry-band64": dict(
        gc=0, mc=65536, resort="entry", md=MD_REF, band=64
    ),
    "entry-band255": dict(
        gc=0, mc=65536, resort="entry", md=MD_REF, band=255
    ),
}


def _subsample():
    rng = np.random.default_rng(42)
    return rng.choice(512 * 512, size=4096, replace=False)


def _camera():
    return vp.scene.CameraSpecs(
        name="bench2m", width=512, height=512,
        to_world=vp.scene.look_at([0, 0.4, -3.2], [0, 0, 0], [0, 1, 0]),
        fov=50.0,
    )


def _exact_ref(scene, camera, sel, md=MD_REF, cache="/tmp/diag2m_exact.npz"):
    """CPU exact reference on the subsample (platform-matched to the CPU
    tiled renders below — do NOT reuse the TPU bench golden here)."""
    if cache and os.path.exists(cache):
        g = np.load(cache)
        if (g["sel"] == sel).all() and int(g["md"]) == md:
            return g["exact"].astype(np.float32)
    o_r, d_r = vp.scene.generate_rays(camera, jitter=False)
    ecfg = rf_exact.RFConfig(
        max_depth=md, srgb_primitives=True, chunk_size=4096
    )
    jex = jax.jit(
        lambda o_, d_: rf_exact.radiance(
            scene, None, o_, d_, ecfg, jax.random.PRNGKey(0)
        )
    )
    exact = np.asarray(jex(o_r[sel], d_r[sel]))
    if cache:
        np.savez(cache, sel=sel, md=md, exact=exact)
    return exact


def _psnr(a, b):
    return 10 * np.log10(1.0 / max(float(np.mean((a - b) ** 2)), 1e-12))


def main():
    names = sys.argv[1:] or ["ceiling", "ordering", "budget", "pool", "pool-hi"]
    scene = _bench.make_scene(N2M)
    camera = _camera()
    sel = _subsample()
    exact = _exact_ref(scene, camera, sel)

    for name in names:
        t0 = time.time()
        if name == "hits":
            from volprim_tpu.ops import quadric

            o_r, d_r = vp.scene.generate_rays(camera, jitter=False)
            o_s, d_s = o_r[sel], d_r[sel]
            ext2 = float(scene.extent) ** 2

            def count_hits(o, d):
                def body(carry, i):
                    sl = jax.lax.dynamic_slice_in_dim
                    c = sl(scene.centers, i * 65536, 65536, 0)
                    s_ = sl(scene.scales, i * 65536, 65536, 0)
                    q_ = sl(scene.quats, i * 65536, 65536, 0)
                    a, b, c0 = quadric.pair_coeffs(
                        o[:, None, :], d[:, None, :], c[None], s_[None],
                        q_[None],
                    )
                    qmin = c0 - b * b / a
                    hit = (qmin < ext2) & (-b / a > 0)
                    return carry + jnp.sum(hit, axis=1), None

                acc, _ = jax.lax.scan(
                    body, jnp.zeros((o.shape[0],), jnp.int32),
                    jnp.arange(scene.num_prims // 65536),
                )
                return acc

            jc = jax.jit(count_hits)
            hits = np.concatenate([
                np.asarray(jc(o_s[i:i + 512], d_s[i:i + 512]))
                for i in range(0, 4096, 512)
            ])
            q = np.percentile(hits, [50, 90, 99, 100])
            print(
                f"hits: p50={q[0]:.0f} p90={q[1]:.0f} p99={q[2]:.0f} "
                f"max={q[3]:.0f} mean={hits.mean():.0f} "
                f"({time.time() - t0:.0f} s)", flush=True,
            )
            continue
        if name == "noise":
            perm = np.random.default_rng(7).permutation(scene.num_prims)
            scene_p = vp.scene.EllipsoidScene(
                scene.centers[perm], scene.scales[perm], scene.quats[perm],
                {k: v[perm] for k, v in scene.attrs.items()}, scene.extent,
            )
            ep = _exact_ref(scene_p, camera, sel, cache=None)
            print(
                f"noise: exact(permuted) vs exact = {_psnr(ep, exact):.2f} "
                f"dB ({time.time() - t0:.0f} s)", flush=True,
            )
            continue
        p = CONFIGS[name]
        cfg = rf_tiled.RFTiledConfig(
            max_depth=p["md"], tile_pixels=256, max_candidates=p["mc"],
            segment=min(256, p["mc"]), cluster_size=16, backend="xla",
            coarse_group=p["gc"], coarse_factor=8, super_group=4,
            refine_fraction=0.0, prim_resort=p["resort"],
            srgb_primitives=True, order_band=p.get("band", 0),
        )
        state = jax.jit(lambda pr: rf_tiled.build_state(pr, cfg))(scene)
        img = rf_tiled.render_state(
            state, camera, cfg, None, spp=1, seed=jnp.int32(0), jitter=False
        )
        sub = np.asarray(img).reshape(-1, 3)[sel]
        print(
            f"{name:9s} gc={p['gc']} mc={p['mc']} md={p['md']} "
            f"resort={p['resort']}: PSNR {_psnr(sub, exact):.2f} dB "
            f"({time.time() - t0:.0f} s)", flush=True,
        )


if __name__ == "__main__":
    main()
