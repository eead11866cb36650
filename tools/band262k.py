"""262k band-quality probe: pick the order_band TPU quality point (CPU).

Round-4 directive #3 asks for a bench point "262k >= 31.5 dB at > 12
Mrays". The banded per-ray entry-order correction (``order_band``,
rf_tiled.py docstring) costs ~2x per-pair walk ops, so the SPEED side
must come from a realistic candidate budget, not the zero-truncation
mc8192 config the CPU ceiling probes used. This probe scores the xla
tiled backend on the bench 262k scene against a platform-matched exact
reference on a 4096-ray subsample (the diag2m protocol — never score a
CPU render against the TPU-made golden, CLAUDE.md) for budget x ordering
combinations, to choose which single (budget, band) pair to spend a
Mosaic variant on in the queued TPU A/B.

Caveat: budget_classes only exist on the fused backend (rf_tiled.py:636),
so the headline 5-tier ladder is approximated here by its single-budget
neighbours (mc2048 / mc4096); the fused headline measured 30.19 dB where
the xla mc2048 single budget sits lower — compare DELTAS between rows,
not absolutes vs the fused headline.

Usage: python tools/band262k.py [config ...]   (defaults: all)
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
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench.py",
    ),
)
_bench = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bench)

N = 262144
MD = 128  # 262k per-ray hit counts sit far below this (CLAUDE.md)

# gc=4 mirrors the headline's supercluster pool (cf=8/sg=4 defaults).
CONFIGS = {
    # truncation floors without ordering fixes
    "mc2048": dict(gc=4, mc=2048, resort=False),
    "mc4096": dict(gc=4, mc=4096, resort=False),
    # ordering fixes at each budget
    "mc2048-csort": dict(gc=4, mc=2048, resort="cluster-entry"),
    "mc2048-csort-band16": dict(
        gc=4, mc=2048, resort="cluster-entry", band=16
    ),
    "mc4096-csort-band16": dict(
        gc=4, mc=4096, resort="cluster-entry", band=16
    ),
    # round 5: half-band candidates — the band ops scale linearly in the
    # band width, so band8 walks ~35% cheaper than band16 if quality holds
    "mc4096-csort-band8": dict(
        gc=4, mc=4096, resort="cluster-entry", band=8
    ),
    "mc8192-csort-band8": dict(
        gc=4, mc=8192, resort="cluster-entry", band=8
    ),
    "mc8192-csort-band16": dict(
        gc=4, mc=8192, resort="cluster-entry", band=16
    ),
}


def _psnr(a, b):
    return 10 * np.log10(1.0 / max(float(np.mean((a - b) ** 2)), 1e-12))


def main():
    names = sys.argv[1:] or list(CONFIGS)
    scene = _bench.make_scene(N)
    camera = vp.scene.CameraSpecs(
        name="bench", width=512, height=512,
        to_world=vp.scene.look_at([0, 0.4, -3.2], [0, 0, 0], [0, 1, 0]),
        fov=50.0,
    )
    rng = np.random.default_rng(42)
    sel = rng.choice(512 * 512, size=4096, replace=False)

    cache = "/tmp/band262k_exact.npz"
    if os.path.exists(cache):
        g = np.load(cache)
        exact = g["exact"].astype(np.float32)
        assert (g["sel"] == sel).all()
    else:
        o_r, d_r = vp.scene.generate_rays(camera, jitter=False)
        ecfg = rf_exact.RFConfig(
            max_depth=MD, srgb_primitives=True, chunk_size=4096
        )
        jex = jax.jit(
            lambda o_, d_: rf_exact.radiance(
                scene, None, o_, d_, ecfg, jax.random.PRNGKey(0)
            )
        )
        exact = np.asarray(jex(o_r[sel], d_r[sel]))
        np.savez(cache, sel=sel, exact=exact)

    for name in names:
        t0 = time.time()
        p = CONFIGS[name]
        cfg = rf_tiled.RFTiledConfig(
            max_depth=MD, tile_pixels=256, max_candidates=p["mc"],
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
            f"{name:22s} gc={p['gc']} mc={p['mc']} "
            f"resort={p['resort']} band={p.get('band', 0)}: "
            f"PSNR {_psnr(sub, exact):.2f} dB "
            f"({time.time() - t0:.0f} s)", flush=True,
        )


if __name__ == "__main__":
    main()
