"""Golden-image regression tests (SURVEY.md §4 layer 3): tiny deterministic
renders of resources/smoke.ply checked against stored references.

Regenerate after *intentional* rendering changes with:
    python tests/test_golden.py --regen
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from volprim_tpu import models, scene
from volprim_tpu.models import prb, tomography
from volprim_tpu.ops import envmap

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
SMOKE = "/root/reference/resources/smoke.ply"


def render_tomo():
    s = scene.load_ply(SMOKE)
    s.attrs["sigma_t"] = s.attrs["sigma_t"] * 200.0
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    cam = scene.CameraSpecs(
        name="c", width=32, height=32,
        to_world=scene.look_at([-4.0, 0.0, 0.0], [0, 0, 0], [0, 1, 0]),
        fov=40.0,
    )
    return models.render(
        s, cam, tomography.radiance, tomography.TomographyConfig(max_depth=-1),
        em, spp=2, seed=7,
    )


def render_prb():
    s = scene.load_ply(SMOKE)
    s.attrs["sigma_t"] = s.attrs["sigma_t"] * 10.0
    em = envmap.procedural_sky(h=32, w=64)
    cam = scene.CameraSpecs(
        name="c", width=16, height=16,
        to_world=scene.look_at([-4.0, -0.3, 0.0], [0, 0, 0], [0, 1, 0]),
        fov=40.0,
    )
    cfg = prb.PRBConfig(max_depth=-1, bounce_cap=16, max_overlaps=16,
                        max_windows=4)
    return models.render(s, cam, prb.radiance, cfg, em, spp=4, seed=7)


CASES = {"tomo_smoke": render_tomo, "prb_smoke": render_prb}


def _check(name, fn):
    img = np.asarray(fn())
    path = os.path.join(GOLDEN_DIR, f"{name}.npy")
    assert os.path.exists(path), f"golden missing: regen with --regen ({path})"
    ref = np.load(path)
    # MC renders are seeded/deterministic on a fixed backend; allow small
    # cross-platform numeric drift via PSNR.
    mse = float(np.mean((img - ref) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 45.0, f"golden mismatch for {name}: PSNR {psnr:.1f} dB"


def test_golden_tomography():
    _check("tomo_smoke", render_tomo)


def test_golden_prb():
    _check("prb_smoke", render_prb)


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name, fn in CASES.items():
            np.save(os.path.join(GOLDEN_DIR, f"{name}.npy"), np.asarray(fn()))
            print("wrote", name)
