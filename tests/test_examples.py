"""End-to-end example-CLI smoke tests (the acceptance surface).

Each test builds a tiny asset on disk, drives the real CLI through runpy
(same code path as a user's shell invocation; examples bootstrap their own
sys.path), and sanity-checks the written outputs. Mirrors the manual
recipe in .claude/skills/verify/SKILL.md at test-sized configs.
"""

import os
import runpy
import sys

import numpy as np
import pytest

import volprim_tpu as vp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_asset(tmp_path, n=512):
    from test_rf_tiled import surface_scene

    s = surface_scene(n, seed=5)
    ply = str(tmp_path / "tiny.ply")
    vp.scene.save_ply(s, ply)
    cam = vp.scene.CameraSpecs(
        name="c0", width=48, height=32,
        to_world=vp.scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    cams = str(tmp_path / "cameras.json")
    vp.cameras.JSONCameraSpecsIO.write([cam], cams)
    return ply, cams


def _run_cli(script, argv):
    old = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(os.path.join(REPO, "examples", script),
                       run_name="__main__")
    finally:
        sys.argv = old


def test_render_3dg_asset_cli(tmp_path):
    ply, cams = _tiny_asset(tmp_path)
    out = str(tmp_path / "out")
    _run_cli(
        "render_3dg_asset.py",
        ["--ply", ply, "--cameras", cams, "--output", out, "--spp", "1",
         "--max_depth", "32"],
    )
    img = vp.utils.image.read_exr(os.path.join(out, "output.exr"))
    assert img.shape == (32, 48, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.0


def test_render_volume_cli(tmp_path):
    out = str(tmp_path / "vol.exr")
    _run_cli(
        "render_volume.py",
        ["--output", out, "--width", "32", "--height", "32", "--spp", "1"],
    )
    img = vp.utils.image.read_exr(out)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert 0.0 < img.mean() < 10.0
