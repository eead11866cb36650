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
    # the tiled fast path through the same CLI tracks the exact render
    out2 = str(tmp_path / "out_tiled")
    _run_cli(
        "render_3dg_asset.py",
        ["--ply", ply, "--cameras", cams, "--output", out2, "--spp", "1",
         "--max_depth", "32", "--renderer", "tiled"],
    )
    img2 = vp.utils.image.read_exr(os.path.join(out2, "output.exr"))
    assert np.isfinite(img2).all()
    mse = float(np.mean((img2 - img) ** 2))
    assert -10 * np.log10(mse + 1e-12) > 25.0


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


def test_render_volume_cli_pallas_walk(tmp_path):
    # the fused free-flight walk through the acceptance CLI: identical
    # sampling decisions -> the same image up to f32-boundary flips
    out_x = str(tmp_path / "vol_x.exr")
    out_p = str(tmp_path / "vol_p.exr")
    common = ["--width", "32", "--height", "32", "--spp", "1"]
    _run_cli("render_volume.py", ["--output", out_x] + common)
    _run_cli(
        "render_volume.py",
        ["--output", out_p, "--walk_backend", "pallas"] + common,
    )
    a = vp.utils.image.read_exr(out_x)
    b = vp.utils.image.read_exr(out_p)
    assert np.isfinite(b).all()
    assert np.isclose(a, b, rtol=1e-2, atol=1e-2).mean() > 0.98


def test_refine_3dg_dataset_cli(tmp_path):
    """Full inverse workflow as a user runs it: PLY + cameras in, trained
    asset dir + loss falling out (--selfref renders its own references)."""
    ply, cams = _tiny_asset(tmp_path, n=256)
    out = str(tmp_path / "refined")
    _run_cli(
        "refine_3dg_dataset.py",
        ["--ply", ply, "--cameras", cams, "--output", out, "--selfref",
         "--cam_count", "2", "--cam_scale", "1.0", "--ref_spp", "2",
         "--iterations", "4", "--max_depth", "32", "--kernel", "gaussian",
         "--write_image_every", "100"],
    )
    assert os.path.exists(os.path.join(out, "refined.png"))
    asset_dir = os.path.join(out, "refined_asset")
    assert os.path.exists(asset_dir)
    # the written asset must load back as a renderable scene
    asset = vp.scene.load_asset(asset_dir)
    assert asset["primitives"].num_prims > 0
    assert len(asset["cameras"]) >= 1


def test_optimize_volume_cli(tmp_path):
    out = str(tmp_path / "opt")
    _run_cli(
        "optimize_volume.py",
        ["--output", out, "--cam_res", "24", "--cam_count", "2",
         "--iterations", "3", "--volprim_count", "8", "--ref_spp", "1",
         "--opt_spp", "1", "--write_image_every", "100",
         "--ref_mode", "absorption"],
    )
    assert os.path.exists(os.path.join(out, "reference.png"))


def test_render_asset_cli(tmp_path):
    """render_asset reads back a reference-format asset directory (the
    integrator defaults to volprim_tomography, so give the primitives
    medium attributes like the reference's volume assets carry)."""
    from test_rf_tiled import surface_scene

    s0 = surface_scene(256, seed=5)
    s = vp.scene.EllipsoidScene(
        s0.centers, s0.scales, s0.quats,
        {
            "sigma_t": np.full((256, 1), 2.0, np.float32),
            "albedo": np.full((256, 3), 0.7, np.float32),
        },
        s0.extent,
    )
    cam = vp.scene.CameraSpecs(
        name="c0", width=48, height=32,
        to_world=vp.scene.look_at([0, 0.3, -3.5], [0, 0, 0], [0, 1, 0]),
        fov=45.0,
    )
    asset_dir = str(tmp_path / "asset")
    vp.scene.asset_interop.save_reference_asset(asset_dir, s, [cam])
    out = str(tmp_path / "ra.exr")
    _run_cli(
        "render_asset.py",
        [asset_dir, "--output", out, "--spp", "1"],
    )
    img = vp.utils.image.read_exr(out)
    assert img.shape[-1] == 3
    assert np.isfinite(img).all()
