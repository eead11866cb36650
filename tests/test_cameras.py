"""Camera convention and ray-generation tests."""

import json

import jax.numpy as jnp
import numpy as np

from volprim_tpu import scene
from volprim_tpu.scene.cameras import fov2focal, focal2fov


def test_fov_focal_roundtrip():
    assert abs(focal2fov(fov2focal(40.0, 640), 640) - 40.0) < 1e-6


def test_center_ray_points_forward():
    cam = scene.CameraSpecs(
        name="c", width=64, height=64,
        to_world=scene.look_at([1.0, 2.0, 3.0], [1.0, 2.0, 7.0], [0, 1, 0]),
        fov=50.0,
    )
    o, d = scene.generate_rays(cam, jitter=False)
    # center pixel (between 31 and 32) ~ view direction (0,0,1)
    center = (np.asarray(d[64 * 32 + 31]) + np.asarray(d[64 * 31 + 32])) / 2
    center /= np.linalg.norm(center)
    np.testing.assert_allclose(center, [0, 0, 1], atol=0.02)
    np.testing.assert_allclose(np.asarray(o[0]), [1, 2, 3], atol=1e-5)
    # image x increases to the right: pixel (0,0) ray should point left & up
    d0 = np.asarray(d[0])
    assert d0[0] < 0 or True  # direction in world; check in local frame:
    rot = cam.to_world[:3, :3]
    d0_local = rot.T @ d0
    assert d0_local[0] > 0 and d0_local[1] > 0  # left(+x) and up(+y)


def test_fov_matches_edge_rays():
    cam = scene.CameraSpecs(
        name="c", width=100, height=50,
        to_world=np.eye(4), fov=60.0,
    )
    o, d = scene.generate_rays(cam, jitter=False)
    # widest rays: first and last pixel center of the middle row
    row = 25
    dl = np.asarray(d[row * 100 + 0])
    dr = np.asarray(d[row * 100 + 99])
    ang = np.rad2deg(np.arccos(np.dot(dl, dr)))
    # pixel centers are half a pixel inside the fov edges
    expected = 2 * np.rad2deg(
        np.arctan(np.tan(np.deg2rad(30.0)) * (99 / 100))
    )
    assert abs(ang - expected) < 0.1


def test_json_camera_roundtrip(tmp_path):
    cams = [
        scene.CameraSpecs(
            name="v0", width=640, height=480,
            to_world=scene.look_at([0, 1, 5], [0, 0, 0], [0, 1, 0]),
            focal_length=500.0,
        )
    ]
    path = str(tmp_path / "cameras.json")
    scene.JSONCameraSpecsIO.write(cams, path)
    loaded = scene.JSONCameraSpecsIO.load(path)
    assert len(loaded) == 1
    np.testing.assert_allclose(
        loaded[0].to_world, cams[0].to_world, atol=1e-6
    )
    assert loaded[0].focal_length == 500.0


def test_colmap_text_loader(tmp_path):
    base = tmp_path / "sparse" / "0"
    base.mkdir(parents=True)
    (base / "cameras.txt").write_text(
        "# comment\n1 PINHOLE 640 480 500.0 500.0 320.0 240.0\n"
    )
    (base / "images.txt").write_text(
        "# comment\n1 1 0 0 0 0.5 1.0 2.0 1 img001.png\n\n"
    )
    specs = scene.ColmapCameraSpecsIO.load(str(tmp_path))
    assert len(specs) == 1
    s = specs[0]
    assert s.width == 640 and s.height == 480
    assert s.name == "img001_png"
    assert abs(s.focal_length - 500.0) < 1e-6


def test_scaled():
    cam = scene.CameraSpecs(
        name="c", width=100, height=80, to_world=np.eye(4), fov=60.0
    )
    half = cam.scaled(0.5)
    assert half.width == 50 and half.height == 40
    assert abs(half.fov - cam.fov) < 1e-6


def test_colmap_points3d_roundtrip(tmp_path):
    """points3D text/binary readers (format completeness vs the reference
    colmap_loader.py:252-304): write text, read back; synthesize the
    binary layout by hand and read it; array conversion for cloud
    seeding."""
    import struct

    import numpy as np

    from volprim_tpu.scene import colmap

    pts = {
        7: colmap.Point3D(
            7, np.array([1.0, 2.0, 3.0]), np.array([10, 20, 30], np.uint8),
            0.5, np.array([1, 2], np.int32), np.array([4, 5], np.int32),
        ),
        9: colmap.Point3D(
            9, np.array([-1.0, 0.0, 4.0]), np.array([0, 255, 7], np.uint8),
            1.25, np.zeros(0, np.int32), np.zeros(0, np.int32),
        ),
    }
    txt = tmp_path / "points3D.txt"
    colmap.write_points3D_text(pts, str(txt))
    back = colmap.read_points3D_text(str(txt))
    assert set(back) == {7, 9}
    np.testing.assert_allclose(back[7].xyz, pts[7].xyz)
    assert back[7].error == 0.5
    np.testing.assert_array_equal(back[7].image_ids, [1, 2])
    np.testing.assert_array_equal(back[7].point2d_idxs, [4, 5])

    binp = tmp_path / "points3D.bin"
    with open(binp, "wb") as f:
        f.write(struct.pack("<Q", len(pts)))
        for p in pts.values():
            f.write(struct.pack(
                "<QdddBBBd", p.id, *p.xyz, *p.rgb.tolist(), p.error
            ))
            f.write(struct.pack("<Q", len(p.image_ids)))
            for i, j in zip(p.image_ids, p.point2d_idxs):
                f.write(struct.pack("<ii", int(i), int(j)))
    backb = colmap.read_points3D_binary(str(binp))
    assert set(backb) == {7, 9}
    np.testing.assert_allclose(backb[9].xyz, pts[9].xyz)
    np.testing.assert_array_equal(backb[7].rgb, pts[7].rgb)

    xyz, rgb = colmap.points3D_to_arrays(backb)
    assert xyz.shape == (2, 3) and rgb.shape == (2, 3)
    assert rgb.max() <= 1.0 and rgb.dtype == np.float32
