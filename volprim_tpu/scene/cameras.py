"""Camera specifications, loaders (JSON / KRT / COLMAP) and ray generation.

Functional parity with ``/root/reference/volprim/cameras.py`` (CameraSpecs,
fov/focal conversion, the three loader classes and their convention quirks),
plus the TPU-side replacement for Mitsuba's C++ perspective sensor: a batched
JAX ray generator.

Conventions (cameras.py:32-39): Mitsuba sensors are right-handed with local
+x pointing image-left, +y image-up, +z along the view direction. 3DGS /
COLMAP / GSplat use +x right, +y down, +z forward; the loaders apply the same
``scale([-1,-1,1])`` flips as the reference (cameras.py:185,204).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import colmap as colmap_loader


def fov2focal(fov_deg: float, width: int) -> float:
    """Focal length in pixels from FOV in degrees (cameras.py:41-45)."""
    return (width / 2.0) / np.tan(np.deg2rad(fov_deg) * 0.5)


def focal2fov(focal_length: float, width: int) -> float:
    """FOV in degrees from focal length in pixels (cameras.py:47-51)."""
    return float(2.0 * np.rad2deg(np.arctan2(0.5 * width, focal_length)))


def look_at(origin, target, up) -> np.ndarray:
    """Mitsuba-convention look_at to_world matrix (x left, y up, z forward)."""
    origin = np.asarray(origin, np.float64)
    direction = np.asarray(target, np.float64) - origin
    direction = direction / np.linalg.norm(direction)
    left = np.cross(np.asarray(up, np.float64), direction)
    left = left / np.linalg.norm(left)
    new_up = np.cross(direction, left)
    m = np.eye(4)
    m[:3, 0] = left
    m[:3, 1] = new_up
    m[:3, 2] = direction
    m[:3, 3] = origin
    return m


def rotate_x(deg: float) -> np.ndarray:
    c, s = np.cos(np.deg2rad(deg)), np.sin(np.deg2rad(deg))
    m = np.eye(4)
    m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
    return m


def rotate_y(deg: float) -> np.ndarray:
    c, s = np.cos(np.deg2rad(deg)), np.sin(np.deg2rad(deg))
    m = np.eye(4)
    m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
    return m


@dataclasses.dataclass
class CameraSpecs:
    """Camera information record (reference: cameras.py:53-154).

    ``cx, cy`` are principal-point offsets stored exactly as the reference
    does (pixels; COLMAP loader stores ``width/2 - cx_colmap``,
    cameras.py:363-364). Radial (k1..k6) / tangential (p1, p2) distortion
    fields are parsed and carried but not applied during rendering — the
    reference's Mitsuba perspective sensor ignores them too (SURVEY.md §2.3).
    """

    name: str
    width: int
    height: int
    to_world: np.ndarray  # 4x4, Mitsuba convention
    fov: Optional[float] = None  # degrees, x axis
    focal_length: Optional[float] = None  # pixels
    near_clip: float = 0.1
    far_clip: float = 10000.0
    cx: float = 0.0
    cy: float = 0.0
    k1: float = 0.0
    k2: float = 0.0
    k3: float = 0.0
    k4: float = 0.0
    k5: float = 0.0
    k6: float = 0.0
    p1: float = 0.0
    p2: float = 0.0

    def __post_init__(self):
        self.to_world = np.asarray(self.to_world, np.float64).reshape(4, 4)
        if self.fov is None and self.focal_length is None:
            raise ValueError("either fov or focal_length must be set")
        if self.fov is None:
            self.fov = focal2fov(self.focal_length, self.width)
        elif self.focal_length is None:
            self.focal_length = fov2focal(self.fov, self.width)

    def viewmat(self) -> np.ndarray:
        """World-to-camera matrix in the GSplat convention (cameras.py:97-102)."""
        flip = np.diag([-1.0, -1.0, 1.0, 1.0])
        return np.linalg.inv(self.to_world @ flip)

    def K(self) -> np.ndarray:
        """Intrinsics matrix (cameras.py:104-112)."""
        return np.array(
            [
                [self.focal_length, 0.0, self.width / 2.0],
                [0.0, self.focal_length, self.height / 2.0],
                [0.0, 0.0, 1.0],
            ]
        )

    def scaled(self, factor: float) -> "CameraSpecs":
        """Resolution-scaled copy (reference: to_dict(resolution_factor),
        cameras.py:114-137 and io.scale_films, io.py:72-85)."""
        return dataclasses.replace(
            self,
            width=int(self.width * factor),
            height=int(self.height * factor),
            focal_length=self.focal_length * factor,
            fov=None,
            cx=self.cx * factor,
            cy=self.cy * factor,
        )

    def to_dict(self) -> dict:
        return {
            "type": "perspective",
            "name": self.name,
            "fov": self.fov,
            "width": self.width,
            "height": self.height,
            "to_world": self.to_world.tolist(),
            "near_clip": self.near_clip,
            "far_clip": self.far_clip,
            "principal_point_offset_x": self.cx,
            "principal_point_offset_y": self.cy,
        }

    @staticmethod
    def from_dict(d: dict, name: str = "") -> "CameraSpecs":
        return CameraSpecs(
            name=d.get("name", name),
            width=int(d["width"]),
            height=int(d["height"]),
            to_world=np.asarray(d["to_world"]),
            fov=d.get("fov"),
            focal_length=d.get("focal_length"),
            near_clip=d.get("near_clip", 0.1),
            far_clip=d.get("far_clip", 10000.0),
            cx=d.get("principal_point_offset_x", 0.0),
            cy=d.get("principal_point_offset_y", 0.0),
        )


# ----------------------------------------------------------------------------
# Ray generation (replaces Mitsuba's perspective sensor + independent sampler)
# ----------------------------------------------------------------------------


def generate_rays(
    spec: CameraSpecs,
    key: Optional[jax.Array] = None,
    jitter: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Generate one primary ray per pixel (optionally jittered in-pixel).

    Returns (origins [H*W, 3], directions [H*W, 3]) in row-major pixel order.
    Directions are normalized. Local frame: x left, y up, z forward; pixel
    (0, 0) is the top-left of the image (Mitsuba film convention).
    """
    h, w = spec.height, spec.width
    px = jnp.tile(jnp.arange(w, dtype=jnp.float32)[None, :], (h, 1)).reshape(-1)
    py = jnp.tile(jnp.arange(h, dtype=jnp.float32)[:, None], (1, w)).reshape(-1)
    if jitter and key is not None:
        off = jax.random.uniform(key, (px.shape[0], 2))
        px = px + off[:, 0]
        py = py + off[:, 1]
    else:
        px = px + 0.5
        py = py + 0.5
    return rays_from_pixels(spec, px, py)


def rays_from_pixels(
    spec: CameraSpecs, px: jnp.ndarray, py: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rays through continuous film positions (px, py) in pixels."""
    f = jnp.float32(spec.focal_length)
    # Principal point in pixels is (W/2 - cx, H/2 - cy); see class docstring.
    ppx = jnp.float32(spec.width / 2.0 - spec.cx)
    ppy = jnp.float32(spec.height / 2.0 - spec.cy)
    # GSplat/pinhole dirs (x right, y down, z fwd), then flip into the Mitsuba
    # local frame (x left, y up, z fwd).
    d_local = jnp.stack(
        [-(px - ppx) / f, -(py - ppy) / f, jnp.ones_like(px)], axis=-1
    )
    rot = jnp.asarray(spec.to_world[:3, :3], jnp.float32)
    origin = jnp.asarray(spec.to_world[:3, 3], jnp.float32)
    d_world = d_local @ rot.T
    d_world = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)
    o_world = jnp.broadcast_to(origin, d_world.shape)
    return o_world, d_world


# ----------------------------------------------------------------------------
# Loaders
# ----------------------------------------------------------------------------


class JSONCameraSpecsIO:
    """3DGS ``cameras.json`` loader/writer (reference: cameras.py:169-217,
    including the handedness flip at :185)."""

    @staticmethod
    def load(filename: str) -> List[CameraSpecs]:
        with open(filename) as f:
            sensors = json.load(f)
        flip = np.diag([-1.0, -1.0, 1.0, 1.0])
        specs = []
        for sensor in sensors:
            to_world = np.eye(4)
            to_world[:3, :3] = np.asarray(sensor["rotation"])
            to_world[:3, 3] = np.asarray(sensor["position"])
            specs.append(
                CameraSpecs(
                    name=sensor["img_name"],
                    width=sensor["width"],
                    height=sensor["height"],
                    focal_length=sensor["fx"],
                    to_world=to_world @ flip,
                    near_clip=0.1,
                    far_clip=100.0,
                )
            )
        return specs

    @staticmethod
    def write(specs: List[CameraSpecs], filename: str):
        flip = np.diag([-1.0, -1.0, 1.0, 1.0])
        sensors = []
        for i, cam in enumerate(specs):
            to_world = cam.to_world @ flip
            sensors.append(
                {
                    "rotation": to_world[:3, :3].tolist(),
                    "position": to_world[:3, 3].tolist(),
                    "fx": cam.focal_length,
                    "fy": cam.focal_length,
                    "width": cam.width,
                    "height": cam.height,
                    "id": i,
                    "img_name": cam.name,
                }
            )
        with open(filename, "w", encoding="utf-8") as f:
            f.write(json.dumps(sensors, ensure_ascii=False))


class KRTCameraSpecsIO:
    """KRT JSON loader (reference: cameras.py:221-262)."""

    @staticmethod
    def load(filename: str, faithful: bool = True) -> List[CameraSpecs]:
        """Parse a KRT JSON (K stored transposed: principal point in row 2).

        ``faithful=True`` replicates a reference bug: ``cameras.py:245``
        reads ``K[2, 1], K[2, 1]`` for *both* px and py, so width is derived
        from the principal point's y coordinate (wrong for non-square
        sensors). Pass ``faithful=False`` for the corrected
        ``K[2, 0], K[2, 1]`` reading.
        """
        with open(filename) as f:
            sensors = json.load(f)["KRT"]
        infos = []
        for sensor in sensors:
            if sensor.get("distortionModel") != "RadialAndTangential":
                continue
            if sensor.get("projectionModel") != "Pinhole":
                continue
            k_mat = np.asarray(sensor["K"])
            rt = np.asarray(sensor["T"])
            k1, k2, k3, k4 = list(sensor["distortion"][0])
            if faithful:
                px, py = k_mat[2, 1], k_mat[2, 1]  # sic — see docstring
            else:
                px, py = k_mat[2, 0], k_mat[2, 1]
            width, height = 2 * px, 2 * py
            infos.append(
                CameraSpecs(
                    name=sensor["cameraId"],
                    width=int(width),
                    height=int(height),
                    to_world=rt,
                    focal_length=k_mat[0, 0],
                    k1=k1,
                    k2=k2,
                    k3=k3,
                    k4=k4,
                )
            )
        return infos


class ColmapCameraSpecsIO:
    """COLMAP sparse/0 model loader (reference: cameras.py:266-375)."""

    @staticmethod
    def load(path: str) -> List[CameraSpecs]:
        base = os.path.join(path, "sparse", "0")
        try:
            extr = colmap_loader.read_extrinsics_binary(
                os.path.join(base, "images.bin")
            )
            intr = colmap_loader.read_intrinsics_binary(
                os.path.join(base, "cameras.bin")
            )
        except (FileNotFoundError, OSError):
            extr = colmap_loader.read_extrinsics_text(
                os.path.join(base, "images.txt")
            )
            intr = colmap_loader.read_intrinsics_text(
                os.path.join(base, "cameras.txt")
            )

        infos = []
        for key in extr:
            e = extr[key]
            i = intr[e.camera_id]
            width, height = i.width, i.height
            params = i.params
            k1 = k2 = k3 = k4 = k5 = k6 = p1 = p2 = 0.0
            if i.model == "SIMPLE_PINHOLE":
                fx, cx, cy = params[0], params[1], params[2]
            elif i.model == "PINHOLE":
                fx, cx, cy = params[0], params[2], params[3]
            elif i.model == "SIMPLE_RADIAL":
                fx, cx, cy, k1 = params[0], params[1], params[2], params[3]
            elif i.model == "RADIAL":
                fx, cx, cy, k1, k2 = params[0], params[1], params[2], params[3], params[4]
            elif i.model == "OPENCV":
                fx, cx, cy = params[0], params[2], params[3]
                k1, k2, p1, p2 = params[4], params[5], params[6], params[7]
            elif i.model == "OPENCV_FISHEYE":
                fx, cx, cy = params[0], params[2], params[3]
                k1, k2, k3, k4 = params[4], params[5], params[6], params[7]
            elif i.model == "FULL_OPENCV":
                fx, cx, cy = params[0], params[2], params[3]
                k1, k2, p1, p2 = params[4], params[5], params[6], params[7]
                k3, k4, k5, k6 = params[8], params[9], params[10], params[11]
            else:
                raise ValueError(f"COLMAP camera model not handled: {i.model}")

            # world-to-cam in COLMAP convention -> Mitsuba to_world
            # (same flip pattern as the reference, cameras.py:351-355).
            rot = colmap_loader.qvec2rotmat(e.qvec).T
            to_cam = np.eye(4)
            to_cam[:3, :3] = rot * np.array([-1.0, -1.0, 1.0])
            to_cam[3, :3] = np.asarray(e.tvec) * np.array([-1.0, -1.0, 1.0])
            to_world = np.linalg.inv(to_cam).T

            infos.append(
                CameraSpecs(
                    name=e.name.replace(".", "_"),
                    width=width,
                    height=height,
                    to_world=to_world,
                    focal_length=fx,
                    cx=width / 2.0 - cx,
                    cy=height / 2.0 - cy,
                    k1=k1, k2=k2, k3=k3, k4=k4, k5=k5, k6=k6, p1=p1, p2=p2,
                )
            )
        return infos
