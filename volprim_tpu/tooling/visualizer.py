"""Headless visualizer — the polyscope stand-in for this environment.

The reference's ``scripts/radiosity/visualizer.py`` opens an interactive
polyscope window to inspect meshes, per-vertex attributes, sampled rays
and camera frusta. No display exists here, so the same inspection surface
renders to IMAGES instead, using the framework's own triangle-mesh
intersector for hidden-surface-correct attribute visualization:

- :func:`render_mesh_attribute`: ray-trace the mesh from a camera and
  shade each hit with an interpolated vertex attribute (the polyscope
  ``add_scalar_quantity`` / ``add_color_quantity`` analogue), depth-
  correct, with an optional headlight term so geometry reads.
- :func:`draw_rays` / :func:`draw_points`: project world-space segments /
  points into the image (the ``register_curve_network`` /
  ``register_point_cloud`` analogue).
- :func:`visualize` bundles them and writes a PNG.

Reference parity: scripts/radiosity/visualizer.py:11-58 (camera
transform + mesh/attribute/ray plotting); the polyscope interactivity is
out of scope in a headless environment (COVERAGE.md).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..scene import mesh as mesh_mod
from ..scene.cameras import CameraSpecs, generate_rays


def render_mesh_attribute(
    mesh: mesh_mod.TriangleMesh,
    camera: CameraSpecs,
    attr: Optional[str] = None,
    cmap_lo: float = 0.0,
    cmap_hi: float = 1.0,
    headlight: float = 0.35,
    background=(1.0, 1.0, 1.0),
) -> np.ndarray:
    """Ray-traced attribute view of a mesh. Returns [H, W, 3] float image.

    ``attr``: vertex-attribute name (1- or 3-channel; scalars map through
    a viridis-like ramp between cmap_lo/cmap_hi). None = flat normals
    shading only.
    """
    o, d = generate_rays(camera, jitter=False)
    valid, t, fid, bary = mesh_mod.intersect(mesh, o, d, t_min=1e-4)
    h, w = camera.height, camera.width

    n = mesh.face_normals()[fid]
    lambert = jnp.abs(jnp.sum(n * -d, axis=-1))[:, None]

    if attr is not None:
        v = mesh.interpolate(attr, fid, bary)
        if v.shape[-1] == 3:
            color = jnp.clip(v, 0.0, 1.0)
        else:
            x = jnp.clip(
                (v[:, 0] - cmap_lo) / max(cmap_hi - cmap_lo, 1e-9), 0.0, 1.0
            )
            # compact viridis-ish ramp
            color = jnp.stack(
                [
                    0.267 + x * (0.993 - 0.267) * x,
                    0.005 + 0.86 * x,
                    0.329 + 0.31 * x - 0.495 * x * x,
                ],
                axis=-1,
            )
            color = jnp.clip(color, 0.0, 1.0)
    else:
        color = 0.5 * (n + 1.0)

    shade = color * ((1.0 - headlight) + headlight * lambert)
    bg = jnp.asarray(background, jnp.float32)
    img = jnp.where(valid[:, None], shade, bg)
    return np.asarray(img).reshape(h, w, 3)


def _project(camera: CameraSpecs, pts: np.ndarray) -> np.ndarray:
    """World points [N, 3] -> pixel coords [N, 2] (+ depth in col 2)."""
    m = np.asarray(camera.to_world, np.float64)
    r, tvec = m[:3, :3], m[:3, 3]
    local = (np.asarray(pts, np.float64) - tvec) @ r  # camera frame
    z = np.maximum(local[:, 2], 1e-9)
    f = float(camera.focal_length)
    px = camera.width / 2.0 - camera.cx - f * local[:, 0] / z
    py = camera.height / 2.0 - camera.cy - f * local[:, 1] / z
    return np.stack([px, py, z], axis=-1)


def draw_points(
    img: np.ndarray, camera: CameraSpecs, pts, color=(1.0, 0.1, 0.1),
    radius: int = 1,
) -> np.ndarray:
    """Splat world-space points into the image (point-cloud analogue)."""
    img = np.array(img, copy=True)
    pc = _project(camera, np.asarray(pts, np.float64))
    h, w = img.shape[:2]
    for x, y, z in pc:
        if z <= 0:
            continue
        xi, yi = int(round(x)), int(round(y))
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                if 0 <= yi + dy < h and 0 <= xi + dx < w:
                    img[yi + dy, xi + dx] = color
    return img


def draw_rays(
    img: np.ndarray, camera: CameraSpecs, origins, dirs, length: float = 1.0,
    color=(0.1, 0.4, 1.0),
) -> np.ndarray:
    """Project ray segments into the image (curve-network analogue)."""
    img = np.array(img, copy=True)
    o = np.asarray(origins, np.float64)
    e = o + np.asarray(dirs, np.float64) * length
    p0 = _project(camera, o)
    p1 = _project(camera, e)
    h, w = img.shape[:2]
    for (x0, y0, z0), (x1, y1, z1) in zip(p0, p1):
        if z0 <= 0 and z1 <= 0:
            continue
        n = int(max(abs(x1 - x0), abs(y1 - y0), 1))
        for i in range(n + 1):
            s = i / n
            x = x0 + (x1 - x0) * s
            y = y0 + (y1 - y0) * s
            xi, yi = int(round(x)), int(round(y))
            if 0 <= yi < h and 0 <= xi < w:
                img[yi, xi] = color
    return img


def visualize(
    path: str,
    mesh: mesh_mod.TriangleMesh,
    camera: CameraSpecs,
    attr: Optional[str] = None,
    points=None,
    rays: Optional[tuple] = None,
    **kw,
) -> np.ndarray:
    """One-call inspection image: mesh attribute + optional overlays,
    written to ``path`` (PNG/EXR via utils.image)."""
    img = render_mesh_attribute(mesh, camera, attr, **kw)
    if points is not None:
        img = draw_points(img, camera, points)
    if rays is not None:
        img = draw_rays(img, camera, rays[0], rays[1],
                        *(rays[2:] if len(rays) > 2 else ()))
    from ..utils.image import write_image

    write_image(path, img)
    return img
