"""Mitsuba ``.vol`` grid-volume binary format reader/writer + a JAX trilinear
grid sampler.

Replaces the C++ ``gridvolume`` plugin used to produce tomography ground
truth (``/root/reference/examples/optimize_volume.py:91-111``; SURVEY.md
§2.3). Format (Mitsuba 3 docs): bytes 'VOL', uint8 version=3, int32 encoding
(1 = float32), int32 (xres, yres, zres), int32 channels, 6x float32 bbox
(xmin ymin zmin xmax ymax zmax), then xres*yres*zres*channels float32 with x
varying fastest.
"""

from __future__ import annotations

import dataclasses
import struct

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GridVolume:
    data: jnp.ndarray  # [zres, yres, xres, channels]
    bbox_min: jnp.ndarray  # [3]
    bbox_max: jnp.ndarray  # [3]

    @property
    def resolution(self):
        return self.data.shape[2], self.data.shape[1], self.data.shape[0]

    def sample(self, p: jnp.ndarray) -> jnp.ndarray:
        """Trilinear sample at world points ``p`` [..., 3]; zero outside the
        bbox. Matches Mitsuba gridvolume semantics (cell centers at the
        corners of the [0,1]^3 local cube; 'raw' float data)."""
        local = (p - self.bbox_min) / (self.bbox_max - self.bbox_min)
        inside = jnp.all((local >= 0.0) & (local <= 1.0), axis=-1)
        nx, ny, nz = self.resolution
        fx = local[..., 0] * (nx - 1)
        fy = local[..., 1] * (ny - 1)
        fz = local[..., 2] * (nz - 1)
        x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, nx - 1)
        y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, ny - 1)
        z0 = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0, nz - 1)
        x1 = jnp.minimum(x0 + 1, nx - 1)
        y1 = jnp.minimum(y0 + 1, ny - 1)
        z1 = jnp.minimum(z0 + 1, nz - 1)
        tx = (fx - x0)[..., None]
        ty = (fy - y0)[..., None]
        tz = (fz - z0)[..., None]

        def g(zi, yi, xi):
            return self.data[zi, yi, xi]

        c000, c100 = g(z0, y0, x0), g(z0, y0, x1)
        c010, c110 = g(z0, y1, x0), g(z0, y1, x1)
        c001, c101 = g(z1, y0, x0), g(z1, y0, x1)
        c011, c111 = g(z1, y1, x0), g(z1, y1, x1)
        c00 = c000 * (1 - tx) + c100 * tx
        c10 = c010 * (1 - tx) + c110 * tx
        c01 = c001 * (1 - tx) + c101 * tx
        c11 = c011 * (1 - tx) + c111 * tx
        c0 = c00 * (1 - ty) + c10 * ty
        c1 = c01 * (1 - ty) + c11 * ty
        out = c0 * (1 - tz) + c1 * tz
        return jnp.where(inside[..., None], out, 0.0)


def load_vol(path: str) -> GridVolume:
    with open(path, "rb") as f:
        magic = f.read(3)
        assert magic == b"VOL", f"not a .vol file: {magic!r}"
        (version,) = struct.unpack("<B", f.read(1))
        assert version == 3, f"unsupported .vol version {version}"
        (encoding,) = struct.unpack("<i", f.read(4))
        assert encoding == 1, "only float32 .vol grids supported"
        xres, yres, zres = struct.unpack("<3i", f.read(12))
        (channels,) = struct.unpack("<i", f.read(4))
        bbox = struct.unpack("<6f", f.read(24))
        data = np.frombuffer(
            f.read(4 * xres * yres * zres * channels), dtype="<f4"
        ).reshape(zres, yres, xres, channels)
    return GridVolume(
        data=jnp.asarray(data),
        bbox_min=jnp.asarray(bbox[:3]),
        bbox_max=jnp.asarray(bbox[3:]),
    )


def save_vol(grid: GridVolume, path: str):
    data = np.asarray(grid.data, np.float32)
    zres, yres, xres, channels = data.shape
    with open(path, "wb") as f:
        f.write(b"VOL")
        f.write(struct.pack("<B", 3))
        f.write(struct.pack("<i", 1))
        f.write(struct.pack("<3i", xres, yres, zres))
        f.write(struct.pack("<i", channels))
        bbox = [*np.asarray(grid.bbox_min), *np.asarray(grid.bbox_max)]
        f.write(struct.pack("<6f", *bbox))
        f.write(np.ascontiguousarray(data, "<f4").tobytes())


def procedural_smoke(res: int = 48, seed: int = 0) -> GridVolume:
    """Procedural stand-in for the snapshot-stripped ``resources/smoke.vol``
    (listed in the reference's .MISSING_LARGE_BLOBS): a plume-like density
    field used by tests and the optimize_volume example."""
    rng = np.random.default_rng(seed)
    z, y, x = np.meshgrid(
        np.linspace(0, 1, res), np.linspace(0, 1, res), np.linspace(0, 1, res),
        indexing="ij",
    )
    r = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2)
    radius = 0.12 + 0.25 * z + 0.05 * np.sin(10.0 * z + 3.0 * x)
    core = np.exp(-((r / np.maximum(radius, 1e-3)) ** 2) * 4.0)
    swirl = 0.5 + 0.5 * np.sin(
        8.0 * z + 6.0 * np.arctan2(y - 0.5, x - 0.5) + 2.0 * rng.standard_normal()
    )
    density = core * (0.4 + 0.6 * swirl) * np.clip(1.2 - z, 0.0, 1.0)
    density = density.astype(np.float32)[..., None]
    return GridVolume(
        data=jnp.asarray(density),
        bbox_min=jnp.asarray([0.0, 0.0, 0.0]),
        bbox_max=jnp.asarray([1.0, 1.0, 1.0]),
    )
