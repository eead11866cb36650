"""EllipsoidScene: the SoA pytree holding volumetric primitives.

TPU-native replacement for Mitsuba's C++ Ellipsoids shape plugin (the
``'type': 'ellipsoidsmesh'`` scene entries; attribute model documented in
SURVEY.md §2.4 and ``/root/reference/volprim/integrators/common.py:47-91``):

- packed record parity: 10 floats/prim = center(3) + scale(3) + quat(4,
  x,y,z,w) via :func:`EllipsoidScene.pack_data` / :func:`from_packed_data`
  (reference ``Ellipsoid.ravel/unravel``, common.py:55-74)
- ``extent``: scalar multiplier on scale bounding the traced ellipsoid
  (default 3.0, common.py:53)
- arbitrary named per-primitive attributes (sigma_t, albedo, opacities,
  sh_coeffs, ...) as a dict of [N, D] arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quaternion


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EllipsoidScene:
    centers: jnp.ndarray  # [N, 3]
    scales: jnp.ndarray  # [N, 3]
    quats: jnp.ndarray  # [N, 4] (x, y, z, w)
    attrs: Dict[str, jnp.ndarray] = dataclasses.field(default_factory=dict)
    extent: float = dataclasses.field(default=3.0, metadata=dict(static=True))

    @property
    def num_prims(self) -> int:
        return self.centers.shape[0]

    def require_attrs(self, names):
        """Assert attributes exist (reference: check_ellipsoids_attribute,
        common.py:35-39)."""
        for n in names:
            if n not in self.attrs:
                raise KeyError(f"Requested ellipsoid attribute '{n}' not found")

    # -- packed-record interop (common.py:55-74) ---------------------------
    def pack_data(self) -> jnp.ndarray:
        """Flatten to the N*10 packed buffer (traverse key 'primitives.data')."""
        return jnp.concatenate(
            [self.centers, self.scales, self.quats], axis=-1
        ).reshape(-1)

    @staticmethod
    def from_packed_data(data: jnp.ndarray, attrs=None, extent: float = 3.0):
        rec = data.reshape(-1, 10)
        return EllipsoidScene(
            centers=rec[:, 0:3],
            scales=rec[:, 3:6],
            quats=rec[:, 6:10],
            attrs=dict(attrs or {}),
            extent=extent,
        )

    # -- derived quantities -------------------------------------------------
    def rotations(self) -> jnp.ndarray:
        return quaternion.to_rotation_matrix(self.quats)

    def scale_prod(self) -> jnp.ndarray:
        return self.scales[..., 0] * self.scales[..., 1] * self.scales[..., 2]

    def select(self, idx: jnp.ndarray) -> "EllipsoidScene":
        """Gather a subset of primitives (pruning; the TPU-side equivalent of
        dr.compress + gathers, examples/optimize_volume.py:256-269 — run
        between jit steps since the width changes)."""
        return EllipsoidScene(
            centers=self.centers[idx],
            scales=self.scales[idx],
            quats=self.quats[idx],
            attrs={k: v[idx] for k, v in self.attrs.items()},
            extent=self.extent,
        )

    def sh_coeffs_3d(self) -> jnp.ndarray:
        """View the 'sh_coeffs' attribute [N, 3K] as [N, K, 3] (basis-major
        interleaved layout, volprim_rf.py:92-95)."""
        sh = self.attrs["sh_coeffs"]
        return sh.reshape(sh.shape[0], -1, 3)


class EllipsoidsFactory:
    """Programmatic construction of small primitive sets for tests and the
    optimize_volume lattice init (reference: common.py:566-596)."""

    def __init__(self):
        self._centers = []
        self._scales = []
        self._quats = []
        self._attrs: Dict[str, list] = {}

    def add(self, mean, scale, euler_deg=(0.0, 0.0, 0.0), **attrs):
        mean = np.broadcast_to(np.asarray(mean, np.float32), (3,))
        scale = np.broadcast_to(np.asarray(scale, np.float32), (3,))
        self._centers.append(mean)
        self._scales.append(scale)
        euler = np.deg2rad(np.asarray(euler_deg, np.float32))
        self._quats.append(np.asarray(quaternion.from_euler(jnp.asarray(euler))))
        for k, v in attrs.items():
            self._attrs.setdefault(k, []).append(
                np.atleast_1d(np.asarray(v, np.float32))
            )

    def build(self, extent: float = 3.0) -> EllipsoidScene:
        n = len(self._centers)
        attrs = {}
        for k, vals in self._attrs.items():
            assert len(vals) == n, f"attribute '{k}' missing for some prims"
            attrs[k] = jnp.asarray(np.stack(vals, axis=0))
        return EllipsoidScene(
            centers=jnp.asarray(np.stack(self._centers)),
            scales=jnp.asarray(np.stack(self._scales)),
            quats=jnp.asarray(np.stack(self._quats)),
            attrs=attrs,
            extent=extent,
        )


def lattice_init(
    count: int,
    init_sigmat: float = 1e-4,
    init_albedo: float = 0.9,
    extent: float = 3.0,
) -> EllipsoidScene:
    """count^3 lattice of isotropic Gaussians in [-1, 1]^3 — the
    optimize_volume initialization (examples/optimize_volume.py:128-140)."""
    delta = 1.0 / count
    ax = 2.0 * delta * np.arange(count, dtype=np.float32) - 1.0
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    centers = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    n = centers.shape[0]
    quats = np.zeros((n, 4), np.float32)
    quats[:, 3] = 1.0
    return EllipsoidScene(
        centers=jnp.asarray(centers),
        scales=jnp.full((n, 3), delta / 2.0, jnp.float32),
        quats=jnp.asarray(quats),
        attrs={
            "sigma_t": jnp.full((n, 1), init_sigmat, jnp.float32),
            "albedo": jnp.full((n, 3), init_albedo, jnp.float32),
        },
        extent=extent,
    )
