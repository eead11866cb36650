"""Total-variation regularizer over attribute graphs.

Rebuild of ``/root/reference/scripts/radiosity/regularizer.py``: per-edge
mean absolute difference of vertex attributes (:28-43), with the edge list
supplied directly (the reference builds it with gpytoolbox.edges from mesh
faces, :22-26) or derived from k-nearest-neighbour graphs for point/
primitive clouds (the volumetric-primitive analogue).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def edges_from_faces(faces: np.ndarray) -> np.ndarray:
    """Unique undirected edges [E, 2] from a triangle list [F, 3]."""
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    return np.unique(e, axis=0)


def knn_edges(points: np.ndarray, k: int = 4) -> np.ndarray:
    """k-nearest-neighbour edges for a point cloud [N, 3] (numpy, O(N^2) —
    intended for scene-scale preprocessing, not inner loops)."""
    points = np.asarray(points)
    n = points.shape[0]
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nbrs = np.argpartition(d2, k, axis=1)[:, :k]
    e = np.stack(
        [np.repeat(np.arange(n), k), nbrs.reshape(-1)], axis=1
    )
    e = np.sort(e, axis=1)
    return np.unique(e, axis=0)


class TVRegularizer:
    """Mean |attribute difference| across edges (regularizer.py:45-57)."""

    def __init__(self, edges: np.ndarray):
        self.edges = jnp.asarray(np.asarray(edges, np.int32))

    def compute_loss(self, attr: jnp.ndarray) -> jnp.ndarray:
        """attr [N, D] (or [N]) -> scalar TV loss."""
        a = attr[self.edges[:, 0]]
        b = attr[self.edges[:, 1]]
        return jnp.mean(jnp.abs(a - b))
