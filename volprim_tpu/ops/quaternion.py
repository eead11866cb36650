"""Quaternion utilities (pure JAX).

Conventions match the reference primitive record (`/root/reference/volprim/
integrators/common.py:55-74`): quaternions are stored as (x, y, z, w) in
memory; 3DGS PLY files store (w, x, y, z) and are reordered by the codec
(`io.py:373`).
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternion(s) [..., 4] to unit length."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Convert unit quaternion(s) (x, y, z, w) [..., 4] to rotation matrices
    [..., 3, 3] whose *columns* are the rotated basis vectors (world-from-local,
    i.e. the same convention as Dr.Jit's ``dr.quat_to_matrix`` used at
    ``common.py:73``: local point ``p_l`` maps to world as ``R @ p_l``).
    """
    q = normalize(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r00 = 1.0 - 2.0 * (yy + zz)
    r01 = 2.0 * (xy - wz)
    r02 = 2.0 * (xz + wy)
    r10 = 2.0 * (xy + wz)
    r11 = 1.0 - 2.0 * (xx + zz)
    r12 = 2.0 * (yz - wx)
    r20 = 2.0 * (xz - wy)
    r21 = 2.0 * (yz + wx)
    r22 = 1.0 - 2.0 * (xx + yy)
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def from_euler(euler_xyz_rad: jnp.ndarray) -> jnp.ndarray:
    """Euler angles (radians, intrinsic x-y-z order, matching Dr.Jit's
    ``dr.euler_to_quat`` used by the test-scene factory at ``common.py:580``)
    to quaternion (x, y, z, w)."""
    ex, ey, ez = (
        euler_xyz_rad[..., 0] * 0.5,
        euler_xyz_rad[..., 1] * 0.5,
        euler_xyz_rad[..., 2] * 0.5,
    )
    cx, sx = jnp.cos(ex), jnp.sin(ex)
    cy, sy = jnp.cos(ey), jnp.sin(ey)
    cz, sz = jnp.cos(ez), jnp.sin(ez)
    qw = cx * cy * cz + sx * sy * sz
    qx = sx * cy * cz - cx * sy * sz
    qy = cx * sy * cz + sx * cy * sz
    qz = cx * cy * sz - sx * sy * cz
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of quaternions stored as (x, y, z, w)."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )
