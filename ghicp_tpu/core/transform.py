"""Rigid transform utilities.

TPU-native replacement for the Eigen 4x4 matrix plumbing in the reference
(``src/ghicp_reg.cpp:791-927``, ``include/utility.h:219-239``).  Transforms are
float32 [4,4] arrays; composition order matches the reference's
``Rt_tillnow = Rt_temp * Rt_tillnow`` accumulation (ghicp_reg.cpp:93).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def identity() -> Array:
    return jnp.eye(4, dtype=jnp.float32)


def from_rt(R: Array, t: Array) -> Array:
    """Assemble a [4,4] transform from [3,3] rotation and [3] translation."""
    top = jnp.concatenate([R, t.reshape(3, 1)], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=top.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def rotation(T: Array) -> Array:
    return T[:3, :3]


def translation(T: Array) -> Array:
    return T[:3, 3]


# Full-precision matmuls: transform math is tiny but drifts over hundreds of
# ICP iterations if run at the TPU's default (bf16-pass) matmul precision.
_HI = jax.lax.Precision.HIGHEST


def apply(T: Array, pts: Array) -> Array:
    """Apply a rigid transform to [..., 3] points."""
    return jnp.matmul(pts, T[:3, :3].T, precision=_HI) + T[:3, 3]


def compose(A: Array, B: Array) -> Array:
    """A after B: returns A @ B (reference order, ghicp_reg.cpp:93)."""
    return jnp.matmul(A, B, precision=_HI)


def invert(T: Array) -> Array:
    R = T[:3, :3]
    t = T[:3, 3]
    return from_rt(R.T, -R.T @ t)


def euler_deg_zyx(R: Array) -> Array:
    """Euler angles (degrees) with the reference's extraction convention.

    Matches ghicp_reg.cpp:873-879 exactly:
      ax = atan2(R21, R22); ay = atan2(-R20, sqrt(R21^2+R22^2));
      az = atan2(R01, R00).
    Used only for the convergence test, so the convention — not its
    handedness — is what matters.
    """
    ax = jnp.arctan2(R[2, 1], R[2, 2])
    ay = jnp.arctan2(-R[2, 0], jnp.sqrt(R[2, 1] ** 2 + R[2, 2] ** 2))
    az = jnp.arctan2(R[0, 1], R[0, 0])
    return jnp.stack([ax, ay, az]) * (180.0 / jnp.pi)


def rotz(theta: Array) -> Array:
    """Rotation about +z by ``theta`` radians (4-DoF leveled case)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, -s, z]),
        jnp.stack([s, c, z]),
        jnp.stack([z, z, o]),
    ])


def random_rigid(key, max_rotation_deg: float = 30.0,
                 max_translation: float = 1.0, yaw_only: bool = False) -> Array:
    """Random rigid transform for synthetic test pairs."""
    k1, k2, k3 = jax.random.split(key, 3)
    max_rad = max_rotation_deg * jnp.pi / 180.0
    if yaw_only:
        theta = jax.random.uniform(k1, (), minval=-max_rad, maxval=max_rad)
        R = rotz(theta)
    else:
        axis = jax.random.normal(k1, (3,))
        axis = axis / jnp.linalg.norm(axis)
        angle = jax.random.uniform(k2, (), minval=-max_rad, maxval=max_rad)
        K = jnp.array([[0.0, -axis[2], axis[1]],
                       [axis[2], 0.0, -axis[0]],
                       [-axis[1], axis[0], 0.0]])
        R = jnp.eye(3) + jnp.sin(angle) * K + (1 - jnp.cos(angle)) * (K @ K)
    t = jax.random.uniform(k3, (3,), minval=-max_translation,
                           maxval=max_translation)
    return from_rt(R.astype(jnp.float32), t.astype(jnp.float32))
