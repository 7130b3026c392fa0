"""Closed-form rigid transform estimators (masked, batched, jit-safe).

TPU-native replacements for the reference's transform solvers:

* :func:`kabsch_6dof` — weighted SVD (Umeyama) estimation, replacing PCL's
  ``TransformationEstimationSVD`` used on the GH-ICP path
  (src/ghicp_reg.cpp:857-866).
* :func:`yaw_4dof` — a *true* closed-form 4-DoF (x, y, z, yaw) solver.  The
  reference only has a Gauss-Newton variant in its unused baseline code
  (src/common_reg.cpp:622-775) and always solves 6-DoF on the main path; the
  SURVEY (§2 quirks) calls for a real 4-DoF estimator here.
* :func:`similarity_2d_4p` / :func:`similarity_3d_7p` — linear least-squares
  similarity solvers mirroring ``CSTRAN_4DOF`` / ``CSTRAN_7DOF``
  (src/common_reg.cpp:425-617).

All functions take padded correspondence arrays plus a weight/mask vector so
they compile once regardless of how many pairs matched.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ghicp_tpu.core import transform as tf
from ghicp_tpu.core.comm import LOCAL, Comm

Array = jax.Array


# Transform estimation is tiny (3x3 reductions) but accuracy-critical: pin
# full-f32 matmul precision here regardless of the global TPU default, which
# otherwise costs ~3 orders of magnitude of transform accuracy.
_HI = jax.lax.Precision.HIGHEST


def _weighted_centroids(src: Array, dst: Array, w: Array,
                        comm: Comm = LOCAL):
    wsum = jnp.maximum(comm.psum(jnp.sum(w)), 1e-12)
    cs = comm.psum(jnp.sum(src * w[:, None], axis=0)) / wsum
    cd = comm.psum(jnp.sum(dst * w[:, None], axis=0)) / wsum
    return cs, cd, wsum


def _rotation_horn(H: Array) -> Array:
    """Optimal rotation from a 3x3 cross-covariance via Horn's quaternion
    method: the dominant eigenvector of the 4x4 N matrix, found by
    NORMALIZED REPEATED SQUARING (6 squarings = power iteration to the
    64th power) plus one Rayleigh matvec.

    Pure 4x4 matmuls/vector ops: the 3x3 ``jnp.linalg.svd`` + ``det``
    custom calls cost 0.27 ms per invocation on this backend (measured),
    and the engine runs the estimator 3x per iteration (base + IRLS) —
    0.8 ms/iteration of pure eigensolver dispatch.  Quaternions
    parametrize SO(3) only, so the SVD path's reflection repair
    (det-sign trick, ghicp_reg.cpp:857-866) is built in.
    """
    Sxx, Sxy, Sxz = H[0, 0], H[0, 1], H[0, 2]
    Syx, Syy, Syz = H[1, 0], H[1, 1], H[1, 2]
    Szx, Szy, Szz = H[2, 0], H[2, 1], H[2, 2]
    N = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx]),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz]),
        jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy]),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz]),
    ])                                                  # [4,4] symmetric
    # Shift so the wanted (largest) eigenvalue is largest in magnitude.
    shift = jnp.sum(jnp.abs(H)) + 1e-9
    M = N + shift * jnp.eye(4, dtype=N.dtype)

    def sq(M, _):
        M = jnp.matmul(M, M, precision=_HI)
        return M / jnp.maximum(jnp.linalg.norm(M), 1e-30), 0

    M, _ = jax.lax.scan(sq, M / jnp.maximum(jnp.linalg.norm(M), 1e-30),
                        None, length=6)
    q = jnp.sum(M, axis=1)                   # M @ ones: dominant column mix
    q = jnp.matmul(N + shift * jnp.eye(4, dtype=N.dtype), q, precision=_HI)
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-30)
    w_, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w_ * z),
                   2 * (x * z + w_ * y)]),
        jnp.stack([2 * (x * y + w_ * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w_ * x)]),
        jnp.stack([2 * (x * z - w_ * y), 2 * (y * z + w_ * x),
                   1 - 2 * (x * x + y * y)]),
    ])


def kabsch_6dof(src: Array, dst: Array, weights: Array,
                comm: Comm = LOCAL) -> Array:
    """Weighted Kabsch/Umeyama: the rigid T minimizing sum_i w_i |T(s_i)-d_i|^2.

    Returns a [4,4] float32 transform.  Degenerate weight vectors (all zero)
    return identity.  The rotation comes from Horn's quaternion method
    (see :func:`_rotation_horn`) — same optimum as the reference's SVD
    estimator with reflections excluded by construction
    (ghicp_reg.cpp:857-866).  With a distributed comm, correspondences are
    row-sharded and the 3x3 cross-covariance reduces over the mesh axis
    (one psum); the tiny eigen solve then runs replicated on every device.
    """
    w = weights.astype(jnp.float32)
    cs, cd, wsum = _weighted_centroids(src, dst, w, comm)
    sc = (src - cs) * w[:, None]
    dc = dst - cd
    H = comm.psum(jnp.matmul(sc.T, dc, precision=_HI))  # [3,3]
    R = _rotation_horn(H.astype(jnp.float32))
    t = cd - jnp.matmul(R, cs, precision=_HI)
    T = tf.from_rt(R, t)
    ok = wsum > 1e-9
    return jnp.where(ok, T, tf.identity())


def yaw_4dof(src: Array, dst: Array, weights: Array,
             comm: Comm = LOCAL) -> Array:
    """Closed-form leveled (yaw-only) rigid estimate.

    Minimizes sum_i w_i |Rz(theta) s_i + t - d_i|^2.  The optimal yaw is
    theta = atan2(sum w (sx*dy - sy*dx), sum w (sx*dx + sy*dy)) on centered
    coordinates; translation follows from the centroids.  Replaces the
    iterative ``LLS_4DOF`` (common_reg.cpp:622-775) with one reduction.
    """
    w = weights.astype(jnp.float32)
    cs, cd, wsum = _weighted_centroids(src, dst, w, comm)
    s = src - cs
    d = dst - cd
    num = comm.psum(jnp.sum(w * (s[:, 0] * d[:, 1] - s[:, 1] * d[:, 0])))
    den = comm.psum(jnp.sum(w * (s[:, 0] * d[:, 0] + s[:, 1] * d[:, 1])))
    theta = jnp.arctan2(num, den)
    R = tf.rotz(theta).astype(jnp.float32)
    t = cd - R @ cs
    T = tf.from_rt(R, t)
    ok = wsum > 1e-9
    return jnp.where(ok, T, tf.identity())


def similarity_2d_4p(src_xy: Array, dst_xy: Array, weights: Array):
    """2D 4-parameter similarity (tx, ty, scale, yaw) via weighted LLS.

    Solves the same normal equations as ``CSTRAN_4DOF``
    (common_reg.cpp:425-515): x' = a*x - b*y + tx, y' = b*x + a*y + ty,
    with scale = hypot(a, b).  Returns (params[tx,ty,s,sin,cos], residual A).
    """
    w = weights.astype(jnp.float32)
    x, y = src_xy[:, 0], src_xy[:, 1]
    u, v = dst_xy[:, 0], dst_xy[:, 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    # rows: [1, 0, x, -y] -> u ; [0, 1, y, x] -> v
    A1 = jnp.stack([ones, zeros, x, -y], axis=1)
    A2 = jnp.stack([zeros, ones, y, x], axis=1)
    A = jnp.concatenate([A1, A2], axis=0)
    b = jnp.concatenate([u, v], axis=0)
    ww = jnp.concatenate([w, w], axis=0)
    AtA = A.T @ (A * ww[:, None])
    Atb = A.T @ (b * ww)
    sol = jnp.linalg.solve(AtA + 1e-9 * jnp.eye(4), Atb)
    tx, ty, a, bb = sol
    s = jnp.sqrt(a * a + bb * bb)
    return jnp.stack([tx, ty, s, bb / s, a / s])


def similarity_3d_7p(src: Array, dst: Array, weights: Array):
    """Linearized 7-parameter 3D similarity (tx,ty,tz,rx,ry,rz,scale).

    Same small-angle linear system as ``CSTRAN_7DOF`` (common_reg.cpp:517-617).
    """
    w = weights.astype(jnp.float32)
    x, y, z = src[:, 0], src[:, 1], src[:, 2]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    A1 = jnp.stack([ones, zeros, zeros, zeros, -z, y, x], axis=1)
    A2 = jnp.stack([zeros, ones, zeros, z, zeros, -x, y], axis=1)
    A3 = jnp.stack([zeros, zeros, ones, -y, x, zeros, z], axis=1)
    A = jnp.concatenate([A1, A2, A3], axis=0)
    b = jnp.concatenate([dst[:, 0], dst[:, 1], dst[:, 2]], axis=0)
    ww = jnp.concatenate([w, w, w], axis=0)
    AtA = A.T @ (A * ww[:, None])
    Atb = A.T @ (b * ww)
    return jnp.linalg.solve(AtA + 1e-9 * jnp.eye(7), Atb)


def estimate(src: Array, dst: Array, weights: Array, dof: int = 6,
             comm: Comm = LOCAL) -> Array:
    """Dispatch on DoF; both branches are jit-safe (static python int)."""
    if dof == 4:
        return yaw_4dof(src, dst, weights, comm)
    return kabsch_6dof(src, dst, weights, comm)
