import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ghicp_tpu.core import transform as tf
from ghicp_tpu.core.types import PointCloud, bucket_size, cloud_bounds
from ghicp_tpu.registration import estimator


def test_bucket_size():
    assert bucket_size(1) == 256
    assert bucket_size(256) == 256
    assert bucket_size(257) == 512
    assert bucket_size(5000) == 8192


def test_pointcloud_roundtrip():
    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    pc = PointCloud.from_points(pts)
    assert pc.capacity == 256
    assert int(pc.count) == 100
    np.testing.assert_allclose(pc.to_numpy(), pts)


def test_bounds_masked():
    pts = np.array([[0, 0, 0], [1, 2, 3]], dtype=np.float32)
    pc = PointCloud.from_points(pts, capacity=8)
    b = cloud_bounds(pc)
    np.testing.assert_allclose(np.asarray(b.min_xyz), [0, 0, 0])
    np.testing.assert_allclose(np.asarray(b.max_xyz), [1, 2, 3])
    assert float(b.magnitude) == 6.0


def test_transform_apply_compose_invert():
    key = jax.random.PRNGKey(0)
    T1 = tf.random_rigid(key, 45.0, 2.0)
    T2 = tf.random_rigid(jax.random.PRNGKey(1), 45.0, 2.0)
    pts = jax.random.normal(jax.random.PRNGKey(2), (50, 3))
    a = tf.apply(tf.compose(T1, T2), pts)
    b = tf.apply(T1, tf.apply(T2, pts))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    back = tf.apply(tf.invert(T1), tf.apply(T1, pts))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_euler_convention_small_angles():
    # small yaw rotation: az should report ~ -yaw_deg under the reference's
    # atan2(R01, R00) convention (transposed sign), others ~0
    theta = np.deg2rad(2.0)
    R = np.asarray(tf.rotz(jnp.float32(theta)))
    ang = np.asarray(tf.euler_deg_zyx(jnp.asarray(R)))
    assert abs(abs(ang[2]) - 2.0) < 1e-4
    assert abs(ang[0]) < 1e-5 and abs(ang[1]) < 1e-5


@pytest.mark.parametrize("dof", [4, 6])
def test_estimator_recovers_gt(dof):
    key = jax.random.PRNGKey(3)
    T = tf.random_rigid(key, 25.0, 3.0, yaw_only=(dof == 4))
    src = jax.random.normal(jax.random.PRNGKey(4), (200, 3)) * 5.0
    dst = tf.apply(T, src)
    w = jnp.ones(200)
    # poison some rows, weight them out
    dst = dst.at[190:].add(100.0)
    w = w.at[190:].set(0.0)
    Est = estimator.estimate(src, dst, w, dof=dof)
    np.testing.assert_allclose(np.asarray(Est), np.asarray(T), atol=1e-3)


def test_estimator_zero_weights_identity():
    src = jnp.ones((10, 3))
    dst = jnp.ones((10, 3)) * 2
    T = estimator.kabsch_6dof(src, dst, jnp.zeros(10))
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-6)


def test_estimator_reflection_guard():
    # nearly-planar degenerate correspondence sets must still return a proper
    # rotation (det=+1)
    rng = np.random.default_rng(5)
    src = rng.normal(size=(50, 3)).astype(np.float32)
    src[:, 2] *= 1e-4
    T = tf.random_rigid(jax.random.PRNGKey(6), 60.0, 1.0)
    dst = tf.apply(T, jnp.asarray(src))
    Est = estimator.kabsch_6dof(jnp.asarray(src), dst, jnp.ones(50))
    det = float(jnp.linalg.det(Est[:3, :3]))
    assert abs(det - 1.0) < 1e-4


def test_similarity_solvers():
    rng = np.random.default_rng(7)
    src = rng.normal(size=(100, 3)).astype(np.float32) * 10
    # 2D similarity: scale 1.3, yaw 10deg, t=(2,-1)
    th = np.deg2rad(10.0)
    s = 1.3
    R2 = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    dst_xy = src[:, :2] @ (s * R2).T + np.array([2.0, -1.0])
    p = estimator.similarity_2d_4p(jnp.asarray(src[:, :2]),
                                   jnp.asarray(dst_xy), jnp.ones(100))
    p = np.asarray(p)
    assert abs(p[2] - s) < 1e-3
    assert abs(p[0] - 2.0) < 1e-3 and abs(p[1] + 1.0) < 1e-3

    # 7-param small-angle similarity
    small = np.array([0.01, -0.02, 0.015])
    K = np.array([[0, -small[2], small[1]],
                  [small[2], 0, -small[0]],
                  [-small[1], small[0], 0]])
    scale = 1.05
    dst = scale * (src @ (np.eye(3) + K.T)) + np.array([1.0, 2.0, 3.0])
    q = np.asarray(estimator.similarity_3d_7p(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(100)))
    assert abs(q[6] - scale) < 1e-2
    np.testing.assert_allclose(q[:3], [1.0, 2.0, 3.0], atol=0.05)
