"""Tests for the baseline registrars (common_reg.cpp equivalents)."""
import numpy as np
import pytest

from ghicp_tpu.core.types import PointCloud
from ghicp_tpu.io.synthetic import structured_scene
from ghicp_tpu.registration.baselines import (gicp, icp_point2plane,
                                              icp_point2point, overlap_ratio,
                                              sac_ia_fpfh)
from ghicp_tpu.registration.pipeline import transform_error


def _pair(seed, n=6000, rot_deg=6.0, trans=0.5, extent=10.0, noise=0.01):
    rng = np.random.default_rng(seed)
    pts = structured_scene(rng, n, extent=extent)
    theta = np.deg2rad(rot_deg)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    R = (np.eye(3) + np.sin(theta) * K
         + (1 - np.cos(theta)) * (K @ K)).astype(np.float32)
    t = rng.uniform(-trans, trans, 3).astype(np.float32)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R
    T_gt[:3, 3] = t
    src = ((pts - t) @ R + rng.normal(0, noise, pts.shape)).astype(np.float32)
    tgt = (pts + rng.normal(0, noise, pts.shape)).astype(np.float32)
    return PointCloud.from_points(src), PointCloud.from_points(tgt), T_gt


def test_icp_point2point():
    s, t, T_gt = _pair(0)
    res = icp_point2point(s, t, corr_dist=1.5, max_iterations=50)
    rot, tr = transform_error(np.asarray(res.transform), T_gt)
    assert rot < 1.0 and tr < 0.15, (rot, tr)


def test_icp_reciprocal():
    s, t, T_gt = _pair(1)
    res = icp_point2point(s, t, corr_dist=1.5, max_iterations=50,
                          reciprocal=True)
    rot, tr = transform_error(np.asarray(res.transform), T_gt)
    assert rot < 1.0 and tr < 0.15, (rot, tr)


def test_icp_point2plane():
    s, t, T_gt = _pair(2)
    res = icp_point2plane(s, t, corr_dist=1.5, max_iterations=30)
    rot, tr = transform_error(np.asarray(res.transform), T_gt)
    assert rot < 1.0 and tr < 0.15, (rot, tr)


def test_gicp():
    s, t, T_gt = _pair(3)
    res = gicp(s, t, corr_dist=1.5, max_iterations=30)
    rot, tr = transform_error(np.asarray(res.transform), T_gt)
    assert rot < 1.0 and tr < 0.15, (rot, tr)


def _partial_pair(seed, keep=0.55, n=8000, rot_deg=5.0, trans=0.4):
    """Pair where the source only covers a slab of the target's extent —
    the regime the trimmed rejector exists for (common_reg.cpp:63-75)."""
    rng = np.random.default_rng(seed)
    pts = structured_scene(rng, n, extent=10.0)
    theta = np.deg2rad(rot_deg)
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0],
                  [0, 0, 1]], np.float32)
    t = np.float32([trans, -trans, 0.1])
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R
    T_gt[:3, 3] = t
    # Source keeps only the lower-x slab; the rest of the target has no
    # counterpart, so untrimmed ICP drags the pose toward those outliers.
    cut = np.quantile(pts[:, 0], keep)
    sel = pts[:, 0] <= cut
    src = ((pts[sel] - t) @ R
           + rng.normal(0, 0.01, (sel.sum(), 3))).astype(np.float32)
    tgt = (pts + rng.normal(0, 0.01, pts.shape)).astype(np.float32)
    return PointCloud.from_points(src), PointCloud.from_points(tgt), T_gt


def test_icp_trimmed_partial_overlap():
    """The trimmed rejector recovers a partial-overlap pose at least as well
    as untrimmed ICP, and strictly helps on the inlier RMSE."""
    s, t, T_gt = _partial_pair(6)
    plain = icp_point2point(s, t, corr_dist=1.5, max_iterations=50)
    trimmed = icp_point2point(s, t, corr_dist=1.5, max_iterations=50,
                              use_trimmed=True, min_overlap=0.2)
    rot_p, tr_p = transform_error(np.asarray(plain.transform), T_gt)
    rot_t, tr_t = transform_error(np.asarray(trimmed.transform), T_gt)
    assert bool(trimmed.ok)
    assert rot_t < 1.0 and tr_t < 0.15, (rot_t, tr_t)
    # The trim must not be worse than plain ICP on this pair.
    assert rot_t <= rot_p + 0.05 and tr_t <= tr_p + 0.02, (
        (rot_p, tr_p), (rot_t, tr_t))


def test_icp_min_overlap_gate_refuses():
    """Disjoint clouds: overlap below the gate -> ok=False, identity
    transform, zero iterations (common_reg.cpp:67-70)."""
    rng = np.random.default_rng(7)
    pts = rng.uniform(0, 5, (2000, 3)).astype(np.float32)
    a = PointCloud.from_points(pts)
    b = PointCloud.from_points(pts + np.float32([100.0, 0, 0]))
    res = icp_point2point(a, b, corr_dist=1.0, max_iterations=20,
                          use_trimmed=True, min_overlap=0.3)
    assert not bool(res.ok)
    assert int(res.iterations) == 0
    np.testing.assert_allclose(np.asarray(res.transform), np.eye(4),
                               atol=1e-6)


def test_overlap_ratio():
    rng = np.random.default_rng(4)
    pts = rng.uniform(0, 10, (2000, 3)).astype(np.float32)
    a = PointCloud.from_points(pts)
    b = PointCloud.from_points(pts + np.float32([0.01, 0, 0]))
    assert float(overlap_ratio(a, b, thresh=0.1)) > 0.99
    c = PointCloud.from_points(pts + np.float32([50, 0, 0]))
    assert float(overlap_ratio(a, c, thresh=0.1)) < 0.01


def test_sac_ia_fpfh_coarse():
    """Coarse alignment recovers a large rotation well enough for ICP."""
    from ghicp_tpu.core.config import GHICPConfig
    s, t, T_gt = _pair(5, n=4000, rot_deg=40.0, trans=2.0)
    cfg = GHICPConfig(voxel_size=0.2)
    T, score = sac_ia_fpfh(s, t, cfg, n_hypotheses=512, inlier_thresh=0.6)
    rot, tr = transform_error(np.asarray(T), T_gt)
    # Coarse: inside the basin of ICP convergence.
    assert rot < 15.0 and tr < 2.5, (rot, tr)


def test_ndt_reg_recovers_pose():
    """TPU-native NDT (the reference's disabled Reg_3DNDT comparator,
    ghicp_reg.cpp:1561-1653): damped-Newton over the voxel-Gaussian
    likelihood recovers a small rigid offset from identity."""
    from ghicp_tpu.io.synthetic import make_pair
    from ghicp_tpu.registration.baselines import ndt_reg
    from ghicp_tpu.registration.pipeline import transform_error

    src, tgt, T_gt = make_pair(seed=5, n_points=30000, rotation_deg=4.0,
                               translation=0.4, noise=0.01, overlap=0.9)
    cs = PointCloud.from_points(np.asarray(src))
    ct = PointCloud.from_points(np.asarray(tgt))
    res = ndt_reg(cs, ct, cell=0.8, max_iterations=40)
    rot, tr = transform_error(np.asarray(res.transform), T_gt)
    assert rot < 0.3 and tr < 0.05, (rot, tr)
    # the optimizer must actually improve the likelihood
    res0 = ndt_reg(cs, ct, cell=0.8, max_iterations=0)
    assert float(res.score) > 1.5 * float(res0.score)
