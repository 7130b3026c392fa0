"""End-to-end registration tests (SURVEY.md §4: property tests — a known
random rigid transform must be recovered within tolerance)."""
import numpy as np
import pytest

from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                   GHICPConfig)
from ghicp_tpu.io.synthetic import make_pair, structured_scene
from ghicp_tpu.registration import register_pair, transform_error


def _full_overlap_pair(seed, n=8000, rot_deg=15.0, extent=10.0,
                       yaw_only=True):
    rng = np.random.default_rng(seed)
    pts = structured_scene(rng, n, extent=extent)
    theta = np.deg2rad(rot_deg)
    if yaw_only:
        R = np.array([[np.cos(theta), -np.sin(theta), 0],
                      [np.sin(theta), np.cos(theta), 0], [0, 0, 1]],
                     np.float32)
    else:
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]])
        R = (np.eye(3) + np.sin(theta) * K
             + (1 - np.cos(theta)) * (K @ K)).astype(np.float32)
    t = rng.uniform(-1.5, 1.5, 3).astype(np.float32)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R
    T_gt[:3, 3] = t
    src = ((pts - t) @ R + rng.normal(0, 0.01, pts.shape)).astype(np.float32)
    tgt = (pts + rng.normal(0, 0.01, pts.shape)).astype(np.float32)
    return src, tgt, T_gt


BASE = dict(voxel_size=0.15, neighborhood_radius=0.5, non_max_radius=1.0,
            min_neighbors=8)


def test_nnr_icp_partial_overlap():
    src, tgt, T_gt = make_pair(seed=0, n_points=10000, rotation_deg=8.0,
                               translation=0.8, noise=0.01, overlap=0.85,
                               extent=12.0)
    cfg = GHICPConfig(feature=FeatureType.NONE,
                      correspondence=CorrespondenceType.NNR,
                      estimated_overlap=0.7, max_iterations=60, **BASE)
    out = register_pair(src, tgt, cfg)
    rot, tr = transform_error(out.transform, T_gt)
    assert out.success
    assert rot < 1.5, rot
    assert tr < 0.3, tr


def test_nn_icp_converges():
    src, tgt, T_gt = _full_overlap_pair(seed=1, rot_deg=5.0)
    cfg = GHICPConfig(feature=FeatureType.NONE,
                      correspondence=CorrespondenceType.NN,
                      estimated_overlap=0.9, max_iterations=60, **BASE)
    out = register_pair(src, tgt, cfg)
    rot, tr = transform_error(out.transform, T_gt)
    assert rot < 2.0 and tr < 0.5, (rot, tr)


def test_ghicp_bsc_km_full_overlap():
    """The headline config: BSC features + auction matching, 6-DoF."""
    src, tgt, T_gt = _full_overlap_pair(seed=2, n=8000, rot_deg=20.0)
    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      estimated_overlap=0.9, max_iterations=30, **BASE)
    out = register_pair(src, tgt, cfg)
    rot, tr = transform_error(out.transform, T_gt)
    assert out.success
    assert rot < 3.0, rot
    assert tr < 0.5, tr
    # RMSE decreases substantially over the run.
    it = int(out.result.iterations)
    rmse = np.asarray(out.result.metrics.rmse)[:it]
    # (0.7: the exact trajectory depends on the auction rounds budget and
    # warm starts — pose-accuracy assertions above are the real gate.)
    assert rmse[-1] < 0.7 * rmse[0]


def test_ghicp_fpfh_nnr():
    src, tgt, T_gt = _full_overlap_pair(seed=3, n=8000, rot_deg=10.0)
    cfg = GHICPConfig(feature=FeatureType.FPFH,
                      correspondence=CorrespondenceType.NNR,
                      estimated_overlap=0.9, max_iterations=40, **BASE)
    out = register_pair(src, tgt, cfg)
    rot, tr = transform_error(out.transform, T_gt)
    assert rot < 2.0 and tr < 0.5, (rot, tr)


def test_ghicp_4dof():
    """reg_dof=4 solves a true yaw-only transform (unlike the reference,
    which always runs 6-DoF SVD — SURVEY.md §2 quirks)."""
    src, tgt, T_gt = _full_overlap_pair(seed=4, rot_deg=12.0, yaw_only=True)
    cfg = GHICPConfig(feature=FeatureType.NONE,
                      correspondence=CorrespondenceType.NNR, reg_dof=4,
                      estimated_overlap=0.9, max_iterations=60, **BASE)
    out = register_pair(src, tgt, cfg)
    rot, tr = transform_error(out.transform, T_gt)
    assert rot < 1.5 and tr < 0.3, (rot, tr)
    # The estimated rotation is exactly yaw-only.
    R = out.transform[:3, :3]
    assert abs(R[2, 2] - 1.0) < 1e-4
    assert abs(R[0, 2]) < 1e-4 and abs(R[1, 2]) < 1e-4


def test_min_cor_early_exit():
    """Fewer than min_cor matches stops the loop (ghicp_reg.cpp:796-797)."""
    rng = np.random.default_rng(5)
    # Two tiny, far-apart clouds: NN gate kills everything.
    src = rng.uniform(0, 1, (300, 3)).astype(np.float32)
    tgt = rng.uniform(100, 101, (300, 3)).astype(np.float32) * 0 + 500.0
    cfg = GHICPConfig(feature=FeatureType.NONE,
                      correspondence=CorrespondenceType.NNR,
                      estimated_overlap=0.5, max_iterations=10,
                      voxel_size=0.05, neighborhood_radius=0.3,
                      non_max_radius=0.2, min_neighbors=3)
    out = register_pair(src, tgt, cfg)
    # Degenerate targets give ~no keypoints -> early exit without NaNs.
    assert np.isfinite(out.transform).all()
    assert int(out.result.iterations) <= 10


def test_robust_estimation_options():
    """Confidence weighting + Tukey IRLS (config-gated upgrade over the
    reference's plain SVD) must still recover a known transform and not
    degrade the plain path's accuracy."""
    src, tgt, T_gt = _full_overlap_pair(seed=6, rot_deg=10.0)
    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      estimated_overlap=0.9, max_iterations=60,
                      confidence_weighting=True, robust_irls_rounds=2,
                      **BASE)
    out = register_pair(src, tgt, cfg)
    rot, tr = transform_error(out.transform, T_gt)
    # NOTE: the reference success verdict (matched RMSE < 1.5*nonmax,
    # ghicp_reg.cpp:918-924) measures keypoint spacing once the completed
    # global matching includes every gated pair, and sits exactly at the
    # boundary for this sparse config — assert the pose itself.
    assert rot < 1.5, rot
    assert tr < 0.3, tr


def test_ghicp_identity_start_multi_seed():
    """Identity-start GH-ICP (no RANSAC init) at PRODUCTION auction
    defaults must converge across seeds — guards the truncated-auction
    dynamics (the sweep budget binds every iteration; a half-converged
    price state once flipped whole trajectories, NOTES.md 'escalate to
    convergence')."""
    for seed in (3, 7, 11):
        src, tgt, T_gt = _full_overlap_pair(seed=seed, n=8000, rot_deg=12.0)
        cfg = GHICPConfig(feature=FeatureType.BSC,
                          correspondence=CorrespondenceType.KM,
                          coarse_init="none",
                          estimated_overlap=0.9, max_iterations=30, **BASE)
        out = register_pair(src, tgt, cfg)
        rot, tr = transform_error(out.transform, T_gt)
        assert rot < 2.0, (seed, rot)
        assert tr < 0.3, (seed, tr)


def test_final_matching_one_to_one():
    """The exported final matching honors KM's one-to-one semantics
    (km.cpp:144-162): the post-convergence full-budget resolve
    (GHICPConfig.final_resolve_rounds) must leave no duplicate target
    columns, on both the dense and the streaming lane."""
    import dataclasses

    from ghicp_tpu.io.synthetic import make_pair
    from ghicp_tpu.registration.pipeline import register_pair

    src, tgt, T_gt = make_pair(seed=11, n_points=40_000, rotation_deg=12,
                               translation=1.0, noise=0.01, overlap=0.8)
    base = GHICPConfig(feature=FeatureType.BSC,
                       correspondence=CorrespondenceType.KM,
                       voxel_size=0.08, neighborhood_radius=0.3,
                       non_max_radius=0.3, min_neighbors=8,
                       estimated_overlap=0.8, max_iterations=20)
    for scfg in ("off", "on"):
        cfg = dataclasses.replace(base, streaming_cost=scfg)
        out = register_pair(np.asarray(src), np.asarray(tgt), cfg)
        m = np.asarray(out.result.matches)
        v = m[m >= 0]
        assert len(v) > 50, (scfg, len(v))
        dups = len(v) - len(np.unique(v))
        assert dups == 0, (scfg, dups)


def test_sparse_verdict_config_pose():
    """CPU-scale pin of the bench's reference-parameterization (sparse NMS)
    quality: the pose must land well inside the r4-drift bound
    (VERDICT r4 task 2: <= 0.15 deg / <= 0.04 m-equivalent, scaled to this
    scene) in a handful of iterations — guarding both the coarse-init
    consensus (any-candidate RANSAC scoring) and the warm-budget gating
    (auction_warm_min_rows) against silent regressions."""
    from ghicp_tpu.io.synthetic import structured_scene
    from ghicp_tpu.registration.pipeline import register_pair, transform_error

    rng = np.random.default_rng(21)
    pts = structured_scene(rng, 60_000, extent=12.0)
    th = np.deg2rad(18.0)
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    t = np.float32([1.0, -0.8, 0.2])
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R
    T_gt[:3, 3] = t
    src = ((pts - t) @ R + rng.normal(0, 0.008, pts.shape)).astype(np.float32)
    tgt = (pts + rng.normal(0, 0.008, pts.shape)).astype(np.float32)
    # Sparse keypoints (the verdict regime): NMS ~ 6x voxel.
    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      voxel_size=0.12, neighborhood_radius=0.5,
                      non_max_radius=0.7, min_neighbors=10,
                      estimated_overlap=0.8, max_iterations=40)
    out = register_pair(src, tgt, cfg)
    rot, tr = transform_error(out.transform, T_gt)
    # Measured healthy: 0.000 deg / 0.009 m in 20 iterations (RANSAC lands
    # 281 inliers at 0.00 deg; the remaining iterations are tie-level
    # settling below the convergence threshold).  The r4 regression mode
    # this pins down was 0.18 deg / 0.06 m over a 28-30 iteration
    # identity-start grind after the coarse init silently failed.
    assert rot <= 0.15 and tr <= 0.04, (rot, tr)
    assert int(out.result.iterations) <= 25, int(out.result.iterations)


def test_identity_multi_hypothesis():
    """identity_hypotheses > 1: schedule-shifted identity-start runs with a
    geometric-consensus selector (and a RANSAC fallback when no hypothesis
    verifies).  On TPU the 5-seed bench-scale sweep lands all < 0.1 deg
    (round 5); this CPU test covers the plumbing + selector sanity."""
    import dataclasses

    from ghicp_tpu.io.synthetic import make_pair
    from ghicp_tpu.registration.pipeline import register_pair, transform_error

    src, tgt, T_gt = make_pair(seed=3, n_points=40_000, rotation_deg=10,
                               translation=0.8, noise=0.01, overlap=0.85)
    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      voxel_size=0.08, neighborhood_radius=0.3,
                      non_max_radius=0.3, min_neighbors=8,
                      estimated_overlap=0.8, max_iterations=25,
                      coarse_init="none", identity_hypotheses=3)
    out = register_pair(np.asarray(src), np.asarray(tgt), cfg)
    rot, tr = transform_error(out.transform, T_gt)
    assert rot < 2.0 and tr < 0.3, (rot, tr)
