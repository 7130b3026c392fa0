"""Localization-aware FD (GHICPConfig.bsc_offsets): multi-offset source
encoding must IMPROVE the true-pair / impostor Hamming separation when the
two clouds' keypoint samplings disagree by a sub-voxel offset — the
measured failure mode of single-position BSC (0.1 m origin error costs
~25/441 bits; reference encodes at the raw keypoint only,
binary_feature_extraction.hpp:603-676)."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from ghicp_tpu.core.config import GHICPConfig
from ghicp_tpu.core.types import PointCloud
from ghicp_tpu.features import min_hamming_fd
from ghicp_tpu.features.bsc import extract_bsc
from ghicp_tpu.io.synthetic import structured_scene


def _separation(cfg, cloud_pts, kp_t_xyz, shift):
    """Mean (impostor-min - true-pair) Hamming margin for source keypoints
    displaced from the target keypoints by ``shift`` (localization error).
    Mimics the pipeline's multi-offset stacking."""
    cloud = PointCloud.from_points(cloud_pts)
    S = len(kp_t_xyz)
    mask = jnp.ones((S,), bool)
    kp_s_xyz = jnp.asarray(kp_t_xyz + shift)
    kp_t = jnp.asarray(kp_t_xyz)
    fs = extract_bsc(cloud, kp_s_xyz, mask, cfg, num_variants=1)
    packs = [fs.packed]
    if cfg.bsc_offsets > 1:
        delta = cfg.bsc_offset_delta or 0.5 * cfg.voxel_size
        offs = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                         [0, 0, 1], [0, 0, -1]], np.float32) * delta
        for o in offs[:cfg.bsc_offsets - 1]:
            packs.append(extract_bsc(cloud, kp_s_xyz + jnp.asarray(o),
                                     mask, cfg, num_variants=1).packed)
    packed_s = jnp.concatenate(packs, axis=0)
    ft = extract_bsc(cloud, kp_t, mask, cfg, num_variants=1)
    fd = np.asarray(min_hamming_fd(packed_s, ft.packed, fs.n_bits))
    true_fd = fd[np.arange(S), np.arange(S)]
    imp = fd + np.eye(S) * 1e6
    margin = imp.min(1) - true_fd
    return float(true_fd.mean()), float(margin.mean())


def test_multi_offset_improves_separation():
    rng = np.random.default_rng(3)
    pts = structured_scene(rng, 40000, extent=8.0).astype(np.float32)
    kp = pts[rng.choice(len(pts), 96, replace=False)]
    cfg = GHICPConfig(voxel_size=0.15, non_max_radius=0.5)
    # Worst-case half-voxel localization disagreement between samplings.
    shift = np.float32([0.08, -0.06, 0.05])
    t1, m1 = _separation(cfg, pts, kp, shift)
    cfg3 = dataclasses.replace(cfg, bsc_offsets=4)
    t3, m3 = _separation(cfg3, pts, kp, shift)
    # Offsets can only LOWER the true-pair Hamming (min over a superset)...
    assert t3 <= t1 + 1e-6
    # ...and must lower it by more than they lower the impostor floor:
    # net separation improves.
    assert m3 > m1, (m1, m3)
    # The improvement should be material, not epsilon (bits recovered).
    assert (t1 - t3) > 5.0, (t1, t3)


def test_register_pair_with_offsets():
    """bsc_offsets flows through the full pipeline (dense + streaming)."""
    from ghicp_tpu.core.config import CorrespondenceType, FeatureType
    from ghicp_tpu.registration.pipeline import register_pair, transform_error

    rng = np.random.default_rng(6)
    pts = structured_scene(rng, 15000, extent=9.0)
    th = np.deg2rad(7.0)
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    t = np.float32([0.5, -0.4, 0.1])
    T_gt = np.eye(4, dtype=np.float32); T_gt[:3, :3] = R; T_gt[:3, 3] = t
    src = ((pts - t) @ R + rng.normal(0, 0.01, pts.shape)).astype(np.float32)
    tgt = (pts + rng.normal(0, 0.01, pts.shape)).astype(np.float32)
    for scost in ("off", "on"):
        cfg = GHICPConfig(feature=FeatureType.BSC,
                          correspondence=CorrespondenceType.KM,
                          voxel_size=0.15, neighborhood_radius=0.5,
                          non_max_radius=1.0, min_neighbors=8,
                          estimated_overlap=0.9, max_iterations=25,
                          ransac_hypotheses=4096, bsc_offsets=3,
                          streaming_cost=scost)
        out = register_pair(src, tgt, cfg)
        rot, tr = transform_error(out.transform, T_gt)
        assert rot < 1.5 and tr < 0.3, (scost, rot, tr)
