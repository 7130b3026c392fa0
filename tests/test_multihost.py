"""Multi-host orchestration tests (single-process semantics + the
pair-partition / gathered-MST plumbing that multi-process runs rely on)."""
import numpy as np

from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                   GHICPConfig)
from ghicp_tpu.io.synthetic import structured_scene
from ghicp_tpu.shard import (init_distributed, partition_pairs,
                             register_graph_distributed)
from ghicp_tpu.shard.multihost import _poses_from_mst_static


def test_partition_pairs_covers_all_disjointly():
    pairs = [(0, 1), (1, 2), (2, 3), (0, 2), (1, 3)]
    parts = [partition_pairs(pairs, pid, 3) for pid in range(3)]
    flat = [p for part in parts for p in part]
    assert sorted(flat) == sorted(pairs)
    assert max(len(p) for p in parts) - min(len(p) for p in parts) <= 1


def test_init_distributed_single_process_noop():
    assert init_distributed() == 1


def test_register_graph_distributed_single_process():
    rng = np.random.default_rng(11)
    base = structured_scene(rng, 12000, extent=10.0)
    theta = np.deg2rad(8.0)
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], np.float32)
    t = np.float32([0.8, -0.5, 0.2])
    clouds = [base + rng.normal(0, 0.01, base.shape).astype(np.float32),
              ((base - t) @ R + rng.normal(0, 0.01, base.shape)
               ).astype(np.float32)]
    cfg = GHICPConfig(feature=FeatureType.NONE,
                      correspondence=CorrespondenceType.NNR,
                      voxel_size=0.15, neighborhood_radius=0.5,
                      non_max_radius=1.0, min_neighbors=8,
                      estimated_overlap=0.9, max_iterations=50)
    tfs, quals, poses = register_graph_distributed(
        clouds, [(1, 0)], cfg, keypoint_capacity=1024)
    assert tfs.shape == (1, 4, 4)
    # Pose of station 1 should map its frame into station 0's ~ the pair
    # transform; rotation recovered within tolerance.
    R_got = poses[1][:3, :3]
    cos = (np.trace(R_got @ R.T) - 1.0) / 2.0
    rot_err = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    assert rot_err < 2.0, rot_err


def test_poses_from_mst_static_chains():
    # 0 -(q=.9)- 1 -(q=.8)- 2 ; plus a weak direct 0-2 edge that must lose.
    T01 = np.eye(4, dtype=np.float32); T01[:3, 3] = [1, 0, 0]
    T12 = np.eye(4, dtype=np.float32); T12[:3, 3] = [0, 1, 0]
    T02_bad = np.eye(4, dtype=np.float32); T02_bad[:3, 3] = [9, 9, 9]
    pairs = [(1, 0), (2, 1), (2, 0)]
    tfs = np.stack([T01, T12, T02_bad])
    quals = np.array([0.9, 0.8, 0.1], np.float32)
    poses = _poses_from_mst_static(3, pairs, tfs, quals)
    np.testing.assert_allclose(poses[1], T01, atol=1e-6)
    np.testing.assert_allclose(poses[2], T01 @ T12, atol=1e-6)
