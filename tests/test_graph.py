"""Multi-pair station-graph registration test (BASELINE config 5)."""
import numpy as np

from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                   GHICPConfig)
from ghicp_tpu.io.synthetic import structured_scene
from ghicp_tpu.registration.graph import register_graph


def test_station_graph_chain():
    """Three stations of one scene; chained poses recover ground truth."""
    rng = np.random.default_rng(0)
    pts = structured_scene(rng, 9000, extent=8.0)

    def rigid(theta_deg, t):
        th = np.deg2rad(theta_deg)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = [[np.cos(th), -np.sin(th), 0],
                     [np.sin(th), np.cos(th), 0], [0, 0, 1]]
        T[:3, 3] = t
        return T

    # Station i's cloud = T_i^-1(scene): pose T_i maps station i -> world.
    # Adjacent-station offsets kept inside the featureless-NNR convergence
    # basin (relative rotations <= 8 degrees).
    poses_gt = [rigid(0, [0, 0, 0]), rigid(6, [1.0, -0.5, 0.1]),
                rigid(12, [0.2, 0.7, -0.1])]
    clouds = []
    for T in poses_gt:
        Ri, ti = T[:3, :3], T[:3, 3]
        local = (pts - ti) @ Ri  # R^T (x - t)
        clouds.append((local + rng.normal(0, 0.01, pts.shape))
                      .astype(np.float32))

    cfg = GHICPConfig(feature=FeatureType.NONE,
                      correspondence=CorrespondenceType.NNR,
                      voxel_size=0.15, neighborhood_radius=0.5,
                      non_max_radius=1.0, min_neighbors=8,
                      estimated_overlap=0.9, max_iterations=40)
    pairs = [(1, 0), (2, 1)]
    results, poses = register_graph(clouds, pairs, cfg,
                                    keypoint_capacity=512)
    assert len(results) == 2
    # Station poses: pose[i] maps station i frame -> station 0 frame
    # (= world, since T_0 = I).
    for i in (1, 2):
        err = poses[i] @ np.linalg.inv(poses_gt[i])
        rot = np.degrees(np.arccos(np.clip((np.trace(err[:3, :3]) - 1) / 2,
                                           -1, 1)))
        tr = np.linalg.norm(err[:3, 3])
        assert rot < 2.0 and tr < 0.3, (i, rot, tr)


def test_station_graph_fpfh():
    """FPFH station graphs: per-station FPFH descriptors + coarse init on
    the graph path (the round-2 zero-FD silent path is gone; reference
    anchor fpfh.hpp:93-115, ghicp_main.cpp:124-126)."""
    rng = np.random.default_rng(2)
    pts = structured_scene(rng, 9000, extent=8.0)
    th = np.deg2rad(8.0)
    T1 = np.eye(4, dtype=np.float32)
    T1[:3, :3] = [[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    T1[:3, 3] = [0.8, -0.4, 0.1]
    R1, t1 = T1[:3, :3], T1[:3, 3]
    clouds = [
        (pts + rng.normal(0, 0.01, pts.shape)).astype(np.float32),
        (((pts - t1) @ R1) + rng.normal(0, 0.01, pts.shape)).astype(
            np.float32),
    ]
    cfg = GHICPConfig(feature=FeatureType.FPFH,
                      correspondence=CorrespondenceType.KM,
                      voxel_size=0.15, neighborhood_radius=0.5,
                      non_max_radius=1.0, min_neighbors=8,
                      estimated_overlap=0.9, max_iterations=40,
                      ransac_hypotheses=4096)
    results, poses = register_graph(clouds, [(1, 0)], cfg,
                                    keypoint_capacity=512)
    err = poses[1] @ np.linalg.inv(T1)
    rot = np.degrees(np.arccos(np.clip((np.trace(err[:3, :3]) - 1) / 2,
                                       -1, 1)))
    tr = np.linalg.norm(err[:3, 3])
    assert rot < 2.0 and tr < 0.3, (rot, tr)


def test_register_graph_batched_matches_sequential():
    """batched=True (one vmapped engine dispatch for all pairs) must land
    the same poses as the sequential per-pair path (identical math on the
    XLA engine paths -> near-identical transforms)."""
    from ghicp_tpu.registration import transform_error
    rng = np.random.default_rng(5)
    pts = structured_scene(rng, 9000, extent=8.0)

    def rigid(theta_deg, t):
        th = np.deg2rad(theta_deg)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = [[np.cos(th), -np.sin(th), 0],
                     [np.sin(th), np.cos(th), 0], [0, 0, 1]]
        T[:3, 3] = t
        return T

    poses_gt = [rigid(0, [0, 0, 0]), rigid(6, [1.0, -0.5, 0.1]),
                rigid(12, [0.2, 0.7, -0.1])]
    clouds = []
    for T in poses_gt:
        Ri, ti = T[:3, :3], T[:3, 3]
        local = (pts - ti) @ Ri
        clouds.append((local + rng.normal(0, 0.01, pts.shape))
                      .astype(np.float32))

    cfg = GHICPConfig(feature=FeatureType.NONE,
                      correspondence=CorrespondenceType.NNR,
                      voxel_size=0.15, neighborhood_radius=0.5,
                      non_max_radius=1.0, min_neighbors=8,
                      estimated_overlap=0.9, max_iterations=40)
    pairs = [(1, 0), (2, 1)]
    rs, poses_seq = register_graph(clouds, pairs, cfg, keypoint_capacity=512)
    rb, poses_bat = register_graph(clouds, pairs, cfg, keypoint_capacity=512,
                                   batched=True)
    assert len(rb) == len(rs)
    for a, b in zip(rs, rb):
        assert (a.source, a.target) == (b.source, b.target)
        rot, tr = transform_error(a.transform, b.transform)
        assert rot < 0.5 and tr < 0.1, (rot, tr)
    for pa, pb in zip(poses_seq, poses_bat):
        rot, tr = transform_error(pa, pb)
        assert rot < 0.5 and tr < 0.1, (rot, tr)
