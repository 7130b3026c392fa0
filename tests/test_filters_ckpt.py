"""Tests: SOR/distance/bbx filters, feature + registration checkpointing,
warm-start registration."""
import jax.numpy as jnp
import numpy as np

from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                   GHICPConfig)
from ghicp_tpu.core.types import PointCloud
from ghicp_tpu.preprocess.filters import (bbx_filter, distance_filter,
                                          sor_filter)


def test_sor_filter_drops_outliers():
    rng = np.random.default_rng(0)
    dense = rng.uniform(0, 5, (2000, 3)).astype(np.float32)
    outliers = np.float32([[50, 50, 50], [60, -40, 10], [-30, 70, 5]])
    cloud = PointCloud.from_points(np.concatenate([dense, outliers]))
    out = sor_filter(cloud, mean_k=16, std_mul=2.0, radius=1.0)
    mask = np.asarray(out.mask)
    assert not mask[2000:2003].any()          # isolated outliers gone
    assert mask[:2000].sum() > 1900           # bulk survives


def test_distance_filter():
    pts = np.float32([[1, 0, 1], [10, 0, 1], [1, 0, 9], [0, 2, -5]])
    cloud = PointCloud.from_points(pts, capacity=8)
    out = distance_filter(cloud, xy_dis_max=5.0, z_min=0.0, z_max=5.0)
    assert np.asarray(out.mask)[:4].tolist() == [True, False, False, False]


def test_bbx_filter():
    pts = np.float32([[1, 1, 1], [5, 5, 5], [9, 9, 9]])
    cloud = PointCloud.from_points(pts, capacity=8)
    out = bbx_filter(cloud, jnp.asarray([[4.0, 4, 4]]),
                     jnp.asarray([[6.0, 6, 6]]))
    assert np.asarray(out.mask)[:3].tolist() == [True, False, True]


def test_feature_checkpoint_roundtrip(tmp_path):
    from ghicp_tpu.features import extract_bsc
    from ghicp_tpu.io.checkpoint import load_features, save_features
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 5, (1500, 3)).astype(np.float32)
    cloud = PointCloud.from_points(pts)
    cfg = GHICPConfig(non_max_radius=0.8)
    kp = jnp.asarray(np.arange(8, dtype=np.int32) * 100)
    feats = extract_bsc(cloud, kp, jnp.ones(8, bool), cfg, num_variants=2)
    p = str(tmp_path / "feats.npz")
    save_features(p, feats, cfg.bsc_seed, cfg.bsc_grid_side)
    back, seed, gs = load_features(p)
    assert (np.asarray(back.packed) == np.asarray(feats.packed)).all()
    assert back.n_bits == feats.n_bits and seed == cfg.bsc_seed


def test_registration_checkpoint_and_warm_start(tmp_path):
    from ghicp_tpu.io.checkpoint import load_registration, save_registration
    from ghicp_tpu.io.synthetic import structured_scene
    from ghicp_tpu.registration import register_pair, transform_error
    rng = np.random.default_rng(2)
    pts = structured_scene(rng, 6000, extent=8.0)
    theta = np.deg2rad(10.0)
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], np.float32)
    t = np.float32([1.0, -0.5, 0.2])
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R
    T_gt[:3, 3] = t
    src = ((pts - t) @ R + rng.normal(0, 0.01, pts.shape)).astype(np.float32)
    tgt = (pts + rng.normal(0, 0.01, pts.shape)).astype(np.float32)
    cfg = GHICPConfig(feature=FeatureType.NONE,
                      correspondence=CorrespondenceType.NNR,
                      voxel_size=0.15, neighborhood_radius=0.5,
                      non_max_radius=1.0, min_neighbors=8,
                      estimated_overlap=0.9, max_iterations=40)
    out = register_pair(src, tgt, cfg)
    p = str(tmp_path / "reg.json")
    save_registration(p, out.transform, cfg,
                      {"rmse": out.final_rmse})
    T, blob = load_registration(p)
    np.testing.assert_allclose(T, out.transform, atol=1e-6)
    assert blob["config"]["reg_dof"] == 6

    # Warm start from the saved transform: converges immediately and at
    # least as accurately.
    out2 = register_pair(src, tgt, cfg, initial_transform=T)
    assert int(out2.result.iterations) <= max(int(out.result.iterations), 3)
    rot, tr = transform_error(out2.transform, T_gt)
    assert rot < 1.0 and tr < 0.2
