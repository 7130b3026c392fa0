"""Round-2 robustness sweep: production pipeline (RANSAC init, default
auction) across scene sizes, overlaps, rotations and features, on the TPU.

Prints one line per case; exits nonzero if any case misses the pose gate.
"""
import sys
sys.path.insert(0, "/root/repo")
import dataclasses

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                   GHICPConfig)
from ghicp_tpu.io.synthetic import structured_scene
from ghicp_tpu.registration.pipeline import register_pair, transform_error


def make_case(seed, n, extent, rot_deg, t, noise):
    rng = np.random.default_rng(seed)
    pts = structured_scene(rng, n, extent=extent)
    th = np.deg2rad(rot_deg)
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    t = np.asarray(t, np.float32)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R
    T_gt[:3, 3] = t
    src = ((pts - t) @ R + rng.normal(0, noise, pts.shape)).astype(np.float32)
    tgt = (pts + rng.normal(0, noise, pts.shape)).astype(np.float32)
    return src, tgt, T_gt


BASE = GHICPConfig(feature=FeatureType.BSC,
                   correspondence=CorrespondenceType.KM,
                   voxel_size=0.1, neighborhood_radius=0.5,
                   non_max_radius=0.5, min_neighbors=15,
                   bsc_neighbor_k=256, pca_cell_cap=40, pca_max_cells=65536,
                   estimated_overlap=0.8, max_iterations=60)

CASES = [
    # (tag, seed, n, extent, rot, t, noise, cfg overrides)
    ("bsc-400k-35deg", 3, 400_000, 20.0, 35.0, [3.0, -2.0, 0.4], 0.006, {}),
    ("bsc-400k-60deg", 5, 400_000, 20.0, 60.0, [1.0, 4.0, -0.2], 0.006, {}),
    ("bsc-200k-noisy", 9, 200_000, 15.0, 20.0, [2.0, 1.0, 0.1], 0.015, {}),
    ("bsc-4dof-1M", 13, 1_000_000, 30.0, 15.0, [1.5, -2.0, 0.0], 0.006,
     dict(reg_dof=4, voxel_size=0.12)),
    ("fpfh-nnr-100k", 17, 100_000, 12.0, 10.0, [0.8, -0.5, 0.1], 0.006,
     dict(feature=FeatureType.FPFH, correspondence=CorrespondenceType.NNR,
          non_max_radius=1.0)),
    ("rops-km-200k", 21, 200_000, 15.0, 15.0, [1.2, 0.8, -0.1], 0.006,
     dict(feature=FeatureType.ROPS, non_max_radius=1.0)),
]

fail = 0
for tag, seed, n, extent, rot, t, noise, over in CASES:
    src, tgt, T_gt = make_case(seed, n, extent, rot, t, noise)
    cfg = dataclasses.replace(BASE, **over)
    out = register_pair(src, tgt, cfg)
    r_err, t_err = transform_error(out.transform, T_gt)
    ok = r_err < 1.0 and t_err < 0.3
    fail += 0 if ok else 1
    print(f"{tag}: rot={r_err:.3f}deg t={t_err:.3f}m "
          f"iters={int(out.result.iterations)} "
          f"kps={out.n_source_keypoints} {'OK' if ok else 'FAIL'}",
          flush=True)
sys.exit(1 if fail else 0)
