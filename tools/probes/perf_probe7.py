"""Split keypoint-stage + downsample wall clock on the bench pair (TPU)."""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from bench import make_bench_pair
from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                   GHICPConfig)
from ghicp_tpu.core.types import PointCloud, bucket_size
from ghicp_tpu.preprocess import voxel_downsample, pca_features
from ghicp_tpu.preprocess.keypoints import (detect_keypoints,
                                            refine_positions_corner)
from ghicp_tpu.registration.pipeline import _compact, _keypoint_arrays


def t(f, n=5):
    r = f(); jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = f()
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


cfg = GHICPConfig(feature=FeatureType.BSC, correspondence=CorrespondenceType.KM,
                  voxel_size=0.1, neighborhood_radius=0.5, non_max_radius=0.5,
                  min_neighbors=15, bsc_neighbor_k=256, pca_cell_cap=40,
                  pca_max_cells=65536, estimated_overlap=0.8)

src, tgt, _ = make_bench_pair()
cs = PointCloud.from_points(src)
print("raw capacity:", cs.capacity, flush=True)

print("downsample (jit incl fetch):",
      t(lambda: _compact(voxel_downsample(cs, 0.1))), flush=True)
print("downsample (device only):",
      t(lambda: voxel_downsample(cs, 0.1)), flush=True)

ds = _compact(voxel_downsample(cs, 0.1))
print("down capacity:", ds.capacity, "count:", int(jnp.sum(ds.mask)), flush=True)

pca = lambda: pca_features(ds, radius=cfg.neighborhood_radius,
                           k=cfg.neighbor_k, cell_cap=cfg.pca_cell_cap,
                           max_cells=cfg.pca_max_cells)
print("pca_features (cell-pair):", t(pca), flush=True)
from ghicp_tpu.preprocess.pca import _pca_features_query
pca_q = lambda: _pca_features_query(ds, radius=cfg.neighborhood_radius,
                                    k=cfg.neighbor_k,
                                    cell_cap=cfg.pca_cell_cap,
                                    max_cells=cfg.pca_max_cells)
print("pca_features (per-query):", t(pca_q), flush=True)
fs = pca()
jax.block_until_ready(fs.curvature)

print("detect_keypoints (prune+compact+NMS):",
      t(lambda: detect_keypoints(ds, cfg, fs).mask), flush=True)
rs = detect_keypoints(ds, cfg, fs)
mask_np = np.asarray(rs.mask)
cap = bucket_size(int(mask_np.sum()))
kp_idx, kp_mask, _ = _keypoint_arrays(mask_np, cap)
kp = ds.xyz[kp_idx]
rr = cfg.refine_radius or 3.0 * cfg.voxel_size
print("refine_corner:",
      t(lambda: refine_positions_corner(kp, kp_mask, ds, fs, radius=rr)),
      flush=True)
