"""Stage timing probe + auction budget sweep on the bench pair."""
import numpy as np, time, dataclasses, jax
jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from bench import make_bench_pair
from ghicp_tpu.core.config import CorrespondenceType, FeatureType, GHICPConfig
from ghicp_tpu.core.types import PointCloud, bucket_size
from ghicp_tpu.preprocess import detect_keypoints, voxel_downsample, pca_features
from ghicp_tpu.preprocess.keypoints import prune_unstable, non_max_suppression
from ghicp_tpu.registration.pipeline import _compact, register_pair, transform_error

def t(f, n=3):
    f()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); r = f(); jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)

cfg = GHICPConfig(feature=FeatureType.BSC, correspondence=CorrespondenceType.KM,
                  voxel_size=0.1, neighborhood_radius=0.5, non_max_radius=0.5,
                  min_neighbors=15, bsc_neighbor_k=256, pca_cell_cap=40,
                  pca_max_cells=65536, estimated_overlap=0.8, max_iterations=60)
src, tgt, T_gt = make_bench_pair()
cs = PointCloud.from_points(src)
ds = _compact(voxel_downsample(cs, cfg.voxel_size))
print("downsample+compact1:", round(t(lambda: _compact(voxel_downsample(cs, cfg.voxel_size)).xyz), 2), flush=True)
fs = pca_features(ds, radius=0.5, k=cfg.neighbor_k, cell_cap=cfg.pca_cell_cap,
                  max_cells=cfg.pca_max_cells)
print("pca:", round(t(lambda: pca_features(ds, radius=0.5, k=cfg.neighbor_k,
                                            cell_cap=cfg.pca_cell_cap,
                                            max_cells=cfg.pca_max_cells).curvature), 2), flush=True)
print("detect_keypoints total:", round(t(lambda: detect_keypoints(ds, cfg, fs).mask), 2), flush=True)

# budget sweep: accuracy of default pipeline + engine throughput
for budget in (300, 150, 100):
    c2 = dataclasses.replace(cfg, auction_max_rounds=budget)
    out = register_pair(src, tgt, c2)  # warm/compile
    t0 = time.perf_counter(); out = register_pair(src, tgt, c2)
    tot = time.perf_counter() - t0
    rot, tr = transform_error(out.transform, T_gt)
    c3 = dataclasses.replace(c2, coarse_init="none", converge_translation=0.0,
                             converge_rotation=0.0, max_iterations=30)
    register_pair(src, tgt, c3)
    t0 = time.perf_counter(); out3 = register_pair(src, tgt, c3)
    reg = out3.timings["register"]
    rot3, tr3 = transform_error(out3.transform, T_gt)
    print(f"budget={budget}: default rot={rot:.3f} t={tr:.3f} total={tot:.1f}s | "
          f"30-iter identity-start: {30/reg:.2f} it/s, ends rot={rot3:.2f} t={tr3:.2f}", flush=True)
