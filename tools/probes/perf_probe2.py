import numpy as np, time, dataclasses, jax
jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from bench import make_bench_pair
from ghicp_tpu.core.config import CorrespondenceType, FeatureType, GHICPConfig
from ghicp_tpu.registration.pipeline import register_pair, transform_error

cfg = GHICPConfig(feature=FeatureType.BSC, correspondence=CorrespondenceType.KM,
                  voxel_size=0.1, neighborhood_radius=0.5, non_max_radius=0.5,
                  min_neighbors=15, bsc_neighbor_k=256, pca_cell_cap=40,
                  pca_max_cells=65536, estimated_overlap=0.8, max_iterations=60)
src, tgt, T_gt = make_bench_pair()
for budget in (50, 100):
    c2 = dataclasses.replace(cfg, auction_max_rounds=budget)
    c3 = dataclasses.replace(c2, coarse_init="none", converge_translation=0.0,
                             converge_rotation=0.0, max_iterations=30)
    register_pair(src, tgt, c3)
    t0 = time.perf_counter(); out3 = register_pair(src, tgt, c3)
    reg = out3.timings["register"]
    rot3, tr3 = transform_error(out3.transform, T_gt)
    print(f"budget={budget}: 30-iter identity-start {30/reg:.2f} it/s, "
          f"ends rot={rot3:.2f} t={tr3:.2f}", flush=True)
# default-pipeline accuracy across bench seeds at budget 100
c100 = dataclasses.replace(cfg, auction_max_rounds=100)
for seed in (7, 8, 9):
    src, tgt, T_gt = make_bench_pair(seed=seed)
    out = register_pair(src, tgt, c100)
    rot, tr = transform_error(out.transform, T_gt)
    print(f"seed={seed}: rot={rot:.3f} t={tr:.3f} iters={int(out.result.iterations)}", flush=True)
