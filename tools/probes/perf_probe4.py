import numpy as np, time, dataclasses, jax
jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from bench import make_bench_pair
from ghicp_tpu.core.config import CorrespondenceType, FeatureType, GHICPConfig
from ghicp_tpu.registration.pipeline import register_pair, transform_error

cfg0 = GHICPConfig(feature=FeatureType.BSC, correspondence=CorrespondenceType.KM,
                   voxel_size=0.1, neighborhood_radius=0.5, non_max_radius=0.5,
                   min_neighbors=15, bsc_neighbor_k=256, pca_cell_cap=40,
                   pca_max_cells=65536, estimated_overlap=0.8,
                   coarse_init="none", converge_translation=0.0,
                   converge_rotation=0.0, max_iterations=30)
src, tgt, T_gt = make_bench_pair()
for phases in (4, 2, 1):
    c = dataclasses.replace(cfg0, auction_phases=phases)
    register_pair(src, tgt, c)
    t0 = time.perf_counter(); out = register_pair(src, tgt, c)
    reg = out.timings["register"]
    it = max(int(out.result.iterations), 1)
    rot, tr = transform_error(out.transform, T_gt)
    print(f"[phases={phases}] {reg/it*1000:.1f} ms/iter ({it/reg:.1f} it/s), "
          f"30-iter end rot={rot:.2f} t={tr:.2f}", flush=True)
