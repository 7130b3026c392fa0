"""Engine per-iteration cost bisection: budget 1 vs 25 vs 100; NN path."""
import numpy as np, time, dataclasses, jax
jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from bench import make_bench_pair
from ghicp_tpu.core.config import CorrespondenceType, FeatureType, GHICPConfig
from ghicp_tpu.registration.pipeline import register_pair

cfg0 = GHICPConfig(feature=FeatureType.BSC, correspondence=CorrespondenceType.KM,
                   voxel_size=0.1, neighborhood_radius=0.5, non_max_radius=0.5,
                   min_neighbors=15, bsc_neighbor_k=256, pca_cell_cap=40,
                   pca_max_cells=65536, estimated_overlap=0.8,
                   coarse_init="none", converge_translation=0.0,
                   converge_rotation=0.0, max_iterations=30)
src, tgt, T_gt = make_bench_pair()
for tag, opts in [("rounds=1", dict(auction_max_rounds=1)),
                  ("rounds=25", dict(auction_max_rounds=25)),
                  ("rounds=100", dict(auction_max_rounds=100)),
                  ("rounds=100-noirls", dict(auction_max_rounds=100,
                                             robust_irls_rounds=0,
                                             confidence_weighting=False)),
                  ("NN-path", dict(correspondence=CorrespondenceType.NN)),
                  ]:
    c = dataclasses.replace(cfg0, **opts)
    register_pair(src, tgt, c)
    t0 = time.perf_counter(); out = register_pair(src, tgt, c)
    reg = out.timings["register"]
    it = max(int(out.result.iterations), 1)
    print(f"[{tag}] {it} iters, {reg:.2f}s -> {reg/it*1000:.1f} ms/iter", flush=True)
