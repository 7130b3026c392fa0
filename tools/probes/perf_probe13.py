"""Isolate: identity-start divergence at budget 32 — fused vs non-fused."""
import sys
sys.path.insert(0, "/root/repo")
import dataclasses
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

from bench import make_bench_pair
from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                   GHICPConfig)
from ghicp_tpu.registration.pipeline import register_pair, transform_error

src, tgt, T_gt = make_bench_pair()
base = GHICPConfig(feature=FeatureType.BSC,
                   correspondence=CorrespondenceType.KM,
                   voxel_size=0.1, neighborhood_radius=0.5,
                   non_max_radius=0.5, min_neighbors=15,
                   bsc_neighbor_k=256, pca_cell_cap=40,
                   pca_max_cells=65536, estimated_overlap=0.8,
                   coarse_init="none", converge_translation=0.0,
                   converge_rotation=0.0, max_iterations=30)

for fused in (True, False):
    for budget in (32, 28, 36):
        cfg = dataclasses.replace(base, auction_max_rounds=budget,
                                  fused_cost_kernel=fused)
        register_pair(src, tgt, cfg)
        t0 = time.perf_counter()
        out = register_pair(src, tgt, cfg)
        reg = out.timings["register"]
        its = max(int(out.result.iterations), 1)
        rot, tr = transform_error(out.transform, T_gt)
        cors = np.asarray(out.result.metrics.cor)[:its]
        print(f"fused={fused} budget={budget}: rot={rot:.3f} t={tr:.3f} "
              f"{its/reg:.2f} it/s cor(min/max)={cors.min()}/{cors.max()}",
              flush=True)
