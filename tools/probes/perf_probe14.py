"""Identity-start with REAL convergence thresholds across budgets."""
import sys
sys.path.insert(0, "/root/repo")
import dataclasses

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
                   coarse_init="none", max_iterations=60)

for budget in (28, 32, 36, 48):
    cfg = dataclasses.replace(base, auction_max_rounds=budget)
    out = register_pair(src, tgt, cfg)
    rot, tr = transform_error(out.transform, T_gt)
    its = int(out.result.iterations)
    print(f"budget={budget}: rot={rot:.3f} t={tr:.3f} iters={its}",
          flush=True)
