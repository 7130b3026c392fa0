"""Auction budget sensitivity: pose error + engine it/s at budgets 30-100."""
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
                   max_iterations=60)

for budget, phases in ((48, 2), (48, 4), (32, 2), (16, 2)):
    cfg = dataclasses.replace(base, auction_max_rounds=budget,
                              auction_phases=phases)
    out = register_pair(src, tgt, cfg)   # accuracy run (ransac init)
    rot, tr = transform_error(out.transform, T_gt)
    # identity-start fixed-30-iteration throughput run
    cfg_tp = dataclasses.replace(cfg, coarse_init="none",
                                 converge_translation=0.0,
                                 converge_rotation=0.0, max_iterations=30)
    register_pair(src, tgt, cfg_tp)
    t0 = time.perf_counter()
    out3 = register_pair(src, tgt, cfg_tp)
    reg = out3.timings["register"]
    its = max(int(out3.result.iterations), 1)
    rot3, tr3 = transform_error(out3.transform, T_gt)
    rounds = np.asarray(out3.result.metrics.rounds)[:its]
    print(f"budget={budget} phases={phases}: ransac-run rot={rot:.3f} t={tr:.3f} "
          f"| identity-30it rot={rot3:.3f} t={tr3:.3f} "
          f"{its/reg:.2f} it/s rounds(mean)={rounds.mean():.0f}",
          flush=True)
