"""Round-2 start: decompose the post-warm-start iteration cost.

Sweep (budget, phases) at 30 vs 60 fixed iterations to split the marginal
per-iteration cost into per-sweep auction cost vs the fixed floor (fused
benefit kernel + repair passes + estimator + stats)."""
import sys
sys.path.insert(0, "/root/repo")
import dataclasses
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
                   converge_rotation=0.0)


def run(cfg):
    register_pair(src, tgt, cfg)  # warm
    out = register_pair(src, tgt, cfg)
    reg = out.timings["register"]
    rot, tr = transform_error(out.transform, T_gt)
    return reg, rot, tr


for budget, phases in ((8, 2), (2, 2), (8, 1), (2, 1), (32, 2)):
    cfg30 = dataclasses.replace(base, max_iterations=30,
                                auction_max_rounds=budget,
                                auction_phases=phases)
    cfg60 = dataclasses.replace(base, max_iterations=60,
                                auction_max_rounds=budget,
                                auction_phases=phases)
    r30, rot30, t30 = run(cfg30)
    r60, rot60, t60 = run(cfg60)
    slope = (r60 - r30) / 30.0
    print(f"budget{budget} phases{phases}: reg30={r30:.3f}s reg60={r60:.3f}s "
          f"marginal={slope*1000:.1f}ms/iter it/s30={30/r30:.1f} "
          f"(rot30={rot30:.2f}/{t30:.2f} rot60={rot60:.2f}/{t60:.2f})",
          flush=True)
