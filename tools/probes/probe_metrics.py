"""Compare per-iteration engine metrics between configs (cached shapes)."""
import dataclasses
import sys

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from bench import make_bench_pair  # noqa: E402
from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,  # noqa
                                   GHICPConfig)
from ghicp_tpu.registration.pipeline import (register_pair,  # noqa: E402
                                             transform_error)


def main():
    src, tgt, T_gt = make_bench_pair()
    base = GHICPConfig(feature=FeatureType.BSC,
                       correspondence=CorrespondenceType.KM,
                       voxel_size=0.1, neighborhood_radius=0.5,
                       non_max_radius=0.5, min_neighbors=15,
                       bsc_neighbor_k=256, pca_cell_cap=40,
                       pca_max_cells=65536, estimated_overlap=0.8,
                       coarse_init="none", converge_translation=0.0,
                       converge_rotation=0.0, max_iterations=30)
    for fused in (False, True):
        cfg = dataclasses.replace(base, auction_max_rounds=32,
                                  auction_phases=2, fused_cost_kernel=fused)
        out = register_pair(src, tgt, cfg)
        m = out.result.metrics
        rot, tr = transform_error(out.transform, T_gt)
        print(f"=== fused={fused}  rot {rot:.3f} deg  t {tr:.3f} m")
        it = max(int(out.result.iterations), 1)
        for i in range(it):
            print(f"  it {i:2d} cor={int(m.cor[i]):5d} "
                  f"rmse={float(m.rmse[i]):8.4f} "
                  f"pen={float(m.penalty[i]):8.4f} "
                  f"iou={float(m.iou[i]):6.4f} "
                  f"energy={float(m.energy[i]):12.2f} "
                  f"rounds={int(m.rounds[i]):3d}")


if __name__ == "__main__":
    main()
