"""Diagnose the verdict-pair (NMS 1.0) trajectory: warm budget on vs off.

Round-4 regression: the primary bench line went 0.11 deg / 3 iters (r3) to
0.18 deg / 28 iters (r4).  This probe runs the exact bench verdict config
with per-iteration metric dumps under several solver settings to attribute
the drift (VERDICT r4 task 2).
"""
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
                       non_max_radius=1.0, min_neighbors=15,
                       bsc_neighbor_k=256, pca_cell_cap=40,
                       pca_max_cells=65536, estimated_overlap=0.8,
                       max_iterations=60)
    variants = {
        "default(r4)": {},
        "warm_off": {"auction_warm_rounds": 0},
    }
    for name, over in variants.items():
        cfg = dataclasses.replace(base, **over)
        out = register_pair(src, tgt, cfg)
        m = out.result.metrics
        rot, tr = transform_error(out.transform, T_gt)
        it = max(int(out.result.iterations), 1)
        print(f"=== {name}: iters={it} rmse={out.final_rmse:.3f} "
              f"rot {rot:.3f} deg  t {tr:.3f} m  "
              f"kps={out.n_source_keypoints}/{out.n_target_keypoints}")
        for i in range(it):
            print(f"  it {i:2d} cor={int(m.cor[i]):5d} "
                  f"rmse={float(m.rmse[i]):8.4f} "
                  f"rmse_after={float(m.rmse_after[i]):8.4f} "
                  f"pen={float(m.penalty[i]):8.4f} "
                  f"energy={float(m.energy[i]):12.2f} "
                  f"rounds={int(m.rounds[i]):3d}")


if __name__ == "__main__":
    main()
