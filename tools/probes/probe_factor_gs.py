"""Probe: dense-lane factor-streaming GS solve (factor_gs_kernel) A/B.

Bench throughput protocol (120 identity-start iterations, engine_chunk
128, best-of-3) with the materialized-benefit path vs the matrix-free
factor path.  Usage: python tools/probes/probe_factor_gs.py [on|off|both]
"""
import dataclasses
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
from bench import make_bench_pair  # noqa: E402
from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,  # noqa
                                   GHICPConfig)
from ghicp_tpu.registration.pipeline import (register_pair,  # noqa: E402
                                             transform_error)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    src, tgt, T_gt = make_bench_pair()
    base = GHICPConfig(feature=FeatureType.BSC,
                       correspondence=CorrespondenceType.KM,
                       voxel_size=0.1, neighborhood_radius=0.5,
                       non_max_radius=0.5, min_neighbors=15,
                       bsc_neighbor_k=256, pca_cell_cap=40,
                       pca_max_cells=65536, estimated_overlap=0.8,
                       coarse_init="none", converge_translation=0.0,
                       converge_rotation=0.0, max_iterations=120,
                       engine_chunk=128)
    modes = {"on": True, "off": False}
    order = ["off", "on"] if which == "both" else [which]
    for m in order:
        cfg = dataclasses.replace(base, factor_gs_kernel=modes[m])
        out = register_pair(src, tgt, cfg)   # compile + warm
        best = 0.0
        for _ in range(3):
            o = register_pair(src, tgt, cfg)
            it = max(int(o.result.iterations), 1)
            best = max(best, it / o.timings["register"])
        rot, tr = transform_error(o.transform, T_gt)
        print(f"factor_gs={m}: best-of-3 {best:.1f} it/s "
              f"({it} iters), rot_err={rot:.3f}deg t_err={tr:.3f}m "
              f"kps={o.n_source_keypoints}/{o.n_target_keypoints}",
              flush=True)


if __name__ == "__main__":
    main()
