"""A/B the bench throughput workload: warm_fused_kernel on vs off."""
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
from ghicp_tpu.registration.pipeline import register_pair  # noqa: E402


def main():
    src, tgt, _ = make_bench_pair()
    base = GHICPConfig(feature=FeatureType.BSC,
                       correspondence=CorrespondenceType.KM,
                       voxel_size=0.1, neighborhood_radius=0.5,
                       non_max_radius=0.5, min_neighbors=15,
                       bsc_neighbor_k=256, pca_cell_cap=40,
                       pca_max_cells=65536, estimated_overlap=0.8,
                       coarse_init="none", converge_translation=0.0,
                       converge_rotation=0.0, max_iterations=120,
                       engine_chunk=128, final_resolve_rounds=0)
    for warm in (True, False):
        cfg = dataclasses.replace(base, warm_fused_kernel=warm)
        register_pair(src, tgt, cfg)      # compile
        best = 0.0
        for _ in range(3):
            oh = {}
            out = register_pair(src, tgt, cfg, overhead_out=oh)
            it = max(int(out.result.iterations), 1)
            best = max(best, it / out.timings["register"])
        print(f"warm_fused={warm}: best-of-3 {best:.2f} it/s "
              f"(overhead {oh.get('dispatch_overhead', 0)*1000:.0f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
