"""Probe: engine throughput vs auction budget / phases / fused kernel.

Measures the bench-scale identity-start engine (30 fixed iterations) for a
grid of configs, printing it/s and final pose error per combo.  Usage:

    python tools/probe_engine.py "budget,phases,fused[,chunk]" ...

e.g.  python tools/probe_engine.py 32,2,0 16,2,0 16,1,0 32,2,1
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
    combos = []
    for a in sys.argv[1:]:
        parts = [int(x) for x in a.split(",")]
        b, p, f = parts[:3]
        c = parts[3] if len(parts) > 3 else 32
        bf16 = bool(parts[4]) if len(parts) > 4 else True
        init = "ransac" if len(parts) > 5 and parts[5] else "none"
        combos.append((b, p, bool(f), c, bf16, init))
    if not combos:
        combos = [(32, 2, False, 32, True, "none")]

    src, tgt, T_gt = make_bench_pair()
    base = GHICPConfig(feature=FeatureType.BSC,
                       correspondence=CorrespondenceType.KM,
                       voxel_size=0.1, neighborhood_radius=0.5,
                       non_max_radius=0.5, min_neighbors=15,
                       bsc_neighbor_k=256, pca_cell_cap=40,
                       pca_max_cells=65536, estimated_overlap=0.8,
                       coarse_init="none", converge_translation=0.0,
                       converge_rotation=0.0, max_iterations=30)

    for budget, phases, fused, chunk, bf16, init in combos:
        cfg = dataclasses.replace(base, auction_max_rounds=budget,
                                  auction_phases=phases,
                                  fused_cost_kernel=fused,
                                  engine_chunk=chunk, auction_bf16=bf16,
                                  coarse_init=init)
        t0 = time.perf_counter()
        register_pair(src, tgt, cfg)          # compile + warm pipeline
        compile_s = time.perf_counter() - t0
        out = register_pair(src, tgt, cfg)
        reg = out.timings["register"]
        iters = max(int(out.result.iterations), 1)
        rot, tr = transform_error(out.transform, T_gt)
        rounds = out.result.metrics.rounds[:iters]
        print(f"budget={budget} phases={phases} fused={int(fused)} "
              f"chunk={chunk} bf16={int(bf16)} init={init}: "
              f"{iters} iters in {reg:.3f}s -> "
              f"{iters/reg:.1f} it/s | rot {rot:.3f} deg t {tr:.3f} m | "
              f"rounds/iter mean {float(rounds.mean()):.1f} "
              f"max {int(rounds.max())} | first-run {compile_s:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
