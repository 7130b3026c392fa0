"""Parameterized performance/accuracy probe for the GH-ICP engine.

One tool replacing the round-1/2 numbered one-off probes.  Modes:

  stages        per-stage wall-clock of the pipeline (downsample, PCA,
                keypoints) on the bench pair
  budget-sweep  accuracy + engine throughput across auction budgets/phases
  seeds         multi-seed identity-start pose robustness at a given
                budget/phases (the knife-edge check that gated the round-2
                production defaults)

Examples:
  python tools/probes/perf_probe.py stages
  python tools/probes/perf_probe.py budget-sweep --budgets 2 4 8 --phases 1
  python tools/probes/perf_probe.py seeds --budgets 2 --phases 1 \
      --seeds 7 11 23 42 101
"""
import argparse
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_config(**overrides):
    from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                       GHICPConfig)
    base = dict(feature=FeatureType.BSC,
                correspondence=CorrespondenceType.KM,
                voxel_size=0.1, neighborhood_radius=0.5, non_max_radius=0.5,
                min_neighbors=15, bsc_neighbor_k=256, pca_cell_cap=40,
                pca_max_cells=65536, estimated_overlap=0.8,
                max_iterations=60)
    base.update(overrides)
    return GHICPConfig(**base)


def timeit(f, n=3):
    f()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run_stages(args):
    from bench import make_bench_pair
    from ghicp_tpu.core.types import PointCloud
    from ghicp_tpu.preprocess import (detect_keypoints, pca_features,
                                      voxel_downsample)
    from ghicp_tpu.registration.pipeline import _compact
    cfg = bench_config()
    src, _, _ = make_bench_pair(n_points=args.n_points)
    cs = PointCloud.from_points(src)
    ds = _compact(voxel_downsample(cs, cfg.voxel_size))
    print("downsample+compact:", round(timeit(
        lambda: _compact(voxel_downsample(cs, cfg.voxel_size)).xyz), 2),
        flush=True)
    kw = dict(radius=cfg.neighborhood_radius, k=cfg.neighbor_k,
              cell_cap=cfg.pca_cell_cap, max_cells=cfg.pca_max_cells)
    fs = pca_features(ds, **kw)
    print("pca:", round(timeit(lambda: pca_features(ds, **kw).curvature), 2),
          flush=True)
    print("detect_keypoints:",
          round(timeit(lambda: detect_keypoints(ds, cfg, fs).mask), 2),
          flush=True)


def run_budget_sweep(args):
    from bench import make_bench_pair
    from ghicp_tpu.registration.pipeline import register_pair, transform_error
    src, tgt, T_gt = make_bench_pair(n_points=args.n_points)
    for budget in args.budgets:
        for phases in args.phases:
            cfg = bench_config(auction_max_rounds=budget,
                               auction_phases=phases)
            register_pair(src, tgt, cfg)          # compile
            t0 = time.perf_counter()
            out = register_pair(src, tgt, cfg)
            tot = time.perf_counter() - t0
            rot, tr = transform_error(out.transform, T_gt)
            ctp = dataclasses.replace(cfg, coarse_init="none",
                                      converge_translation=0.0,
                                      converge_rotation=0.0,
                                      max_iterations=args.tp_iters,
                                      engine_chunk=128)
            register_pair(src, tgt, ctp)
            out3 = register_pair(src, tgt, ctp)
            itps = args.tp_iters / out3.timings["register"]
            print(f"budget={budget} phases={phases}: "
                  f"rot={rot:.3f}deg t={tr:.3f}m total={tot:.1f}s | "
                  f"{itps:.1f} it/s identity-start", flush=True)


def run_seeds(args):
    from bench import make_bench_pair
    from ghicp_tpu.registration.pipeline import register_pair, transform_error
    for budget in args.budgets:
        for phases in args.phases:
            cfg = bench_config(auction_max_rounds=budget,
                               auction_phases=phases, coarse_init="none")
            worst = (0.0, 0.0)
            for seed in args.seeds:
                src, tgt, T_gt = make_bench_pair(seed=seed,
                                                 n_points=args.n_points)
                out = register_pair(src, tgt, cfg)
                rot, tr = transform_error(out.transform, T_gt)
                worst = max(worst, (rot, tr))
                print(f"  b{budget} p{phases} seed{seed}: rot={rot:.2f}deg "
                      f"t={tr:.2f}m iters={int(out.result.iterations)}",
                      flush=True)
            print(f"b{budget} p{phases}: WORST rot={worst[0]:.2f} "
                  f"t={worst[1]:.2f}", flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["stages", "budget-sweep", "seeds"])
    ap.add_argument("--budgets", type=int, nargs="+", default=[2])
    ap.add_argument("--phases", type=int, nargs="+", default=[1])
    ap.add_argument("--seeds", type=int, nargs="+", default=[7, 11, 23])
    ap.add_argument("--n-points", type=int, default=800_000)
    ap.add_argument("--tp-iters", type=int, default=30,
                    help="identity-start iterations for throughput timing")
    args = ap.parse_args()
    {"stages": run_stages, "budget-sweep": run_budget_sweep,
     "seeds": run_seeds}[args.mode](args)


if __name__ == "__main__":
    main()
