"""Benchmark: GH-ICP registration on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

North-star metric (BASELINE.json): GH-ICP iterations/sec/chip on a TLS-scale
pair, at reference-bound accuracy.  Two measurements feed it:

1. **Accuracy + per-pair wall-clock**: the full pipeline (voxel downsample,
   curvature keypoints, BSC encoding, auction matching, 6-DoF SVD loop) on a
   TLS-like synthetic pair — same scene geometry under two independent noise
   realizations and a 20-degree/2m rigid offset, the regime the reference's
   demo pairs (dense, sharply localized structure) represent.  Success =
   reference criterion RMSE < 1.5 * non_max_radius (ghicp_reg.cpp:918-924).
2. **Per-iteration throughput vs serial baseline**: the engine's warm
   iteration rate against a faithful serial implementation of the same
   per-iteration math — dense numpy ED + CD blend + scipy
   ``linear_sum_assignment`` (an optimized C Hungarian, strictly *faster*
   than the reference's hand-rolled recursive KM, src/km.cpp:40-126) at the
   same keypoint counts.

``vs_baseline`` is the iterations/sec ratio (ours / serial).  Details go to
stderr; stdout carries only the JSON line.
"""
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_bench_pair(n_points=800_000, extent=25.0, seed=7):
    """Shared scene geometry, independent noise, partial overlap, 6-DoF."""
    from ghicp_tpu.io.synthetic import structured_scene
    rng = np.random.default_rng(seed)
    pts = structured_scene(rng, n_points, extent=extent)
    theta = np.deg2rad(20.0)
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], np.float32)
    t = np.float32([2.0, -1.5, 0.3])
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R
    T_gt[:3, 3] = t
    src = ((pts - t) @ R
           + rng.normal(0, 0.006, pts.shape)).astype(np.float32)
    tgt = (pts + rng.normal(0, 0.006, pts.shape)).astype(np.float32)
    return src, tgt, T_gt


def baseline_iteration_time(ns, nt, n_rep=3, seed=1):
    """Serial reference-math iteration: ED + CD + Hungarian + SVD."""
    from scipy.optimize import linear_sum_assignment
    rng = np.random.default_rng(seed)
    kp_s = rng.uniform(0, 100, (max(ns, 16), 3)).astype(np.float32)
    kp_t = rng.uniform(0, 100, (max(nt, 16), 3)).astype(np.float32)
    fd = rng.uniform(0, 200, (len(kp_s), len(kp_t))).astype(np.float32)
    penalty_like = 50.0
    n = max(len(kp_s), len(kp_t))
    times = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        d = np.linalg.norm(kp_s[:, None] - kp_t[None], axis=-1)   # ED
        cd = 0.5 * 0.3 * d + 0.5 * fd                             # blend
        b = np.full((n, n), penalty_like)
        gate = cd < penalty_like
        b[:len(kp_s), :len(kp_t)] = np.where(gate, cd, penalty_like)
        ri, ci = linear_sum_assignment(b)                          # KM
        sel = (ri < len(kp_s)) & (ci < len(kp_t))
        src, dst = kp_s[ri[sel] % len(kp_s)], kp_t[ci[sel] % len(kp_t)]
        c1, c2 = src.mean(0), dst.mean(0)
        H = (src - c1).T @ (dst - c2)
        np.linalg.svd(H)                                           # SVD
        times.append(time.perf_counter() - t0)
    return min(times)


_CACHE_DIR = "/root/.ghicp_jax_cache"
_SEED_MARKER = _CACHE_DIR + "/.bench_seeded_v5"


def seed_cache():
    """Pre-seed the persistent XLA cache with every executable the bench
    (and the matching production buckets) needs: run once after install —
    ``python bench.py --seed-cache`` — and the next bench/production run
    at these scales starts warm (see also ghicp_tpu/cli/warmup.py for
    arbitrary-scale seeding).  ``main()`` invokes this automatically when
    the marker file is absent (fresh cache), so the first driver-visible
    bench run already measures warm-start numbers."""
    from ghicp_tpu.cli import warmup
    for nms in ("1.0", "0.5"):
        warmup.main(["--points", "800000", "--feature", "B",
                     "--corres", "K", "--voxel", "0.1", "--radius", "0.5",
                     "--nms", nms])
    # The identity-start throughput configuration compiles a different
    # engine executable (convergence off, chunk 128) — seed it too, via
    # one real (tiny-budget) bench-shaped run.
    import dataclasses

    from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                       GHICPConfig)
    from ghicp_tpu.registration.pipeline import register_pair
    src, tgt, _ = make_bench_pair()
    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      voxel_size=0.1, neighborhood_radius=0.5,
                      non_max_radius=0.5, min_neighbors=15,
                      bsc_neighbor_k=256, pca_cell_cap=40,
                      pca_max_cells=65536, estimated_overlap=0.8,
                      coarse_init="none", converge_translation=0.0,
                      converge_rotation=0.0, max_iterations=120,
                      engine_chunk=128)
    register_pair(src, tgt, cfg)
    import os
    os.makedirs(_CACHE_DIR, exist_ok=True)
    with open(_SEED_MARKER, "w") as f:
        f.write("seeded\n")
    log("seed-cache: all bench executables compiled")


def main():
    import jax
    # Persistent XLA cache: axon remote compiles are minutes-long; cached
    # executables make repeat bench runs compile-free.
    jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if "--seed-cache" in sys.argv:
        seed_cache()
        return
    import os
    if not os.path.exists(_SEED_MARKER):
        # Fresh cache: compile every bench executable up front (parallel
        # AOT warmup inside the pipeline) so the timed runs below are
        # warm-start numbers — the production deployment story (seed once
        # at install, run warm forever).
        log("cache marker missing -> seeding XLA cache first (one-time)")
        t0 = time.perf_counter()
        seed_cache()
        log(f"seed-cache took {time.perf_counter() - t0:.0f}s")
    import jax.numpy as jnp
    from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                       GHICPConfig)
    from ghicp_tpu.registration.pipeline import register_pair, transform_error

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    src, tgt, T_gt = make_bench_pair()
    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      voxel_size=0.1, neighborhood_radius=0.5,
                      non_max_radius=0.5, min_neighbors=15,
                      bsc_neighbor_k=256,
                      pca_cell_cap=40,  # ~25 pts/cell at this density
                      pca_max_cells=65536,  # >= occupied 0.5m cells at 25m
                      estimated_overlap=0.8, max_iterations=60)
    import dataclasses

    # PRIMARY accuracy verdict — the reference's own TLS parameterization:
    # NMS 1.0-1.5 m (script/run.sh:13-14), where the success criterion
    # RMSE_after < 1.5*NMS (ghicp_reg.cpp:918-924) is meaningful.  (At the
    # dense-keypoint NMS 0.5 below, the matched RMSE of ANY complete
    # matching is dominated by keypoint-repeatability spacing, not pose
    # quality — that config is the THROUGHPUT workload, this one is the
    # verdict/parity workload.)
    cfg_ref = dataclasses.replace(cfg, non_max_radius=1.0)
    t0 = time.perf_counter()
    out_ref = register_pair(src, tgt, cfg_ref)
    total_ref = time.perf_counter() - t0
    rot_ref, tr_ref = transform_error(out_ref.transform, T_gt)
    log(f"pair (reference params, NMS 1.0): {len(src)} x {len(tgt)} pts, "
        f"kps={out_ref.n_source_keypoints}/{out_ref.n_target_keypoints}, "
        f"iters={max(int(out_ref.result.iterations), 1)}, "
        f"rmse={out_ref.final_rmse:.3f} (bound 1.5), "
        f"rot_err={rot_ref:.2f}deg, t_err={tr_ref:.2f}m, "
        f"success={out_ref.success}, total={total_ref:.1f}s")

    # Dense-keypoint throughput configuration (NMS 0.5 -> ~6.6k keypoints).
    t0 = time.perf_counter()
    out = register_pair(src, tgt, cfg)
    total = time.perf_counter() - t0
    iters = max(int(out.result.iterations), 1)
    rot, tr = transform_error(out.transform, T_gt)
    log(f"throughput config (NMS 0.5): "
        f"kps={out.n_source_keypoints}/{out.n_target_keypoints}, "
        f"iters={iters}, matched-rmse={out.final_rmse:.3f}, "
        f"rot_err={rot:.2f}deg, t_err={tr:.2f}m")
    log(f"timings: { {k: round(v, 2) for k, v in out.timings.items()} }, "
        f"total={total:.1f}s")

    # Warm pipeline: rerun the (now compiled) full pipeline.
    t0 = time.perf_counter()
    out2 = register_pair(src, tgt, cfg)
    warm_total = time.perf_counter() - t0
    log(f"warm rerun: total={warm_total:.1f}s "
        f"timings={ {k: round(v, 2) for k, v in out2.timings.items()} } "
        f"({max(int(out2.result.iterations), 1)} iters)")

    # Engine throughput (the headline metric): the RANSAC-initialized
    # pipeline converges in ~3 iterations, too few to time stably — measure
    # sustained iterations/sec over a fixed 120-iteration identity-start
    # engine run (convergence thresholds zeroed), the same per-iteration
    # workload the serial baseline executes.  120 iterations amortize the
    # fixed per-dispatch tunnel latency (~40ms/round-trip) the way any
    # production multi-pair run would; the serial baseline likewise pays
    # no per-iteration process overhead.
    cfg_tp = dataclasses.replace(cfg, coarse_init="none",
                                 converge_translation=0.0,
                                 converge_rotation=0.0, max_iterations=120,
                                 # The post-convergence one-to-one resolve
                                 # is a ONE-TIME per-registration cost (and
                                 # this workload never converges — its
                                 # mid-churn state makes the resolve
                                 # maximally expensive); excluding it keeps
                                 # this line a pure sustained-iteration
                                 # rate, comparable with r1-r4.  Real
                                 # registrations pay it once (measured on
                                 # the NMS-1.0 verdict line above).
                                 final_resolve_rounds=0,
                                 # one device dispatch + one scalar fetch for
                                 # the whole 120-iteration run: each extra
                                 # chunk boundary costs a tunnel round trip
                                 # (~40ms) of pure host latency
                                 engine_chunk=128)
    register_pair(src, tgt, cfg_tp)          # compile
    its_per_sec = 0.0
    device_ms_per_iter = 0.0
    for _ in range(3):                       # best-of-3: tunnel variance
        oh = {}
        out3 = register_pair(src, tgt, cfg_tp, overhead_out=oh)
        reg_time = out3.timings["register"]
        iters3 = max(int(out3.result.iterations), 1)
        rate = iters3 / reg_time
        if rate > its_per_sec:
            its_per_sec = rate
            # Device time per iteration: wall minus the measured fixed
            # dispatch+fetch overhead of one chunk round trip (the probe
            # re-dispatches the same executable for zero iterations).
            n_disp = -(-iters3 // cfg_tp.engine_chunk)
            device_ms_per_iter = max(
                reg_time - n_disp * oh.get("dispatch_overhead", 0.0),
                1e-9) * 1000.0 / iters3
    log(f"engine throughput: {iters3} iters in {reg_time:.2f}s -> "
        f"best-of-3 {its_per_sec:.2f} it/s "
        f"(device {device_ms_per_iter:.3f} ms/iter, "
        f"dispatch overhead {oh.get('dispatch_overhead', 0.0)*1000:.0f} ms)")

    # Roofline: the warm iteration's HBM floor.  The single-launch warm
    # solve streams the bf16 FD matrix once per iteration (benefit tiles
    # recomputed from factors in VMEM); the residual XLA (estimator, stats,
    # carry vectors) is O(S) and negligible next to the [S, T] stream.
    from ghicp_tpu.core.types import bucket_size
    cap_b = bucket_size(max(out.n_source_keypoints,
                            out.n_target_keypoints, 1))
    hbm_gbps = 819.0  # v5e (TPU v5 lite) HBM bandwidth
    sweeps_per_iter = (1.0 if getattr(cfg_tp, "warm_fused_kernel", False)
                       else 3.0)
    floor_ms = sweeps_per_iter * cap_b * cap_b * 2 / (hbm_gbps * 1e6)
    roofline_frac = (floor_ms / device_ms_per_iter
                     if device_ms_per_iter > 0 else 0.0)
    log(f"roofline: HBM floor {floor_ms:.3f} ms/iter at {cap_b}^2 bf16 x "
        f"{sweeps_per_iter:.0f} sweeps -> fraction {roofline_frac:.2f}")

    bt = baseline_iteration_time(out.n_source_keypoints,
                                 out.n_target_keypoints)
    base_its_per_sec = 1.0 / bt
    log(f"serial baseline: {base_its_per_sec:.2f} it/s "
        f"({bt*1000:.0f} ms/iter at "
        f"{out.n_source_keypoints}x{out.n_target_keypoints})")

    print(json.dumps({
        "metric": "ghicp_iterations_per_sec_per_chip",
        "value": round(its_per_sec, 3),
        "unit": "iterations/s",
        "vs_baseline": round(its_per_sec / base_its_per_sec, 3),
        # Non-default engine overrides the throughput number was measured
        # at, so runs stay attributable/comparable across rounds.
        "engine_chunk": cfg_tp.engine_chunk,
        # Verdict at the reference's own TLS parameterization (NMS 1.0,
        # run.sh:13-14; criterion ghicp_reg.cpp:918-924).
        "reference_params_success": bool(out_ref.success),
        "reference_params_rmse": round(float(out_ref.final_rmse), 3),
        "rot_err_deg": round(rot_ref, 4),
        "t_err_m": round(tr_ref, 4),
        # Roofline accounting (VERDICT r4 task 9): device time per engine
        # iteration (wall minus measured fixed dispatch overhead) and the
        # fraction of the HBM streaming floor it reaches.
        "device_ms_per_iter": round(device_ms_per_iter, 4),
        "roofline_frac": round(roofline_frac, 4),
    }))


if __name__ == "__main__":
    main()
