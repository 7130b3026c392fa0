"""Secondary benchmark configs for BASELINE.md (the driver's headline bench
is ``bench.py``; this script measures the remaining BASELINE.json rows).

Usage:  python bench_configs.py 4        # config number

Config 4 (BASELINE.json): 1M+ point TLS pair, 4-DoF leveled (yaw-only
offset — the classic tripod-TLS case the reference only half supports:
its dof=4 mode still solves 6-DoF SVD, SURVEY.md §2 quirks; here dof=4
uses the true closed-form yaw estimator).  Reports per-stage wall clock,
engine iterations/sec and final accuracy vs ground truth.
"""
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def config4():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                       GHICPConfig)
    from ghicp_tpu.io.synthetic import structured_scene
    from ghicp_tpu.registration.pipeline import (register_pair,
                                                 transform_error)

    log(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(13)
    n_points = 1_200_000
    pts = structured_scene(rng, n_points, extent=30.0)
    theta = np.deg2rad(15.0)   # yaw only: leveled scanner
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], np.float32)
    t = np.float32([1.5, -2.0, 0.0])
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R
    T_gt[:3, 3] = t
    src = ((pts - t) @ R + rng.normal(0, 0.006, pts.shape)).astype(np.float32)
    tgt = (pts + rng.normal(0, 0.006, pts.shape)).astype(np.float32)

    # nms 0.5 gives ~8k keypoints and the best transform accuracy
    # (0.000 deg / 0.042 m measured); at the reference's TLS default
    # nms=1.0 (run.sh:13-14) keypoints drop to ~2.5k and accuracy
    # degrades to 0.73 deg / 0.11 m.  Note the reference's internal
    # "success" verdict (RMSE < 1.5*nms over *matched pairs*) is
    # dominated by the wide penalty gate's matched tail at TLS density,
    # not by registration quality — report rot/trans error vs ground
    # truth as the real metric.
    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      reg_dof=4,
                      voxel_size=0.1, neighborhood_radius=0.5,
                      non_max_radius=0.5, min_neighbors=15,
                      bsc_neighbor_k=256, pca_cell_cap=40,
                      pca_max_cells=131072,
                      estimated_overlap=0.8, max_iterations=60)
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        out = register_pair(src, tgt, cfg)
        total = time.perf_counter() - t0
        rot, tr = transform_error(out.transform, T_gt)
        iters = max(int(out.result.iterations), 1)
        its = iters / out.timings["register"]
        log(f"[{tag}] {n_points} pts -> {out.n_source_down} down, "
            f"kps={out.n_source_keypoints}/{out.n_target_keypoints}, "
            f"iters={iters} ({its:.1f} it/s), rmse={out.final_rmse:.3f}, "
            f"rot={rot:.3f}deg t={tr:.3f}m success={out.success}")
        log(f"[{tag}] timings: "
            f"{ {k: round(v, 2) for k, v in out.timings.items()} } "
            f"total={total:.1f}s")
    print(json.dumps({
        "metric": "config4_1Mpt_4dof_iterations_per_sec",
        "value": round(its, 3), "unit": "iterations/s",
        "total_wall_s": round(total, 1),
        "rot_err_deg": round(rot, 4), "t_err_m": round(tr, 4),
        "success": bool(out.success)}))


def config5():
    """Station graph (BASELINE.json config 5): N TLS stations of one scene,
    chain + loop-closure pairs, global poses via max-quality MST chaining.
    Reports warm pairs/hour on one chip and worst-station pose error vs GT.
    (The >=2-host wiring is validated separately by
    tools/run_multihost_smoke.sh — pair partitioning across processes with
    one process_allgather of transforms.)"""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                       GHICPConfig)
    from ghicp_tpu.io.synthetic import structured_scene
    from ghicp_tpu.registration.graph import register_graph
    from ghicp_tpu.registration.pipeline import transform_error

    log(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(21)
    n_stations = 6
    pts = structured_scene(rng, 250_000, extent=18.0)

    def rigid(theta_deg, t):
        th = np.deg2rad(theta_deg)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = [[np.cos(th), -np.sin(th), 0],
                     [np.sin(th), np.cos(th), 0], [0, 0, 1]]
        T[:3, 3] = t
        return T.astype(np.float32)

    poses_gt = [rigid(8.0 * i, [0.9 * i, -0.6 * i, 0.05 * i])
                for i in range(n_stations)]
    clouds = []
    for P in poses_gt:
        R, t = P[:3, :3], P[:3, 3]
        local = (pts - t) @ R   # world -> station frame (P maps local->world)
        clouds.append((local + rng.normal(0, 0.006, pts.shape)
                       ).astype(np.float32))
    pairs = [(i + 1, i) for i in range(n_stations - 1)]
    pairs.append((n_stations - 1, 0))   # loop closure

    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      voxel_size=0.1, neighborhood_radius=0.5,
                      non_max_radius=0.5, min_neighbors=15,
                      bsc_neighbor_k=256, pca_cell_cap=40,
                      pca_max_cells=65536, keypoint_capacity=8192,
                      estimated_overlap=0.9, max_iterations=40)

    best = None   # (total, worst_rot, worst_t) of the warm batched run
    for tag, batched in (("cold-batched", True), ("warm-batched", True),
                         ("warm-sequential", False)):
        t0 = time.perf_counter()
        results, poses = register_graph(clouds, pairs, cfg, batched=batched)
        total = time.perf_counter() - t0
        errs = [transform_error(poses[i], poses_gt[i])
                for i in range(n_stations)]
        worst_rot = max(e[0] for e in errs)
        worst_t = max(e[1] for e in errs)
        log(f"[{tag}] {n_stations} stations x {len(pts)} pts, "
            f"{len(pairs)} pairs in {total:.1f}s "
            f"({3600.0 * len(pairs) / total:.0f} pairs/h), "
            f"worst station pose err {worst_rot:.3f}deg / {worst_t:.3f}m")
        if tag == "warm-batched":
            best = (total, worst_rot, worst_t)
    total, worst_rot, worst_t = best
    print(json.dumps({
        "metric": "config5_station_graph_pairs_per_hour",
        "value": round(3600.0 * len(pairs) / total, 1),
        "unit": "pairs/h", "stations": n_stations,
        "worst_rot_err_deg": round(worst_rot, 4),
        "worst_t_err_m": round(worst_t, 4)}))


def config6():
    """50k x 50k keypoint pair through the matrix-free streaming lane —
    the reference's adaptive upper band (keypoint_detect.hpp:79-106).

    The reference cannot REPRESENT this problem: Energyfunction::init
    allocates three dense n_s x n_t double matrices (ghicp_reg.h:26-30) =
    3 x 8B x 50k x 50k = 60 GB before one iteration runs.  The streaming
    lane's peak footprint is the factor payload (~300 MB) — FD and the
    benefit matrix never exist; every auction sweep recomputes benefits
    from coordinates + packed BSC bits on the MXU
    (ops/stream_kernel.py).
    """
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                       GHICPConfig)
    from ghicp_tpu.io.synthetic import structured_scene
    from ghicp_tpu.registration.pipeline import (register_pair,
                                                 transform_error)

    log(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(29)
    n_points = 2_000_000
    pts = structured_scene(rng, n_points, extent=40.0)
    theta = np.deg2rad(12.0)
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], np.float32)
    t = np.float32([1.5, -1.0, 0.2])
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R
    T_gt[:3, 3] = t
    src = ((pts - t) @ R + rng.normal(0, 0.006, pts.shape)).astype(np.float32)
    tgt = (pts + rng.normal(0, 0.006, pts.shape)).astype(np.float32)

    nms = float(sys.argv[2]) if len(sys.argv) > 2 else 0.155
    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      voxel_size=0.1, neighborhood_radius=0.5,
                      non_max_radius=nms, min_neighbors=15,
                      bsc_neighbor_k=256, pca_cell_cap=40,
                      pca_max_cells=262144,
                      keypoint_capacity=51200,   # 200 x 256: tight bucket
                      estimated_overlap=0.8, max_iterations=30,
                      engine_chunk=4,    # ~each iteration is seconds of
                                         # streaming sweeps; keep device
                                         # dispatches well under the
                                         # tunnel's comfort zone
                      streaming_cost="on")
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        out = register_pair(src, tgt, cfg)
        total = time.perf_counter() - t0
        rot, tr = transform_error(out.transform, T_gt)
        iters = max(int(out.result.iterations), 1)
        its = iters / out.timings["register"]
        log(f"[{tag}] {n_points} pts -> {out.n_source_down} down, "
            f"kps={out.n_source_keypoints}/{out.n_target_keypoints}, "
            f"iters={iters} ({its:.2f} it/s), rmse={out.final_rmse:.3f}, "
            f"rot={rot:.3f}deg t={tr:.3f}m success={out.success}")
        log(f"[{tag}] timings: "
            f"{ {k: round(v, 2) for k, v in out.timings.items()} } "
            f"total={total:.1f}s")
    print(json.dumps({
        "metric": "config6_50k_keypoints_streaming_total_wall_s",
        "value": round(total, 1), "unit": "s (warm end-to-end)",
        "keypoints": [out.n_source_keypoints, out.n_target_keypoints],
        "iterations_per_sec": round(its, 3),
        "rot_err_deg": round(rot, 4), "t_err_m": round(tr, 4),
        "reference_memory_GB_dense": round(
            3 * 8 * out.n_source_keypoints * out.n_target_keypoints / 1e9,
            1),
        # The reference's RMSE<1.5*NMS verdict is parameterization-bound:
        # at this deliberately dense NMS it measures keypoint spacing,
        # not pose (see bench.py's reference-parameterization verdict,
        # which is the meaningful one).  Pose error above is the metric.
        "ref_criterion_at_dense_nms": bool(out.success)}))


def config7():
    """Simulated-TLS-scan pair: two scans of one scene from DIFFERENT scan
    origins (range-dependent density, per-origin occlusion, independent
    noise) — the closest this zero-egress environment gets to the
    reference's real ETH/WHU demo envelope (README.md:14-27).  The scan
    regime requires the localization-aware FD (bsc_offsets): per-origin
    sampling shifts where keypoints land in each scan, and without the
    offset search the descriptors decorrelate (measured at test scale:
    1.03 deg / 5.2 m at offsets=1 vs 0.55 deg / 0.19 m at 3)."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                       GHICPConfig)
    from ghicp_tpu.io.synthetic import make_tls_scan_pair
    from ghicp_tpu.registration.pipeline import (register_pair,
                                                 transform_error)

    log(f"backend: {jax.default_backend()}")
    # 3M scene points (the round-4 blocker density): the round-4 scene's
    # congruent walls admitted a ~90-degree wall-swap mode that won
    # RANSAC consensus at this density; the scan pair now defaults to
    # the de-symmetrized scene (asymmetric_walls — distinct wall heights
    # + relief statistics), which removes that basin (VERDICT r4 task 7).
    src, tgt, T_gt = make_tls_scan_pair(seed=9, n_points=3_000_000,
                                        extent=25.0, rot_deg=25.0,
                                        origin_a=(0.0, 0.0, 1.8),
                                        origin_b=(12.0, 9.0, 1.8))
    log(f"scan sizes: {len(src)} / {len(tgt)} pts")
    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      voxel_size=0.12, neighborhood_radius=0.5,
                      non_max_radius=0.6, min_neighbors=10,
                      bsc_neighbor_k=256, pca_cell_cap=40,
                      pca_max_cells=131072, estimated_overlap=0.6,
                      max_iterations=50, bsc_offsets=3)
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        out = register_pair(src, tgt, cfg)
        total = time.perf_counter() - t0
        rot, tr = transform_error(out.transform, T_gt)
        log(f"[{tag}] kps={out.n_source_keypoints}/{out.n_target_keypoints} "
            f"iters={int(out.result.iterations)} rot={rot:.3f}deg "
            f"t={tr:.3f}m total={total:.1f}s "
            f"timings={ {k: round(v, 2) for k, v in out.timings.items()} }")
    print(json.dumps({
        "metric": "config7_simulated_scan_pair_pose_err_deg",
        "value": round(rot, 4), "unit": "deg",
        "t_err_m": round(tr, 4), "total_wall_s": round(total, 1),
        "scan_points": [len(src), len(tgt)],
        "keypoints": [out.n_source_keypoints, out.n_target_keypoints]}))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "4"
    {"4": config4, "5": config5, "6": config6, "7": config7}[which]()
