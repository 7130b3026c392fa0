"""End-to-end registration pipeline: the TPU equivalent of ghicp_main.

Host-side orchestration mirroring ``test/ghicp_main.cpp:56-160``:
read -> voxel downsample -> curvature keypoints -> feature encoding ->
GH-ICP iteration -> final transform.  Between stages the padded clouds are
compacted host-side into power-of-two buckets so every jitted stage compiles
for a small set of static shapes (SURVEY.md §7 "static shapes").
"""
from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ghicp_tpu.core.config import FeatureType, GHICPConfig
from ghicp_tpu.core.types import PointCloud, bucket_size, cloud_bounds
from ghicp_tpu.features import (extract_bsc, fpfh_features,
                                fpfh_similarity_matrix, min_hamming_fd)
from ghicp_tpu.preprocess import detect_keypoints, voxel_downsample
from ghicp_tpu.registration.ghicp import (GHICPResult,
                                          ghicp_register_chunked)


@dataclasses.dataclass
class RegistrationOutput:
    transform: np.ndarray          # [4,4] source -> target
    result: GHICPResult
    n_source_down: int
    n_target_down: int
    n_source_keypoints: int
    n_target_keypoints: int
    timings: Dict[str, float]
    # Detected (refined) keypoint coordinates, valid rows only, in the
    # ORIGINAL input frames — the ``savecoordinates`` export surface
    # (dataio.hpp:609-626).  Source rows are in the engine's (Morton) row
    # order, so ``result.matches[:n_source_keypoints]`` indexes straight
    # into ``keypoints_source`` and target columns into ``keypoints_target``.
    keypoints_source: Optional[np.ndarray] = None   # [nks, 3]
    keypoints_target: Optional[np.ndarray] = None   # [nkt, 3]

    def final_correspondences(self) -> np.ndarray:
        """Final matched pairs as an [M, 8] array: (src_row, tgt_col,
        sx, sy, sz, tx, ty, tz) with source coordinates REGISTERED (the
        last iteration's ``Corres.txt`` dump, km.cpp:144-162).
        """
        matches = np.asarray(self.result.matches)[
            :len(self.keypoints_source)]
        rows = np.nonzero(matches >= 0)[0]
        cols = matches[rows]
        sp = self.keypoints_source[rows]
        sp = sp @ self.transform[:3, :3].T + self.transform[:3, 3]
        tp = self.keypoints_target[cols]
        return np.concatenate([rows[:, None].astype(np.float64),
                               cols[:, None].astype(np.float64),
                               sp.astype(np.float64),
                               tp.astype(np.float64)], axis=1)

    @property
    def success(self) -> bool:
        return bool(self.result.success)

    @property
    def final_rmse(self) -> float:
        return float(self.result.final_rmse)


def _compact(cloud: PointCloud, capacity: Optional[int] = None) -> PointCloud:
    from ghicp_tpu.core.types import compact_device
    return compact_device(cloud, capacity)


def _keypoint_arrays(mask: np.ndarray, capacity: int):
    idx = np.nonzero(mask)[0].astype(np.int32)
    n = len(idx)
    out = np.zeros(capacity, np.int32)
    out[:n] = idx[:capacity]
    m = np.zeros(capacity, bool)
    m[:min(n, capacity)] = True
    return jnp.asarray(out), jnp.asarray(m), n


def _morton_order_rows(xyz, mask):
    """Spatial (Morton) ordering of keypoint rows.

    The auction kernel tiles SOURCE rows; rows contesting the same targets
    are spatial neighbors (the cost is ED-dominated late), so a spatial row
    order turns cross-tile eviction chains into intra-tile ones that the
    kernel's tile-local quiescence resolves in VMEM.  Matching semantics are
    order-invariant; only the tiling locality changes."""
    from ghicp_tpu.ops.nms_kernel import _spread3
    mn = jnp.min(jnp.where(mask[:, None], xyz, 3e38), axis=0)
    mx = jnp.max(jnp.where(mask[:, None], xyz, -3e38), axis=0)
    q = jnp.maximum(jnp.max(mx - mn), 1e-6) / 1023.0
    ig = jnp.clip((xyz - mn[None, :]) / q, 0.0, 1023.0).astype(jnp.int32)
    code = (_spread3(ig[:, 0]) | (_spread3(ig[:, 1]) << 1)
            | (_spread3(ig[:, 2]) << 2))
    code = jnp.where(mask, code, jnp.int32(2**31 - 1))
    return jnp.argsort(code).astype(jnp.int32)


def _dummy_stream_features(cap: int, config: GHICPConfig):
    """Right-shaped zero factor payload (compile warmup only)."""
    from ghicp_tpu.ops.stream_kernel import StreamFeatures
    if config.feature == FeatureType.BSC:
        F = -(-config.bsc_total_bits // 128) * 128
        V = config.bsc_num_variants
        # int8 bit factors — must match make_stream_features' dtype or
        # the warm compile keys miss.
        return StreamFeatures(fs=jnp.zeros((V, cap, F), jnp.int8),
                              ft=jnp.zeros((cap, F), jnp.int8),
                              na=jnp.zeros((V, cap), jnp.float32),
                              nb=jnp.zeros((cap,), jnp.float32))
    elif config.feature == FeatureType.FPFH:
        F, V = 128, 1
    elif config.feature == FeatureType.ROPS:
        # RoPS descriptor length: 3 axes x rotations x 3 planes x 5 stats
        d = 3 * config.rops_rotations * 3 * 5
        F, V = -(-d // 128) * 128, 1
    else:
        F, V = 128, 1
    return StreamFeatures(fs=jnp.zeros((V, cap, F), jnp.bfloat16),
                          ft=jnp.zeros((cap, F), jnp.bfloat16),
                          na=jnp.zeros((V, cap), jnp.float32),
                          nb=jnp.zeros((cap,), jnp.float32))


def _launch_compile_warmup(cap: int, config: GHICPConfig, use_stream: bool):
    """Background threads that AOT-compile the downstream-stage
    executables (engine chunk, RANSAC coarse init) at the REAL shapes via
    ``jit(...).lower(...).compile()`` while the main thread extracts
    features.  Compiles parallelize ~3x on the remote TPU backend
    (measured round 3).  AOT compilation is thread-isolated — it never
    touches the shared jit call cache (calling jitted functions from
    threads with different signatures races that cache) — and it seeds
    the persistent XLA compilation cache, so the later real call's
    compile is a cache hit (it re-pays only tracing/lowering).  Warm
    failures are swallowed; the real call would surface anything real."""
    import threading

    def _warm_engine():
        try:
            from ghicp_tpu.registration.ghicp import (_ghicp_chunk,
                                                      _initial_state)
            kp0 = jnp.zeros((cap, 3), jnp.float32)
            m0 = jnp.zeros((cap,), bool)
            st0 = _initial_state(kp0, cap, config, None, 0.0)
            if use_stream:
                fd0 = None
                sf = _dummy_stream_features(cap, config)
            else:
                fd0 = jnp.zeros((cap, cap), jnp.float32)
                sf = None
            _ghicp_chunk.lower(st0, kp0, m0, m0, fd0, jnp.float32(1.0),
                               config, config.engine_chunk,
                               stream=sf).compile()
        except Exception:
            pass

    def _warm_ransac():
        try:
            if config.coarse_init != "ransac" or \
                    config.feature == FeatureType.NONE:
                return
            from ghicp_tpu.matching.ransac import ransac_coarse_align
            kp0 = jnp.zeros((cap, 3), jnp.float32)
            m0 = jnp.zeros((cap,), bool)
            frames0 = (jnp.zeros((cap, 3, 3), jnp.float32)
                       if config.feature == FeatureType.BSC else None)
            tau = config.ransac_tau or 3.0 * config.voxel_size
            if use_stream:
                Sr = cap
                if Sr > config.ransac_max_rows:
                    stride = -(-Sr // config.ransac_max_rows)
                    n_rows = len(range(0, Sr, stride))
                else:
                    n_rows = Sr
                kp_r = jnp.zeros((n_rows, 3), jnp.float32)
                m_r = jnp.zeros((n_rows,), bool)
                fr = (jnp.zeros((n_rows, 3, 3), jnp.float32)
                      if frames0 is not None else None)
                cand = jnp.zeros((n_rows, 2), jnp.int32)
                cand_ok = jnp.zeros((n_rows, 2), bool)
                ransac_coarse_align.lower(
                    kp_r, m_r, kp0, m0, None, tau=tau,
                    n_hyp=config.ransac_hypotheses,
                    frames_s=fr, frames_t=frames0,
                    cand=cand, cand_ok=cand_ok).compile()
            else:
                fd0 = jnp.zeros((cap, cap), jnp.float32)
                ransac_coarse_align.lower(
                    kp0, m0, kp0, m0, fd0, tau=tau,
                    n_hyp=config.ransac_hypotheses,
                    n_cand=config.ransac_candidates,
                    frames_s=frames0, frames_t=frames0).compile()
        except Exception:
            pass

    threads = [threading.Thread(target=_warm_engine, daemon=True),
               threading.Thread(target=_warm_ransac, daemon=True)]
    for t in threads:
        t.start()
    return threads


def register_pair(source_pts: np.ndarray, target_pts: np.ndarray,
                  config: GHICPConfig,
                  keypoint_capacity: Optional[int] = None,
                  initial_transform: Optional[np.ndarray] = None,
                  profile_dir: Optional[str] = None,
                  iteration_callback=None,
                  overhead_out: Optional[dict] = None) -> RegistrationOutput:
    """Register ``source`` onto ``target`` (both raw [n,3] float arrays).

    Follows ghicp_main.cpp's stage order; returns the final [4,4] transform
    plus per-iteration metrics.  ``profile_dir`` wraps the run in a
    ``jax.profiler`` trace (the reference's only tracing is ad-hoc clock_t
    timing, common_reg.cpp:55-56; SURVEY.md §5).
    """
    if profile_dir is not None:
        with jax.profiler.trace(profile_dir):
            return register_pair(source_pts, target_pts, config,
                                 keypoint_capacity, initial_transform, None,
                                 iteration_callback, overhead_out)
    timings: Dict[str, float] = {}
    t0 = time.perf_counter()
    cs = PointCloud.from_points(source_pts)
    ct = PointCloud.from_points(target_pts)

    # --- downsample (ghicp_main.cpp:88-90) ---
    # Both clouds dispatch async; the only host syncs are ONE paired count
    # fetch (for the static compaction buckets) and the final block.  Every
    # extra scalar materialization costs a remote-transport round trip
    # (~30-50ms through the tunnel).
    vs = voxel_downsample(cs, config.voxel_size)
    vt = voxel_downsample(ct, config.voxel_size)
    # One [2]-array fetch: scalar materializations through the tunnel cost
    # ~170ms EACH (fresh scalar buffers are far slower than array fetches).
    n_vs, n_vt = jax.device_get(
        jnp.stack([jnp.sum(vs.mask), jnp.sum(vt.mask)]))
    # SHARED downsample bucket: with per-cloud buckets, source and target
    # landing one bucket apart doubles every downstream compile (PCA,
    # keypoint detect, refinement, feature extraction all specialize on
    # the cloud shape) — the dominant fresh-cache cost.  Padding the
    # smaller cloud up to the larger bucket is pure mask slack.
    cap_d = max(bucket_size(int(n_vs)), bucket_size(int(n_vt)))
    ds = _compact(vs, capacity=cap_d)
    dt = _compact(vt, capacity=cap_d)
    jax.block_until_ready((ds.xyz, dt.xyz))
    timings["downsample"] = time.perf_counter() - t0

    # bbx magnitude of the downsampled source (ghicp_main.cpp:92-93) —
    # stays a device scalar all the way into the engine (fetching it here
    # would stall the pipeline for a round trip).
    bbx = cloud_bounds(ds).magnitude

    # --- keypoints (ghicp_main.cpp:96-100) + sub-voxel refinement ---
    t0 = time.perf_counter()
    fs_pca = ft_pca = None
    if config.adaptive_keypoints:
        from ghicp_tpu.preprocess import adaptive_detect
        rs = adaptive_detect(ds, config)
        rt = adaptive_detect(dt, config)
    else:
        from ghicp_tpu.preprocess.pca import pca_features_pair
        fs_pca, ft_pca = pca_features_pair(
            ds, dt, radius=config.neighborhood_radius,
            cell_cap=config.pca_cell_cap, max_cells=config.pca_max_cells)
        rs = detect_keypoints(ds, config, fs_pca)
        rt = detect_keypoints(dt, config, ft_pca)
    # One paired fetch of both keypoint masks (vs two round trips).
    mask_s_np, mask_t_np = jax.device_get((rs.mask, rt.mask))
    nks, nkt = int(mask_s_np.sum()), int(mask_t_np.sum())
    cap = keypoint_capacity or config.keypoint_capacity or bucket_size(
        max(nks, nkt, 1))
    kp_s_idx, kp_s_mask, _ = _keypoint_arrays(mask_s_np, cap)
    kp_t_idx, kp_t_mask, _ = _keypoint_arrays(mask_t_np, cap)
    # Spatial row order for the auction kernel's tile locality.
    so = _morton_order_rows(ds.xyz[kp_s_idx], kp_s_mask)
    kp_s_idx, kp_s_mask = kp_s_idx[so], kp_s_mask[so]

    kp_s = ds.xyz[kp_s_idx]
    kp_t = dt.xyz[kp_t_idx]
    if config.refine_keypoints and fs_pca is not None:
        rr = config.refine_radius or 3.0 * config.voxel_size
        if config.refine_method == "corner":
            from ghicp_tpu.preprocess.keypoints import refine_positions_corner
            kp_s = refine_positions_corner(kp_s, kp_s_mask, ds, fs_pca,
                                           radius=rr)
            kp_t = refine_positions_corner(kp_t, kp_t_mask, dt, ft_pca,
                                           radius=rr)
        else:
            from ghicp_tpu.preprocess.keypoints import (compact_candidates,
                                                        refine_positions)
            cc_s, curv_s = compact_candidates(ds, fs_pca, rs.candidates)
            cc_t, curv_t = compact_candidates(dt, ft_pca, rt.candidates)
            kp_s = refine_positions(kp_s, kp_s_mask, cc_s, curv_s, radius=rr)
            kp_t = refine_positions(kp_t, kp_t_mask, cc_t, curv_t, radius=rr)
    timings["keypoints"] = time.perf_counter() - t0

    # --- features (ghicp_main.cpp:107-141) ---
    t0 = time.perf_counter()
    # Streaming (matrix-free) lane decision: never build the [cap, cap]
    # FD matrix; the engine recomputes the cost field from these factors
    # inside each auction sweep (ops/stream_kernel.py).
    from ghicp_tpu.core.config import CorrespondenceType
    # The matrix-free lane serves all three correspondence modes: KM via
    # the streaming auction, NN/NNR via single-sweep top-1 + column-side
    # reductions (the dense [S,T] FD never materializes for any of them).
    use_stream = (config.streaming_cost == "on"
                  or (config.streaming_cost == "auto"
                      and cap > config.streaming_threshold))
    stream_feats = None
    fd = None
    warm_threads = []
    if config.parallel_compile_warmup:
        warm_threads = _launch_compile_warmup(cap, config, use_stream)
    if config.feature == FeatureType.BSC:
        fs = extract_bsc(ds, kp_s, kp_s_mask, config,
                         num_variants=config.bsc_num_variants)
        if config.bsc_offsets > 1:
            # Localization-aware FD (GHICPConfig.bsc_offsets): re-encode
            # the source keypoints at small spatial offsets and stack the
            # packed words on the VARIANT axis — the existing min-over-
            # variants Hamming (dense min_hamming_fd / streaming factor
            # min) then searches over detector localization error for
            # free.  Target side stays single (like the flip variants,
            # bfe.hpp:603-676: 2/4 source, 1 target).
            delta = config.bsc_offset_delta or 0.5 * config.voxel_size
            offs = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                             [0, 0, 1], [0, 0, -1]], np.float32) * delta
            kp_s_xyz = ds.xyz[kp_s] if kp_s.ndim == 1 else kp_s
            packs = [fs.packed]
            for o in offs[:config.bsc_offsets - 1]:
                fso = extract_bsc(ds, kp_s_xyz + jnp.asarray(o),
                                  kp_s_mask, config,
                                  num_variants=config.bsc_num_variants)
                packs.append(fso.packed)
            fs = fs._replace(packed=jnp.concatenate(packs, axis=0))
        ft = extract_bsc(dt, kp_t, kp_t_mask, config, num_variants=1)
        if use_stream:
            from ghicp_tpu.ops.stream_kernel import make_stream_features
            stream_feats = make_stream_features(packed_s=fs.packed,
                                                packed_t=ft.packed,
                                                n_bits=fs.n_bits)
        else:
            fd = min_hamming_fd(fs.packed, ft.packed, fs.n_bits,
                                use_mxu=config.use_mxu_hamming)
    elif config.feature == FeatureType.FPFH:
        radius = config.fpfh_radius or 3.0 * config.voxel_size
        hs, _ = fpfh_features(ds, radius=radius, k=max(config.fpfh_k, 24))
        ht, _ = fpfh_features(dt, radius=radius, k=max(config.fpfh_k, 24))
        if use_stream:
            from ghicp_tpu.ops.stream_kernel import make_stream_features
            stream_feats = make_stream_features(desc_s=hs[kp_s_idx],
                                                desc_t=ht[kp_t_idx])
        else:
            fd = fpfh_similarity_matrix(hs[kp_s_idx], ht[kp_t_idx])
    elif config.feature == FeatureType.ROPS:
        # Implemented beyond reference parity (features/rops.py; the
        # reference's RoPS is enum-only, ghicp_main.cpp:130-134).  Rides
        # the FPFH similarity lane of the engine.
        from ghicp_tpu.features import rops_features, rops_similarity_matrix
        rr_rad = config.rops_radius or float(config.non_max_radius)
        rf_s = rops_features(ds, kp_s, kp_s_mask, radius=rr_rad,
                             neighbor_k=config.rops_neighbor_k,
                             n_rotations=config.rops_rotations,
                             n_bins=config.rops_bins)
        rf_t = rops_features(dt, kp_t, kp_t_mask, radius=rr_rad,
                             neighbor_k=config.rops_neighbor_k,
                             n_rotations=config.rops_rotations,
                             n_bins=config.rops_bins)
        if use_stream:
            from ghicp_tpu.ops.stream_kernel import make_stream_features
            stream_feats = make_stream_features(desc_s=rf_s.desc,
                                                desc_t=rf_t.desc,
                                                standardize="dims")
        else:
            fd = rops_similarity_matrix(rf_s.desc, rf_t.desc)
    elif use_stream:
        # Feature "none" streaming: zero bit factors (FD identically 0,
        # matching the dense zeros matrix; W_FD is 0 on this lane anyway).
        from ghicp_tpu.ops.stream_kernel import StreamFeatures
        stream_feats = StreamFeatures(
            fs=jnp.zeros((1, cap, 128), jnp.bfloat16),
            ft=jnp.zeros((cap, 128), jnp.bfloat16),
            na=jnp.zeros((1, cap), jnp.float32),
            nb=jnp.zeros((cap,), jnp.float32))
    else:
        fd = jnp.zeros((cap, cap), jnp.float32)
    jax.block_until_ready(stream_feats.ft if use_stream else fd)
    timings["features"] = time.perf_counter() - t0
    for t in warm_threads:
        # Downstream compiles (engine/RANSAC) finished or in flight; join
        # so the real calls below hit the compiled executables.
        t.join()

    # --- registration (ghicp_main.cpp:144-151) ---
    t0 = time.perf_counter()
    T0 = None if initial_transform is None else jnp.asarray(
        initial_transform, jnp.float32)
    it_shift = 0.0
    if (T0 is None and config.coarse_init == "ransac"
            and config.feature != FeatureType.NONE):
        from ghicp_tpu.matching.ransac import ransac_coarse_align
        tau = config.ransac_tau or 3.0 * config.voxel_size
        frames_s = frames_t = None
        if config.feature == FeatureType.BSC:
            # Reuse the LCS frames the BSC encoder already computed (same
            # radius/neighbor_k) instead of a second neighbor search +
            # weighted PCA per keypoint set (bsc_frames).
            frames_s = fs.frames
            frames_t = ft.frames
        if use_stream:
            # Matrix-free candidates: one factor-product scan instead of
            # top_k over the (never-built) [cap, cap] FD matrix.  Source
            # rows capped at ransac_max_rows (strided over the Morton
            # order = spatially uniform): at flagship scale the full-row
            # candidate pass would cost as much as an auction sweep, and
            # the consensus vote saturates long before 50k rows.
            from ghicp_tpu.ops.stream_kernel import (StreamFeatures,
                                                     stream_feature_candidates)
            Sr = kp_s.shape[0]
            if Sr > config.ransac_max_rows:
                stride = -(-Sr // config.ransac_max_rows)
                rsel = jnp.arange(0, Sr, stride)
                sf = StreamFeatures(fs=stream_feats.fs[:, rsel],
                                    ft=stream_feats.ft,
                                    na=stream_feats.na[:, rsel],
                                    nb=stream_feats.nb)
                kp_s_r = kp_s[rsel]
                mask_s_r = kp_s_mask[rsel]
                frames_s_r = None if frames_s is None else frames_s[rsel]
            else:
                sf, kp_s_r, mask_s_r, frames_s_r = (stream_feats, kp_s,
                                                    kp_s_mask, frames_s)
            cand, cand_ok = stream_feature_candidates(
                sf, mask_s_r, kp_t_mask,
                mult_blend=config.feature in (FeatureType.FPFH,
                                              FeatureType.ROPS))
            rr = ransac_coarse_align(kp_s_r, mask_s_r, kp_t, kp_t_mask,
                                     None, tau=tau,
                                     n_hyp=config.ransac_hypotheses,
                                     frames_s=frames_s_r, frames_t=frames_t,
                                     cand=cand, cand_ok=cand_ok)
        else:
            # fd is a distance for BSC (Hamming) and a similarity in [0,1]
            # for FPFH — flip the latter so smaller = more similar.
            fd_dist = (1.0 - fd) if config.feature in (
                FeatureType.FPFH, FeatureType.ROPS) else fd
            rr = ransac_coarse_align(kp_s, kp_s_mask, kp_t, kp_t_mask,
                                     fd_dist, tau=tau,
                                     n_hyp=config.ransac_hypotheses,
                                     n_cand=config.ransac_candidates,
                                     frames_s=frames_s, frames_t=frames_t)
        if int(rr.inliers) >= config.ransac_min_inliers:
            T0 = rr.transform
            # Skip the feature-dominant schedule phase: W_FD starts at
            # exp(-3) — iteration 0's pure-FD global matching would discard
            # the verified pose (W_ED = 0 at iteration 0).
            it_shift = 3.0 * config.weight_changing_rate
        timings["coarse_init"] = time.perf_counter() - t0
        t0 = time.perf_counter()
    # Host-stepped dispatch: one device call per few iterations (remote-TPU
    # transports impose single-execution deadlines at large keypoint counts).
    if (T0 is None and config.coarse_init == "none"
            and config.identity_hypotheses > 1):
        # Identity-start multi-hypothesis (GHICPConfig.identity_hypotheses):
        # schedule-shifted trajectories explore distinct basins of the
        # FD-dominated early phase; the honest final matched RMSE picks
        # the winner (at a shared config, a mis-converged basin's complete
        # one-to-one matching is measurably worse — ~86 deg basins sit at
        # several times the aligned RMSE).  All hypotheses share one
        # compiled engine (it_shift is a traced scalar).
        rate = config.weight_changing_rate
        shifts = (0.0, rate, 3.0 * rate)[:config.identity_hypotheses]
        # Selector: GEOMETRIC consensus (fraction of source keypoints with
        # a target keypoint within ~3 voxels under the final transform),
        # NOT the matched RMSE — the complete-matching RMSE measures
        # keypoint spacing and a mis-converged basin can score LOWER
        # (measured: a 12.4 deg trajectory at rmse 1.475 vs the aligned
        # one at 1.874).  Same signal the RANSAC scorer uses.
        tau = 3.0 * config.voxel_size
        stride = max(kp_s.shape[0] // 2048, 1)
        kp_s_sub = kp_s[::stride]
        kp_sm_sub = kp_s_mask[::stride]

        @jax.jit
        def consensus(T):
            # HIGHEST matmul precision: at 25 m coordinates the default
            # bf16 cross term carries +-2 m^2 of noise and the sub-voxel
            # tau test reads pure noise (measured: a 13-degree wrong pose
            # scored 0.60 instead of its true 0.37).
            p = kp_s_sub @ T[:3, :3].T + T[:3, 3]
            hi = jax.lax.Precision.HIGHEST
            d2 = (jnp.sum(p * p, axis=1)[:, None]
                  + jnp.sum(kp_t * kp_t, axis=1)[None, :]
                  - 2.0 * jnp.matmul(p, kp_t.T, precision=hi))
            d2 = jnp.min(jnp.where(kp_t_mask[None, :], d2, jnp.inf), axis=1)
            return jnp.sum((d2 < tau * tau) & kp_sm_sub)

        best = None
        best_score = -1
        for sh in shifts:
            cand = ghicp_register_chunked(
                kp_s, kp_s_mask, kp_t, kp_t_mask, fd, jnp.float32(bbx),
                config, chunk=config.engine_chunk, init_transform=None,
                it_shift=sh, stream=stream_feats,
                iteration_callback=iteration_callback,
                overhead_out=overhead_out)
            score = int(consensus(cand.transform))
            if score > best_score:
                best, best_score = cand, score
        n_sub = int(np.asarray(jnp.sum(kp_sm_sub)))
        import os as _os
        if _os.environ.get("GHICP_DEBUG_IDENTITY"):
            import sys as _sys
            print(f"[identity-hypotheses] best_score={best_score} "
                  f"n_sub={n_sub} thresh="
                  f"{0.55 * config.estimated_overlap * max(n_sub, 1):.0f}",
                  file=_sys.stderr, flush=True)
        # Calibration (bench scale): a correct pose scores ~0.70 of rows
        # within 3 voxels (keypoint repeatability at full overlap), a
        # 13-degree wrong basin ~0.37; overlap scales both, so gate at
        # 0.55x the expected overlap.
        if best_score < 0.55 * config.estimated_overlap * max(n_sub, 1):
            # No hypothesis verified geometrically: the pair's early
            # FD-dominated phase has no identity-reachable basin (the
            # round-1 lottery, NOTES).  Fall back to the feature-guided
            # RANSAC pipeline as the last hypothesis — still "register
            # without a trusted init", just not from the identity pose.
            return register_pair(
                source_pts, target_pts,
                dataclasses.replace(config, coarse_init="ransac",
                                    identity_hypotheses=1),
                keypoint_capacity, None, None, iteration_callback,
                overhead_out)
        result = best
    else:
        result = ghicp_register_chunked(kp_s, kp_s_mask, kp_t, kp_t_mask,
                                        fd, jnp.float32(bbx), config,
                                        chunk=config.engine_chunk,
                                        init_transform=T0,
                                        it_shift=it_shift,
                                        stream=stream_feats,
                                        iteration_callback=iteration_callback,
                                        overhead_out=overhead_out)
    # matches includes the post-convergence one-to-one resolve — block on
    # it INSIDE the timed stage (it is real per-registration work).
    jax.block_until_ready((result.transform, result.matches))
    timings["register"] = time.perf_counter() - t0

    return RegistrationOutput(
        transform=np.asarray(result.transform),
        result=result,
        n_source_down=int(jnp.sum(ds.mask)),
        n_target_down=int(jnp.sum(dt.mask)),
        n_source_keypoints=nks, n_target_keypoints=nkt,
        timings=timings,
        # Valid keypoints are the leading rows (both _keypoint_arrays and
        # the Morton reorder sort masked rows last).
        keypoints_source=np.asarray(kp_s)[:min(nks, cap)],
        keypoints_target=np.asarray(kp_t)[:min(nkt, cap)])


def transform_error(T_est: np.ndarray, T_gt: np.ndarray):
    """(rotation error degrees, translation error meters) between transforms."""
    dR = T_est[:3, :3] @ T_gt[:3, :3].T
    c = np.clip((np.trace(dR) - 1.0) / 2.0, -1.0, 1.0)
    rot_deg = np.degrees(np.arccos(c))
    dt = np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3])
    return float(rot_deg), float(dt)
