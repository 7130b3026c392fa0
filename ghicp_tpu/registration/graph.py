"""Multi-pair (station-graph) registration.

The reference hints at multi-view use through ``PCFD`` — "Pairwise Cloud
Feature Distance used for multi-view registration as weight of MST"
(include/ghicp_reg.h:141) — but ships no driver for it.  This module is the
TPU-native realization (BASELINE.json config 5):

* every station cloud is preprocessed and BSC-encoded **once**
  (:class:`Station`), with the full variant set so it can act as source or
  target of any pair;
* each requested pair runs the jitted GH-ICP engine on the cached
  keypoints/features — all pairs share one compiled executable because the
  keypoint buckets are padded to a common capacity;
* global station poses come from a maximum-spanning-tree over pair quality
  (IoU of the converged registration, the reference's PCFD role), chaining
  pairwise transforms from a root station.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ghicp_tpu.core.config import FeatureType, GHICPConfig
from ghicp_tpu.core.types import PointCloud, cloud_bounds
from ghicp_tpu.features import extract_bsc, min_hamming_fd
from ghicp_tpu.preprocess import detect_keypoints, voxel_downsample
from ghicp_tpu.registration.ghicp import GHICPResult, ghicp_register


@dataclasses.dataclass
class Station:
    """One preprocessed scan: downsampled cloud + keypoints + features."""

    index: int
    kp_xyz: jax.Array        # [cap, 3]
    kp_mask: jax.Array       # [cap]
    bsc_packed: Optional[jax.Array]  # [V, cap, W] (BSC only)
    n_keypoints: int
    bbx_magnitude: float
    desc: Optional[jax.Array] = None     # [cap, D] float descriptors
                                         # (FPFH histograms / RoPS moments)
    frames: Optional[jax.Array] = None   # [cap, 3, 3] BSC LCS frames
                                         # (coarse-init pose hypotheses)


@dataclasses.dataclass
class PairResult:
    source: int
    target: int
    transform: np.ndarray
    result: GHICPResult

    @property
    def quality(self) -> float:
        """Final IoU — the MST edge weight (PCFD role, ghicp_reg.h:140)."""
        it = max(int(self.result.iterations) - 1, 0)
        return float(np.asarray(self.result.metrics.iou)[it])


def build_station(pts: np.ndarray, index: int, config: GHICPConfig,
                  capacity: int) -> Station:
    from ghicp_tpu.preprocess import pca_features
    from ghicp_tpu.preprocess.keypoints import (compact_candidates,
                                                refine_positions)
    from ghicp_tpu.core.types import compact_device
    cloud = PointCloud.from_points(pts)
    dcloud = compact_device(voxel_downsample(cloud, config.voxel_size))
    bbx = float(cloud_bounds(dcloud).magnitude)
    pca = pca_features(dcloud, radius=config.neighborhood_radius,
                       k=config.neighbor_k, cell_cap=config.pca_cell_cap,
                       max_cells=config.pca_max_cells)
    res = detect_keypoints(dcloud, config, pca)
    mask_np = np.asarray(res.mask)
    idx = np.nonzero(mask_np)[0].astype(np.int32)
    nk = len(idx)
    kp_idx = np.zeros(capacity, np.int32)
    kp_idx[:min(nk, capacity)] = idx[:capacity]
    kp_mask = np.zeros(capacity, bool)
    kp_mask[:min(nk, capacity)] = True
    kp_idx_j = jnp.asarray(kp_idx)
    kp_mask_j = jnp.asarray(kp_mask)
    kp_xyz = dcloud.xyz[kp_idx_j]
    if config.refine_keypoints:
        rr = config.refine_radius or 3.0 * config.voxel_size
        cc, curv = compact_candidates(dcloud, pca, res.candidates)
        kp_xyz = refine_positions(kp_xyz, kp_mask_j, cc, curv, radius=rr)
    packed = desc = frames = None
    if config.feature == FeatureType.BSC:
        # Full variant set: any station can act as pair source or target
        # (the target side uses only variant 0, like ghicp_reg.cpp:178-186).
        feats = extract_bsc(dcloud, kp_xyz, kp_mask_j, config,
                            num_variants=config.bsc_num_variants)
        packed = feats.packed
        frames = feats.frames
    elif config.feature == FeatureType.FPFH:
        from ghicp_tpu.features import fpfh_features
        radius = config.fpfh_radius or 3.0 * config.voxel_size
        hist, _ = fpfh_features(dcloud, radius=radius,
                                k=max(config.fpfh_k, 24))
        desc = hist[kp_idx_j]
    elif config.feature == FeatureType.ROPS:
        from ghicp_tpu.features import rops_features
        rr_rad = config.rops_radius or float(config.non_max_radius)
        rf = rops_features(dcloud, kp_xyz, kp_mask_j, radius=rr_rad,
                           neighbor_k=config.rops_neighbor_k,
                           n_rotations=config.rops_rotations,
                           n_bins=config.rops_bins)
        desc = rf.desc
    return Station(index=index, kp_xyz=kp_xyz,
                   kp_mask=kp_mask_j, bsc_packed=packed, n_keypoints=nk,
                   bbx_magnitude=bbx, desc=desc, frames=frames)


def station_pair_fd(s: Station, t: Station, config: GHICPConfig):
    """The [cap, cap] feature matrix for a station pair, per feature type:
    Hamming distance for BSC (ghicp_reg.cpp:143-200), |correlation|
    similarity for FPFH/RoPS (fpfh.hpp:135-165), zeros for none."""
    if config.feature == FeatureType.BSC:
        return min_hamming_fd(s.bsc_packed, t.bsc_packed[:1],
                              config.bsc_total_bits,
                              use_mxu=config.use_mxu_hamming)
    if config.feature == FeatureType.FPFH:
        from ghicp_tpu.features import fpfh_similarity_matrix
        return fpfh_similarity_matrix(s.desc, t.desc)
    if config.feature == FeatureType.ROPS:
        from ghicp_tpu.features import rops_similarity_matrix
        return rops_similarity_matrix(s.desc, t.desc)
    cap = s.kp_xyz.shape[0]
    return jnp.zeros((cap, cap), jnp.float32)


def _coarse_init_pair(s: Station, t: Station, fd, config: GHICPConfig):
    """RANSAC coarse init for a station pair (same policy as
    ``register_pair``, pipeline.py): returns (T0 or None, it_shift)."""
    if config.coarse_init != "ransac" or config.feature == FeatureType.NONE:
        return None, 0.0
    from ghicp_tpu.matching.ransac import ransac_coarse_align
    fd_dist = (1.0 - fd) if config.feature in (
        FeatureType.FPFH, FeatureType.ROPS) else fd
    tau = config.ransac_tau or 3.0 * config.voxel_size
    rr = ransac_coarse_align(s.kp_xyz, s.kp_mask, t.kp_xyz, t.kp_mask,
                             fd_dist, tau=tau,
                             n_hyp=config.ransac_hypotheses,
                             frames_s=s.frames, frames_t=t.frames)
    if int(rr.inliers) >= config.ransac_min_inliers:
        # Skip the feature-dominant schedule phase (see pipeline.py): the
        # verified pose must not be discarded by iteration 0's pure-FD
        # matching.
        return rr.transform, 3.0 * config.weight_changing_rate
    return None, 0.0


def register_graph(clouds: Sequence[np.ndarray],
                   pairs: Sequence[Tuple[int, int]],
                   config: GHICPConfig,
                   keypoint_capacity: Optional[int] = None,
                   batched: bool = False
                   ) -> Tuple[List[PairResult], List[np.ndarray]]:
    """Register every (source, target) pair; return pair results + global
    poses (one [4,4] per station, root = station 0).

    ``batched=True`` stacks all pairs on a leading axis and runs ONE
    vmapped engine dispatch (SURVEY.md §2 parallelism item (c)) — per-pair
    dispatch/fetch round trips through a remote transport dominate the
    sequential path at station-graph pair sizes.  The batched dispatch
    forces the XLA engine paths (the single-pair Pallas kernels don't
    batch); at graph keypoint capacities the XLA path is already fast.
    """
    # Common capacity so every pair reuses one compiled engine.
    cap = keypoint_capacity or config.keypoint_capacity or 2048
    stations = [build_station(p, i, config, cap)
                for i, p in enumerate(clouds)]

    results: List[PairResult] = []
    if batched:
        from ghicp_tpu.core import transform as tf
        from ghicp_tpu.registration.ghicp import ghicp_register_batched
        cfg_b = dataclasses.replace(config, fused_cost_kernel=False,
                                    auction_round_kernel=False)
        st_s = [stations[si] for si, _ in pairs]
        st_t = [stations[ti] for _, ti in pairs]
        kp_s = jnp.stack([s.kp_xyz for s in st_s])
        ms = jnp.stack([s.kp_mask for s in st_s])
        kp_t = jnp.stack([t.kp_xyz for t in st_t])
        mt = jnp.stack([t.kp_mask for t in st_t])
        fds = [station_pair_fd(s, t, config) for s, t in zip(st_s, st_t)]
        fd = jnp.stack(fds)
        bbx = jnp.asarray([s.bbx_magnitude for s in st_s], jnp.float32)
        # Per-pair coarse init; pairs whose RANSAC found no consensus get
        # identity with the shared it_shift (a zero shift for ALL pairs
        # would need a second compiled executable — identity + shift only
        # costs those pairs the early feature-dominant iterations, which
        # the coarse-init path skips by design anyway).
        inits = [_coarse_init_pair(s, t, f, config)
                 for s, t, f in zip(st_s, st_t, fds)]
        if any(T0 is not None for T0, _ in inits):
            shift = max(sh for _, sh in inits)
            T0b = jnp.stack([T0 if T0 is not None else tf.identity()
                             for T0, _ in inits])
            res = ghicp_register_batched(kp_s, ms, kp_t, mt, fd, bbx, cfg_b,
                                         init_transform=T0b, it_shift=shift)
        else:
            res = ghicp_register_batched(kp_s, ms, kp_t, mt, fd, bbx, cfg_b)
        # One host fetch for the whole batch.
        res = jax.device_get(res)
        for k, (si, ti) in enumerate(pairs):
            rk = jax.tree.map(lambda x, k=k: x[k], res)
            results.append(PairResult(source=si, target=ti,
                                      transform=np.asarray(rk.transform),
                                      result=rk))
    else:
        for (si, ti) in pairs:
            s, t = stations[si], stations[ti]
            fd = station_pair_fd(s, t, config)
            T0, it_shift = _coarse_init_pair(s, t, fd, config)
            res = ghicp_register(s.kp_xyz, s.kp_mask, t.kp_xyz, t.kp_mask,
                                 fd, jnp.float32(s.bbx_magnitude), config,
                                 init_transform=T0, it_shift=it_shift)
            results.append(PairResult(source=si, target=ti,
                                      transform=np.asarray(res.transform),
                                      result=res))

    poses = _poses_from_mst(len(clouds), results)
    return results, poses


def _poses_from_mst(n: int, results: List[PairResult]) -> List[np.ndarray]:
    """Chain pairwise transforms along a maximum-quality spanning tree.

    Pose[i] maps station i's frame into station 0's frame.
    """
    # Edge list with quality weights (IoU) — Prim's algorithm from node 0.
    edges: Dict[int, List[Tuple[float, int, np.ndarray]]] = {
        i: [] for i in range(n)}
    for r in results:
        # transform maps source -> target.
        T = r.transform
        edges[r.source].append((r.quality, r.target, np.linalg.inv(T)))
        edges[r.target].append((r.quality, r.source, T))
    poses: List[Optional[np.ndarray]] = [None] * n
    poses[0] = np.eye(4, dtype=np.float32)
    visited = {0}
    import heapq
    heap = [(-q, 0, nbr, T) for (q, nbr, T) in edges[0]]
    heapq.heapify(heap)
    while heap and len(visited) < n:
        negq, frm, to, T_to_frm = heapq.heappop(heap)
        if to in visited:
            continue
        # T_to_frm maps `to` frame -> `frm` frame.
        poses[to] = (poses[frm] @ T_to_frm).astype(np.float32)
        visited.add(to)
        for (q, nbr, T) in edges[to]:
            if nbr not in visited:
                heapq.heappush(heap, (-q, to, nbr, T))
    for i in range(n):
        if poses[i] is None:
            poses[i] = np.eye(4, dtype=np.float32)  # disconnected station
    return poses
