"""Curvature keypoint detection: stability pruning + non-max suppression.

TPU-native re-design of ``CKeypointDetect`` (reference
``include/keypoint_detect.hpp:27-191``):

* ``prune_unstable`` reproduces keypoint_detect.hpp:132-147 — keep points with
  lambda2/lambda1 < t, lambda3/lambda2 < t, and more than ``min_neighbors``
  neighborhood points.
* ``non_max_suppression`` replaces the serial sort-and-greedily-suppress loop
  (keypoint_detect.hpp:149-191) with its parallel fixed point: each round, all
  candidates that carry the maximum curvature within their suppression radius
  (among still-undecided candidates) are selected at once, and everything
  within the radius of a selected point is discarded.  Iterating this
  local-max rule reproduces the greedy-by-curvature result exactly (the global
  max is always a local max, so every greedy pick is made eventually), up to
  the fixed-K neighbor cap.  Ties break by lower point index, making the
  result deterministic (the reference inherits std::sort order).

* ``adaptive_detect`` mirrors the threshold re-tuning loop of
  keypointDetectionBasedOnCurvature_adaptive (keypoint_detect.hpp:53-111),
  re-running prune+NMS until the keypoint count lands in [kmin, kmax].
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ghicp_tpu.core.config import GHICPConfig
from ghicp_tpu.core.types import PointCloud
from ghicp_tpu.preprocess.neighbors import radius_neighbors
from ghicp_tpu.preprocess.pca import PCAFeatures, pca_features

Array = jax.Array


class KeypointResult(NamedTuple):
    mask: Array        # [N] bool — selected keypoints
    candidates: Array  # [N] bool — survived stability pruning
    rounds: Array      # int32 — NMS rounds executed


def prune_unstable(feats: PCAFeatures, ratio_max: float,
                   min_neighbors: int) -> Array:
    l1 = jnp.maximum(feats.eigvals[:, 0], 1e-30)
    l2 = jnp.maximum(feats.eigvals[:, 1], 1e-30)
    ratio1 = feats.eigvals[:, 1] / l1
    ratio2 = feats.eigvals[:, 2] / l2
    return (feats.valid & (ratio1 < ratio_max) & (ratio2 < ratio_max)
            & (feats.n_neighbors > min_neighbors))


def non_max_suppression(cloud: PointCloud, curvature: Array, candidates: Array,
                        radius: float, k: int = 96, cell_cap: int = 32,
                        chunk: int = 4096, max_rounds: int = 128):
    """Parallel greedy-equivalent NMS. Returns (selected mask, rounds)."""
    n = cloud.capacity
    cand_cloud = PointCloud(xyz=cloud.xyz, mask=candidates)
    nb = radius_neighbors(cand_cloud, cand_cloud, radius=radius, k=k,
                          cell_cap=cell_cap, chunk=chunk, include_self=False)
    # Ties in curvature break by lower point index: compare (curv, -idx)
    # pairs lexicographically instead of a mixed scalar to avoid precision loss.
    idxf = jnp.arange(n, dtype=jnp.float32)

    def round_body(state):
        alive, selected, rounds = state
        nb_alive = alive[nb.idx] & nb.valid                       # [N, K]
        nb_curv = jnp.where(nb_alive, curvature[nb.idx], -jnp.inf)
        nb_idxf = jnp.where(nb_alive, idxf[nb.idx], jnp.inf)
        max_curv = jnp.max(nb_curv, axis=1)
        # Smallest index among neighbors achieving max curvature.
        at_max = nb_alive & (nb_curv == max_curv[:, None])
        min_idx_at_max = jnp.min(jnp.where(at_max, nb_idxf, jnp.inf), axis=1)
        wins = alive & ((curvature > max_curv) |
                        ((curvature == max_curv) & (idxf < min_idx_at_max)))
        selected = selected | wins
        suppressed = jnp.any(wins[nb.idx] & nb.valid, axis=1)
        alive = alive & ~wins & ~suppressed
        return alive, selected, rounds + 1

    def cond(state):
        alive, _, rounds = state
        return jnp.any(alive) & (rounds < max_rounds)

    alive0 = candidates
    selected0 = jnp.zeros_like(candidates)
    _, selected, rounds = jax.lax.while_loop(
        cond, round_body, (alive0, selected0, jnp.int32(0)))
    return selected, rounds


def refine_positions(cloud: PointCloud, curvature: Array, selected: Array,
                     candidates: Array, radius: float, k: int = 32,
                     cell_cap: int = 32, chunk: int = 2048) -> Array:
    """Sub-voxel keypoint localization: curvature-weighted mean shift.

    The NMS argmax lands on whichever sample of the near-maximum curvature
    plateau won the noise lottery — jitter ~ the voxel size, which Hamming-
    destabilizes BSC (a 0.1 m origin shift costs ~25 bits).  One weighted-
    centroid step over the surviving candidates within ``radius`` averages
    that jitter away.  (Not in the reference — its keypoints sit on raw
    samples; this is a fidelity *improvement* gated by the same end-metric.)

    Returns [N, 3]: refined positions (unchanged where not selected).
    """
    cand_cloud = PointCloud(xyz=cloud.xyz, mask=candidates)
    query = PointCloud(xyz=cloud.xyz, mask=selected)
    nb = radius_neighbors(query, cand_cloud, radius=radius, k=k,
                          cell_cap=cell_cap, chunk=chunk)
    w = jnp.where(nb.valid, jnp.maximum(curvature[nb.idx], 0.0), 0.0)
    wsum = jnp.maximum(jnp.sum(w, axis=1), 1e-12)
    centroid = jnp.einsum("nk,nkd->nd", w, cloud.xyz[nb.idx]) / wsum[:, None]
    ok = selected & (jnp.sum(nb.valid, axis=1) > 0)
    return jnp.where(ok[:, None], centroid, cloud.xyz)


def detect_keypoints(cloud: PointCloud, config: GHICPConfig,
                     feats: PCAFeatures | None = None) -> KeypointResult:
    """Full pipeline: PCA -> stability pruning -> NMS (ghicp_main.cpp:96-100)."""
    if feats is None:
        feats = pca_features(cloud, radius=config.neighborhood_radius,
                             k=config.neighbor_k,
                             cell_cap=config.pca_cell_cap)
    candidates = prune_unstable(feats, config.unstable_ratio_threshold,
                                config.min_neighbors)
    if config.min_curvature > 0.0:
        candidates = candidates & (feats.curvature >= config.min_curvature)
    selected, rounds = non_max_suppression(
        cloud, feats.curvature, candidates, radius=config.non_max_radius,
        k=config.nms_k, cell_cap=config.nms_cell_cap, chunk=1024)
    return KeypointResult(mask=selected, candidates=candidates, rounds=rounds)


def adaptive_detect(cloud: PointCloud, config: GHICPConfig) -> KeypointResult:
    """Adaptive threshold re-tuning (keypoint_detect.hpp:53-111, host loop)."""
    feats = pca_features(cloud, radius=config.neighborhood_radius,
                         k=config.neighbor_k, cell_cap=config.pca_cell_cap)
    ratio = config.unstable_ratio_threshold
    result = detect_keypoints(cloud, config, feats)
    count = int(jnp.sum(result.mask))
    if count <= config.keypoints_max:
        return result
    finish = False
    while ((count < config.keypoints_min or count > config.keypoints_max)
           and not finish and ratio >= 0.65):
        if count < config.keypoints_min:
            ratio += 0.025
            finish = True
        else:
            ratio -= 0.05
        candidates = prune_unstable(feats, ratio, config.min_neighbors)
        selected, rounds = non_max_suppression(
            cloud, feats.curvature, candidates, radius=config.non_max_radius,
            k=config.nms_k, cell_cap=config.nms_cell_cap, chunk=1024)
        result = KeypointResult(mask=selected, candidates=candidates,
                                rounds=rounds)
        count = int(jnp.sum(result.mask))
    return result
