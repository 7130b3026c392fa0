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

# Test hook: force the whole-fixed-point NMS Pallas kernel (interpret mode)
# on non-TPU backends so the dispatch path runs under the CPU test mesh.
_NMS_KERNEL_INTERPRET = False

# VMEM ceiling for the all-resident NMS kernel (~60 B/candidate of scratch).
_NMS_KERNEL_MAX_N = 131072

# Below this candidate count the exact O(N^2) jnp fixed point is used on
# every backend (cheap, and immune to neighbor-cap overflow).
_NMS_BRUTE_MAX_N = 8192


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
    if n <= _NMS_BRUTE_MAX_N:
        # Exact O(N^2) fixed point: at small candidate counts the dense
        # distance matrix is cheap on every backend and has no K/cell caps
        # to overflow (dense raw-cloud scenes can exceed any fixed cap and
        # silently violate the suppression radius).
        from ghicp_tpu.ops.nms_kernel import nms_bruteforce_ref
        return nms_bruteforce_ref(cloud.xyz, curvature,
                                  candidates & cloud.mask, radius,
                                  max_rounds=max_rounds)
    if ((jax.default_backend() == "tpu" or _NMS_KERNEL_INTERPRET)
            and n % 256 == 0 and n <= _NMS_KERNEL_MAX_N):
        # Whole-fixed-point Pallas kernel: exact radius (no K cap), all
        # rounds in one launch, no neighbor lists (ops/nms_kernel.py).
        from ghicp_tpu.ops.nms_kernel import nms_pallas
        return nms_pallas(cloud.xyz, curvature, candidates & cloud.mask,
                          radius, max_rounds=max_rounds,
                          interpret=_NMS_KERNEL_INTERPRET)
    cand_cloud = PointCloud(xyz=cloud.xyz, mask=candidates)
    nb = radius_neighbors(cand_cloud, cand_cloud, radius=radius, k=k,
                          cell_cap=cell_cap, chunk=chunk, include_self=False)
    # Ties in curvature break by lower point index: compare (curv, -idx)
    # pairs lexicographically instead of a mixed scalar to avoid precision loss.
    idxf = jnp.arange(n, dtype=jnp.float32)
    # Loop-invariant gathers hoisted out of the rounds: only the alive/wins
    # masks change per round, so the [N, K] curvature/index lookups are paid
    # once, not once per suppression round.
    nb_curv_all = jnp.where(nb.valid, curvature[nb.idx], -jnp.inf)
    nb_idxf_all = jnp.where(nb.valid, idxf[nb.idx], jnp.inf)

    def round_body(state):
        alive, selected, rounds = state
        nb_alive = alive[nb.idx] & nb.valid                       # [N, K]
        nb_curv = jnp.where(nb_alive, nb_curv_all, -jnp.inf)
        nb_idxf = jnp.where(nb_alive, nb_idxf_all, jnp.inf)
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


def refine_positions(kp_xyz: Array, kp_mask: Array, cand_cloud: PointCloud,
                     cand_curvature: Array, radius: float, k: int = 48,
                     cell_cap: int = 32, chunk: int = 2048) -> Array:
    """Sub-voxel keypoint localization: curvature-weighted mean shift.

    The NMS argmax lands on whichever sample of the near-maximum curvature
    plateau won the noise lottery — jitter ~ the voxel size, which Hamming-
    destabilizes BSC (a 0.1 m origin shift costs ~25 bits).  One weighted-
    centroid step over the surviving candidates within ``radius`` averages
    that jitter away.  (Not in the reference — its keypoints sit on raw
    samples; this is a fidelity *improvement* gated by the same end-metric.)

    kp_xyz/kp_mask: compacted keypoint positions [S,3]/[S];
    cand_cloud/cand_curvature: compacted pruning survivors.
    Returns [S, 3] refined positions.
    """
    query = PointCloud(xyz=kp_xyz, mask=kp_mask)
    nb = radius_neighbors(query, cand_cloud, radius=radius, k=k,
                          cell_cap=cell_cap, chunk=min(chunk, kp_xyz.shape[0]))
    w = jnp.where(nb.valid, jnp.maximum(cand_curvature[nb.idx], 0.0), 0.0)
    wsum = jnp.maximum(jnp.sum(w, axis=1), 1e-12)
    centroid = jnp.einsum("nk,nkd->nd", w,
                          cand_cloud.xyz[nb.idx]) / wsum[:, None]
    ok = kp_mask & (jnp.sum(nb.valid, axis=1) > 0)
    return jnp.where(ok[:, None], centroid, kp_xyz)


def refine_positions_corner(kp_xyz: Array, kp_mask: Array,
                            cloud: PointCloud, feats: PCAFeatures,
                            radius: float, k: int = 96, cell_cap: int = 32,
                            chunk: int = 2048, anchor: float = 0.05) -> Array:
    """Plane-intersection keypoint localization.

    Curvature-argmax keypoints wander along creases by ~the voxel size
    (whichever sample won the noise lottery), which decorrelates BSC bits
    (grid cells are 2r/7 ~ 0.14-0.29 m).  The geometrically-defined corner
    is sampling-independent: solve

        x* = argmin_x  sum_i w_i (n_i^T (x - p_i))^2  + lam |x - kp|^2

    over surface neighbors p_i with PCA normals n_i — the least-squares
    intersection of the local tangent planes (the ISS/Harris-3D sub-sample
    refinement idea).  At a 3-plane corner x* is the exact vertex; on a
    2-plane crease the anchor resolves the along-edge null direction to the
    nearest point; on flat surface the anchor keeps x* at the keypoint.
    Neighbor weights w_i = planarity (lam2-lam3)/lam1 trust only neighbors
    whose own normal is well-defined.  (Not in the reference — its
    keypoints sit on raw samples, keypoint_detect.hpp:149-191; gated by the
    same end metric.)
    """
    query = PointCloud(xyz=kp_xyz, mask=kp_mask)
    nb = radius_neighbors(query, cloud, radius=radius, k=k,
                          cell_cap=cell_cap, chunk=min(chunk, kp_xyz.shape[0]))
    n = feats.normal[nb.idx]                          # [S, K, 3]
    p = cloud.xyz[nb.idx]                             # [S, K, 3]
    ev = feats.eigvals[nb.idx]                        # [S, K, 3]
    l1 = jnp.maximum(ev[..., 0], 1e-30)
    planarity = (ev[..., 1] - ev[..., 2]) / l1
    w = jnp.where(nb.valid & feats.valid[nb.idx],
                  jnp.clip(planarity, 0.0, 1.0), 0.0)  # [S, K]
    # Direction-density normalization: divide each neighbor's weight by the
    # total weight pointing the same way ((n_i.n_j)^8 is ~1 within a plane,
    # ~0 across orthogonal planes; squared dot = sign-invariant).  Each
    # distinct tangent-plane DIRECTION then contributes ~unit total weight,
    # so a corner solve is not dragged toward whichever face happens to
    # have more samples in the ball (population imbalance also comes from
    # per-cell caps saturating where several surfaces share a cell).
    sim = jnp.einsum("ski,sli->skl", n, n) ** 2        # [S, K, K]
    dens = jnp.einsum("skl,sl->sk", sim ** 4, w)
    w = w / jnp.maximum(dens, 1e-6)
    nnT = n[..., :, None] * n[..., None, :]            # [S, K, 3, 3]
    A = jnp.einsum("sk,skij->sij", w, nnT)
    ndp = jnp.sum(n * p, axis=-1)                      # [S, K]
    b = jnp.einsum("sk,sk,ski->si", w, ndp, n)
    lam = anchor * jnp.maximum(
        jnp.trace(A, axis1=-2, axis2=-1), 1e-6)[:, None]
    A = A + lam[..., None] * jnp.eye(3, dtype=A.dtype)
    # Re-anchored fixed point: x_{k+1} = (A+lam I)^-1 (b + lam x_k).  In
    # constrained directions the anchor's pull toward the START decays
    # geometrically (the solution converges to the pure LS intersection);
    # in null directions x_k is already the fixed point, so the along-edge
    # position stays pinned at the keypoint.
    x = kp_xyz
    for _ in range(3):
        x = jnp.linalg.solve(A, (b + lam * x)[..., None])[..., 0]
    # Never move outside the query ball: a bad solve (near-singular A from
    # a noise-dominated neighborhood) must not teleport the keypoint.
    d = x - kp_xyz
    dist = jnp.linalg.norm(d, axis=-1, keepdims=True)
    x = kp_xyz + d * jnp.minimum(1.0, radius / jnp.maximum(dist, 1e-12))
    ok = kp_mask & (jnp.sum(w, axis=1) > 1e-6)
    return jnp.where(ok[:, None], x, kp_xyz)


def detect_keypoints(cloud: PointCloud, config: GHICPConfig,
                     feats: PCAFeatures | None = None) -> KeypointResult:
    """Full pipeline: PCA -> stability pruning -> NMS (ghicp_main.cpp:96-100).

    Host-staged: pruning survivors are compacted into a small bucket before
    the NMS rounds — suppressing a few thousand candidates must not cost
    full-cloud-capacity work (the padded cloud can be 1M+ rows).
    """
    from ghicp_tpu.core.types import bucket_size
    if feats is None:
        feats = pca_features(cloud, radius=config.neighborhood_radius,
                             k=config.neighbor_k,
                             cell_cap=config.pca_cell_cap,
                             max_cells=config.pca_max_cells)
    candidates = prune_unstable(feats, config.unstable_ratio_threshold,
                                config.min_neighbors)
    if config.min_curvature > 0.0:
        candidates = candidates & (feats.curvature >= config.min_curvature)

    n = cloud.capacity
    count = int(jnp.sum(candidates))   # the only host round-trip (a scalar)
    if count == 0:
        z = jnp.zeros((n,), bool)
        return KeypointResult(mask=z, candidates=candidates,
                              rounds=jnp.int32(0))
    cap = bucket_size(count, min_size=256)
    # On-device compaction: stable argsort puts candidate indices first, so
    # the compact bucket is a device gather — no [N, 3] device->host
    # transfer (which is the expensive direction on the remote backend).
    sel = jnp.argsort(~candidates)[:cap]
    cmask = candidates[sel]
    compact = PointCloud(xyz=cloud.xyz[sel], mask=cmask)
    sel_c, rounds = non_max_suppression(
        compact, feats.curvature[sel], cmask,
        radius=config.non_max_radius, k=config.nms_k,
        cell_cap=config.nms_cell_cap, chunk=min(1024, cap))
    mask = jnp.zeros((n,), bool).at[sel].set(sel_c & cmask)
    return KeypointResult(mask=mask, candidates=candidates, rounds=rounds)


def compact_candidates(cloud: PointCloud, feats: PCAFeatures,
                       candidates) -> tuple[PointCloud, Array]:
    """On-device compaction of pruning survivors for refine_positions.

    Only a scalar count crosses to the host (for the static bucket size);
    the gather itself stays on device."""
    from ghicp_tpu.core.types import bucket_size
    count = int(jnp.sum(candidates))
    cap = bucket_size(max(count, 1), min_size=256)
    sel = jnp.argsort(~candidates)[:cap]
    cmask = candidates[sel]
    return (PointCloud(xyz=cloud.xyz[sel], mask=cmask),
            jnp.where(cmask, feats.curvature[sel], 0.0))


def adaptive_detect(cloud: PointCloud, config: GHICPConfig) -> KeypointResult:
    """Adaptive threshold re-tuning (keypoint_detect.hpp:53-111, host loop)."""
    feats = pca_features(cloud, radius=config.neighborhood_radius,
                         k=config.neighbor_k,
                         cell_cap=config.pca_cell_cap,
                         max_cells=config.pca_max_cells)
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
