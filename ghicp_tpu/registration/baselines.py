"""Baseline registration algorithms (reference ``src/common_reg.cpp``).

TPU-native re-designs of the comparison registrars the reference ships next
to GH-ICP (common_reg.h:26-132, README.md:109-111 "other well-known automatic
registration algorithms"):

* :func:`icp_point2point`  — classic ICP, optionally reciprocal
  (common_reg.cpp:44-107).  Dense correspondences over the full downsampled
  clouds via the grid-hash NN engine, one jitted ``lax.while_loop``.
* :func:`icp_point2plane`  — point-to-plane ICP with PCA normals
  (common_reg.cpp:122-199): per-iteration linearized 6x6 normal equations.
* :func:`gicp`             — Generalized ICP (plane-to-plane,
  common_reg.cpp:216-284): per-point regularized covariances, Mahalanobis-
  weighted Gauss-Newton.
* :func:`overlap_ratio`    — radius-search overlap estimate
  (common_reg.cpp:294-317).
* :func:`sac_ia_fpfh`      — FPFH + RANSAC coarse alignment
  (common_reg.cpp:392-423 / fpfh.hpp:117-133): every hypothesis is evaluated
  in parallel (vmapped 3-point Kabsch + inlier count) instead of PCL's
  serial SAC loop.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ghicp_tpu.core import transform as tf
from ghicp_tpu.core.types import PointCloud
from ghicp_tpu.ops.eigh3 import eigh3
from ghicp_tpu.preprocess.neighbors import build_grid, radius_neighbors
from ghicp_tpu.preprocess.pca import pca_from_neighbors
from ghicp_tpu.registration.estimator import kabsch_6dof

Array = jax.Array

_HI = jax.lax.Precision.HIGHEST


class ICPResult(NamedTuple):
    transform: Array   # [4,4]
    iterations: Array
    rmse: Array        # final inlier RMSE
    n_inliers: Array
    ok: Array = jnp.bool_(True)  # False when the min-overlap gate refused
                                 # the registration (common_reg.cpp:67-70:
                                 # "The overlap ratio is too small. This
                                 # registration would not be done.")


def _nn_1(grid, pts, mask, radius: float):
    """Nearest target neighbor per point: (idx [N], dist [N], ok [N])."""
    # Re-implemented inline to stay jittable inside while_loop bodies.
    n = pts.shape[0]
    from ghicp_tpu.preprocess.neighbors import _OFFSET_HASHES, _point_hash
    qh = _point_hash(pts, grid.min_xyz, grid.cell)
    hashes = qh[:, None] + jnp.asarray(_OFFSET_HASHES)[None, :]
    start = jnp.searchsorted(grid.sorted_keys, hashes, side="left")
    end = jnp.searchsorted(grid.sorted_keys, hashes, side="right")
    cap = 8
    start_r = jnp.repeat(start, cap, axis=1)
    end_r = jnp.repeat(end, cap, axis=1)
    lane = jnp.tile(jnp.arange(cap, dtype=jnp.int32), 27)[None, :]
    slots = jnp.clip(start_r + lane, 0, grid.sorted_keys.shape[0] - 1)
    in_cell = (start_r + lane) < end_r
    cand = grid.order[slots]
    ok = in_cell & grid.mask[cand]
    d2 = jnp.sum((grid.xyz[cand] - pts[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(ok & (d2 <= radius * radius), d2, jnp.inf)
    k = jnp.argmin(d2, axis=1)
    best = jnp.take_along_axis(cand, k[:, None], axis=1)[:, 0]
    bd2 = jnp.take_along_axis(d2, k[:, None], axis=1)[:, 0]
    good = jnp.isfinite(bd2) & mask
    return best, jnp.sqrt(jnp.where(good, bd2, 0.0)), good


@functools.partial(jax.jit, static_argnames=("corr_dist", "max_iterations",
                                             "reciprocal", "converge_t",
                                             "converge_r", "use_trimmed",
                                             "min_overlap"))
def icp_point2point(source: PointCloud, target: PointCloud,
                    corr_dist: float = 1.0, max_iterations: int = 50,
                    reciprocal: bool = False, converge_t: float = 1e-4,
                    converge_r: float = 1e-3, use_trimmed: bool = False,
                    min_overlap: float = 0.0) -> ICPResult:
    """Classic point-to-point ICP (common_reg.cpp:44-107).

    ``use_trimmed`` enables the trimmed correspondence rejector
    (common_reg.cpp:63-75): the approximate overlap ratio is estimated once
    with a ``corr_dist``-radius search (``calOverlap``,
    common_reg.cpp:294-317), each iteration keeps only that best fraction of
    correspondences by distance, and when the ratio falls below
    ``min_overlap`` the registration is refused (``ok=False``, identity
    transform — the reference returns false and leaves the clouds alone).
    """
    tgrid = build_grid(target, cell=corr_dist)
    N = source.xyz.shape[0]
    if use_trimmed:
        # calOverlap semantics: fraction of source points with a target
        # neighbor within corr_dist, estimated once pre-alignment.
        _, _, ov_ok = _nn_1(tgrid, source.xyz, source.mask, corr_dist)
        n_src = jnp.maximum(jnp.sum(source.mask.astype(jnp.float32)), 1.0)
        overlap = jnp.sum(ov_ok.astype(jnp.float32)) / n_src
        refused = overlap < min_overlap
    else:
        overlap = jnp.float32(1.0)
        refused = jnp.bool_(False)

    def body(st):
        pts, rt, it, done, prev = st
        j, d, ok = _nn_1(tgrid, pts, source.mask, corr_dist)
        if reciprocal:
            # Reciprocal test (common_reg.cpp:62-66): target j's nearest
            # *current* source point must be this row.  Grid over the moving
            # source is rebuilt per iteration (one argsort — jit-friendly).
            sgrid = build_grid(PointCloud(xyz=pts, mask=source.mask),
                               cell=corr_dist)
            back, _, bok = _nn_1(sgrid, target.xyz[j], ok, corr_dist)
            ok = ok & bok & (back == jnp.arange(pts.shape[0]))
        if use_trimmed:
            # CorrespondenceRejectorTrimmed: keep the closest
            # overlap-fraction of valid correspondences, drop the
            # largest-distance rest (common_reg.cpp:71-74).
            d_valid = jnp.where(ok, d, jnp.inf)
            n_valid = jnp.sum(ok.astype(jnp.int32))
            keep_n = jnp.clip((overlap * n_valid.astype(jnp.float32))
                              .astype(jnp.int32), 1, N)
            d_sorted = jnp.sort(d_valid)
            thresh = d_sorted[jnp.clip(keep_n - 1, 0, N - 1)]
            ok = ok & (d <= thresh)
        w = ok.astype(jnp.float32)
        step = kabsch_6dof(pts, target.xyz[j], w)
        new_pts = tf.apply(step, pts)
        n = jnp.maximum(jnp.sum(w), 1.0)
        rmse = jnp.sqrt(jnp.sum(w * jnp.sum(
            (new_pts - target.xyz[j]) ** 2, -1)) / n)
        ang = tf.euler_deg_zyx(tf.rotation(step))
        small = (jnp.all(jnp.abs(tf.translation(step)) < converge_t)
                 & jnp.all(jnp.abs(ang) < converge_r))
        return (new_pts, tf.compose(step, rt), it + 1, small,
                (rmse, jnp.sum(w)))

    def cond(st):
        return (~st[3]) & (st[2] < max_iterations) & ~refused

    init = (source.xyz, tf.identity(), jnp.int32(0), jnp.bool_(False),
            (jnp.float32(jnp.inf), jnp.float32(0.0)))
    pts, rt, it, _, (rmse, ninl) = jax.lax.while_loop(cond, body, init)
    return ICPResult(transform=rt, iterations=it, rmse=rmse,
                     n_inliers=ninl.astype(jnp.int32), ok=~refused)


def _solve6(A_rows, residuals, w):
    """Weighted least squares for the 6-param twist [rx ry rz tx ty tz]."""
    W = w[:, None]
    AtA = jnp.matmul(A_rows.T, A_rows * W, precision=_HI)
    Atb = jnp.matmul(A_rows.T, residuals * w, precision=_HI)
    x = jnp.linalg.solve(AtA + 1e-8 * jnp.eye(6), Atb)
    rx, ry, rz, t0, t1, t2 = x
    # Small-angle rotation: R = I + [w]_x, re-orthogonalized via SVD.
    K = jnp.array([[0.0, -rz, ry], [rz, 0.0, -rx], [-ry, rx, 0.0]])
    R = jnp.eye(3) + K
    U, _, Vt = jnp.linalg.svd(R)
    R = U @ Vt
    R = R * jnp.sign(jnp.linalg.det(R))
    return tf.from_rt(R.astype(jnp.float32),
                      jnp.stack([t0, t1, t2]).astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("corr_dist", "max_iterations",
                                             "normal_radius", "normal_k"))
def icp_point2plane(source: PointCloud, target: PointCloud,
                    corr_dist: float = 1.0, max_iterations: int = 30,
                    normal_radius: float = 0.5,
                    normal_k: int = 32) -> ICPResult:
    """Point-to-plane ICP with PCA target normals (common_reg.cpp:122-199)."""
    nb = radius_neighbors(target, target, radius=normal_radius, k=normal_k)
    normals = pca_from_neighbors(target, nb).normal
    tgrid = build_grid(target, cell=corr_dist)

    def body(st):
        pts, rt, it, done, prev = st
        j, d, ok = _nn_1(tgrid, pts, source.mask, corr_dist)
        q = target.xyz[j]
        n = normals[j]
        w = ok.astype(jnp.float32)
        r = jnp.sum((q - pts) * n, axis=-1)              # signed residual
        A = jnp.concatenate([jnp.cross(pts, n), n], axis=1)   # [N, 6]
        step = _solve6(A, r, w)
        new_pts = tf.apply(step, pts)
        cnt = jnp.maximum(jnp.sum(w), 1.0)
        rmse = jnp.sqrt(jnp.sum(w * jnp.sum((new_pts - q) ** 2, -1)) / cnt)
        ang = tf.euler_deg_zyx(tf.rotation(step))
        small = (jnp.all(jnp.abs(tf.translation(step)) < 1e-4)
                 & jnp.all(jnp.abs(ang) < 1e-3))
        return (new_pts, tf.compose(step, rt), it + 1, small,
                (rmse, jnp.sum(w)))

    def cond(st):
        return (~st[3]) & (st[2] < max_iterations)

    init = (source.xyz, tf.identity(), jnp.int32(0), jnp.bool_(False),
            (jnp.float32(jnp.inf), jnp.float32(0.0)))
    pts, rt, it, _, (rmse, ninl) = jax.lax.while_loop(cond, body, init)
    return ICPResult(transform=rt, iterations=it, rmse=rmse,
                     n_inliers=ninl.astype(jnp.int32))


def _regularized_covs(cloud: PointCloud, radius: float, k: int,
                      epsilon: float = 1e-3):
    """GICP per-point covariances: eigenvalues replaced by (1, 1, eps)."""
    nb = radius_neighbors(cloud, cloud, radius=radius, k=k)
    from ghicp_tpu.preprocess.pca import neighborhood_covariance
    cov, _, cnt = neighborhood_covariance(cloud.xyz, nb)
    vals, vecs = eigh3(cov)
    d = jnp.array([1.0, 1.0, epsilon], jnp.float32)
    C = jnp.einsum("nij,j,nkj->nik", vecs, d, vecs)
    # Degenerate neighborhoods -> isotropic.
    okc = (cnt >= 3)[:, None, None]
    return jnp.where(okc, C, jnp.eye(3)[None]), cnt


@functools.partial(jax.jit, static_argnames=("corr_dist", "max_iterations",
                                             "cov_radius", "cov_k"))
def gicp(source: PointCloud, target: PointCloud, corr_dist: float = 1.0,
         max_iterations: int = 30, cov_radius: float = 0.5,
         cov_k: int = 24) -> ICPResult:
    """Generalized (plane-to-plane) ICP (common_reg.cpp:216-284)."""
    Cs, _ = _regularized_covs(source, cov_radius, cov_k)
    Ct, _ = _regularized_covs(target, cov_radius, cov_k)
    tgrid = build_grid(target, cell=corr_dist)

    def body(st):
        pts, rt, it, done, prev = st
        j, d, ok = _nn_1(tgrid, pts, source.mask, corr_dist)
        q = target.xyz[j]
        R = tf.rotation(rt)
        Csr = jnp.einsum("ij,njk,lk->nil", R, Cs, R)
        M = jnp.linalg.inv(Ct[j] + Csr + 1e-6 * jnp.eye(3)[None])
        w = ok.astype(jnp.float32)
        r = q - pts                                        # [N,3]
        # Gauss-Newton rows: for each residual dim m, d r_m / d xi.
        # J = [ [p]_x | -I ] per component with metric M: solve
        # (J^T M J) xi = J^T M r accumulated over points.
        Px = jnp.stack([
            jnp.stack([jnp.zeros_like(pts[:, 0]), pts[:, 2], -pts[:, 1]], 1),
            jnp.stack([-pts[:, 2], jnp.zeros_like(pts[:, 0]), pts[:, 0]], 1),
            jnp.stack([pts[:, 1], -pts[:, 0], jnp.zeros_like(pts[:, 0])], 1),
        ], axis=1)                                         # [N,3,3] = [p]_x^T rows
        J = jnp.concatenate([Px, jnp.broadcast_to(jnp.eye(3)[None],
                                                  Px.shape)], axis=2)  # [N,3,6]
        MJ = jnp.einsum("nij,njk->nik", M, J)
        H = jnp.einsum("nji,njk,n->ik", J, MJ, w)
        g = jnp.einsum("nji,njk,nk,n->i", J, M, r, w)
        xi = jnp.linalg.solve(H + 1e-6 * jnp.eye(6), g)
        K = jnp.array([[0.0, -xi[2], xi[1]], [xi[2], 0.0, -xi[0]],
                       [-xi[1], xi[0], 0.0]])
        Rs = jnp.eye(3) + K
        U, _, Vt = jnp.linalg.svd(Rs)
        Rs = (U @ Vt).astype(jnp.float32)
        step = tf.from_rt(Rs, xi[3:].astype(jnp.float32))
        new_pts = tf.apply(step, pts)
        cnt = jnp.maximum(jnp.sum(w), 1.0)
        rmse = jnp.sqrt(jnp.sum(w * jnp.sum((new_pts - q) ** 2, -1)) / cnt)
        ang = tf.euler_deg_zyx(Rs)
        small = (jnp.all(jnp.abs(xi[3:]) < 1e-4)
                 & jnp.all(jnp.abs(ang) < 1e-3))
        return (new_pts, tf.compose(step, rt), it + 1, small,
                (rmse, jnp.sum(w)))

    def cond(st):
        return (~st[3]) & (st[2] < max_iterations)

    init = (source.xyz, tf.identity(), jnp.int32(0), jnp.bool_(False),
            (jnp.float32(jnp.inf), jnp.float32(0.0)))
    pts, rt, it, _, (rmse, ninl) = jax.lax.while_loop(cond, body, init)
    return ICPResult(transform=rt, iterations=it, rmse=rmse,
                     n_inliers=ninl.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("thresh",))
def overlap_ratio(cloud1: PointCloud, cloud2: PointCloud,
                  thresh: float) -> Array:
    """Fraction of cloud1 points with a cloud2 neighbor within ``thresh``
    (common_reg.cpp:294-317)."""
    grid = build_grid(cloud2, cell=thresh)
    _, _, ok = _nn_1(grid, cloud1.xyz, cloud1.mask, thresh)
    n = jnp.maximum(jnp.sum(cloud1.mask.astype(jnp.float32)), 1.0)
    return jnp.sum(ok.astype(jnp.float32)) / n


@functools.partial(jax.jit, static_argnames=("n_hypotheses", "inlier_thresh"))
def _sac_core(src_kp: Array, src_mask: Array, tgt_kp: Array,
              cand_idx: Array, key: Array, eval_pts: Array, eval_mask: Array,
              tgt_cloud_xyz: Array, tgt_cloud_mask: Array,
              n_hypotheses: int = 512, inlier_thresh: float = 0.5):
    """RANSAC over feature-matched 3-point samples, fully vmapped."""
    S = src_kp.shape[0]
    n_cand = cand_idx.shape[1]

    def one(k):
        k1, k2 = jax.random.split(k)
        rows = jax.random.choice(k1, S, (3,), replace=False,
                                 p=src_mask / jnp.maximum(src_mask.sum(), 1))
        picks = jax.random.randint(k2, (3,), 0, n_cand)
        j = cand_idx[rows, picks]
        T = kabsch_6dof(src_kp[rows], tgt_kp[j], jnp.ones(3))
        moved = tf.apply(T, eval_pts)
        # inlier score against the target keypoints (coarse but cheap):
        d2 = jnp.min(jnp.sum(
            (moved[:, None, :] - tgt_cloud_xyz[None, :, :]) ** 2, -1)
            + jnp.where(tgt_cloud_mask[None, :], 0.0, jnp.inf), axis=1)
        inl = jnp.sum(eval_mask * (d2 < inlier_thresh ** 2))
        return inl, T

    keys = jax.random.split(key, n_hypotheses)
    scores, Ts = jax.lax.map(one, keys)
    best = jnp.argmax(scores)
    return Ts[best], scores[best]


def sac_ia_fpfh(source: PointCloud, target: PointCloud, config,
                n_hypotheses: int = 512, n_candidates: int = 8,
                inlier_thresh: float = 0.5, n_eval: int = 512, seed: int = 0):
    """FPFH-guided RANSAC coarse alignment (common_reg.cpp:392-423).

    Computes FPFH on both clouds, takes each source point's top feature
    matches as correspondence candidates, then scores ``n_hypotheses``
    3-point rigid hypotheses in parallel.  Returns (T [4,4], inlier count).
    """
    from ghicp_tpu.features import fpfh_features, fpfh_similarity_matrix
    radius = getattr(config, "fpfh_radius", 0.0) or \
        3.0 * getattr(config, "voxel_size", 0.1)
    hs, vs = fpfh_features(source, radius=radius, k=24)
    ht, vt = fpfh_features(target, radius=radius, k=24)
    sim = fpfh_similarity_matrix(hs, ht)
    sim = jnp.where(source.mask[:, None] & target.mask[None, :], sim, -1.0)
    _, cand = jax.lax.top_k(sim, n_candidates)           # [S, C]
    key = jax.random.PRNGKey(seed)
    # Evaluation subset of source points.
    stride = max(source.capacity // n_eval, 1)
    eval_pts = source.xyz[::stride][:n_eval]
    eval_mask = source.mask[::stride][:n_eval].astype(jnp.float32)
    T, score = _sac_core(source.xyz, source.mask.astype(jnp.float32),
                         target.xyz, cand, key, eval_pts, eval_mask,
                         target.xyz, target.mask,
                         n_hypotheses=n_hypotheses,
                         inlier_thresh=inlier_thresh)
    return T, score
