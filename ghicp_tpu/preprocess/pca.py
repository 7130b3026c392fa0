"""Batched neighborhood PCA: eigenvalues, curvature, normals.

TPU-native re-design of ``PrincipleComponentAnalysis`` (reference
``include/pca.h:133-250``): one fused, chunked pass computes every point's
grid neighborhood, covariance and a batched 3x3 Jacobi eigendecomposition —
no serial KD-tree queries, and no materialized [N, K] neighbor lists (at TLS
scale, 1M points x K=256 would be gigabytes; the fused pipeline keeps only
[chunk, K] alive inside a ``lax.map``).

Feature definitions follow pca.h:225-247 exactly:
  curvature   = lambda3 / (lambda1 + lambda2 + lambda3)
  linearity   = (lambda1 - lambda2) / lambda1
  planarity   = (lambda2 - lambda3) / lambda1
  sphericity  = lambda3 / lambda1
with lambda1 >= lambda2 >= lambda3.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ghicp_tpu.core.types import PointCloud
from ghicp_tpu.ops.eigh3 import eigh3
from ghicp_tpu.preprocess.neighbors import (CellTable, NeighborList,
                                            build_cell_table, cell_candidates)

Array = jax.Array


class PCAFeatures(NamedTuple):
    eigvals: Array     # [N, 3] descending (lambda1, lambda2, lambda3)
    principal: Array   # [N, 3] eigenvector of lambda1
    normal: Array      # [N, 3] eigenvector of lambda3
    curvature: Array   # [N]
    n_neighbors: Array # [N] int32 (reference ``ptNum``)
    valid: Array       # [N] point valid & >= 3 neighbors


def neighborhood_covariance(xyz: Array, neighbors: NeighborList):
    """Masked covariance of each point's neighborhood.

    Returns (cov [N,3,3], mean [N,3], count [N]).  Matches PCL's PCA (plain
    unweighted covariance over the neighbor set, pca.h:202-250).
    """
    npts = xyz[neighbors.idx]                       # [N, K, 3]
    w = neighbors.valid.astype(jnp.float32)         # [N, K]
    cnt = jnp.sum(w, axis=1)
    denom = jnp.maximum(cnt, 1.0)
    mean = jnp.sum(npts * w[..., None], axis=1) / denom[:, None]
    d = (npts - mean[:, None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", d, npts - mean[:, None, :])
    cov = cov / denom[:, None, None]
    return cov, mean, cnt


def _pca_cell_block(table: CellTable, qxyz: Array, qmask: Array,
                    radius: float) -> PCAFeatures:
    """Moment-accumulation PCA over a cell-table candidate window.

    Candidates are centered at the query before accumulating raw moments, so
    all magnitudes stay O(radius) and the E[ddT] - mu muT covariance
    subtraction is numerically safe in f32 even for 100m-scale TLS
    coordinates.  The moment sums are masked batched matmuls (MXU work), and
    the only large gather is 27 cell-block rows per query (see
    :class:`CellTable`).
    """
    cxyz, ok = cell_candidates(table, qxyz, qmask)           # [B,C,3],[B,C]
    d = cxyz - qxyz[:, None, :]
    d2 = jnp.sum(d * d, axis=-1)
    w = (ok & (d2 <= radius * radius)).astype(jnp.float32)   # [B, C]
    cnt = jnp.sum(w, axis=1)
    denom = jnp.maximum(cnt, 1.0)
    dw = d * w[..., None]
    s1 = jnp.sum(dw, axis=1) / denom[:, None]                # mean offset
    s2 = jnp.einsum("bci,bcj->bij", dw, d) / denom[:, None, None]
    cov = s2 - s1[:, :, None] * s1[:, None, :]
    vals, vecs = eigh3(cov)
    vals = jnp.maximum(vals, 0.0)
    total = jnp.sum(vals, axis=-1)
    curvature = jnp.where(total > 0, vals[:, 2] / jnp.maximum(total, 1e-30),
                          0.0)
    valid = qmask & (cnt >= 3)
    return PCAFeatures(eigvals=vals, principal=vecs[:, :, 0],
                       normal=vecs[:, :, 2], curvature=curvature,
                       n_neighbors=cnt.astype(jnp.int32), valid=valid)


@functools.partial(jax.jit, static_argnames=("radius", "k", "cell_cap",
                                             "chunk", "max_cells"))
def pca_features(cloud: PointCloud, radius: float, k: int = 128,
                 cell_cap: int = 64, chunk: int = 4096,
                 max_cells: int = 0) -> PCAFeatures:
    """Per-point PCA features over a fixed-radius (cap-truncated) neighborhood.

    Fused + chunked: peak extra memory is O(chunk * 27 * cell_cap) plus the
    O(max_cells * cell_cap) cell table; never O(N * K).  ``max_cells`` must
    cover the occupied-cell count or cells are silently dropped from
    candidate sets; the default (= capacity) can never overflow, since each
    occupied cell holds at least one valid point.  At TLS densities each
    ``radius``-sized cell holds tens of points, so passing capacity // 8
    (e.g. via ``GHICPConfig.pca_max_cells``) cuts the table memory several-
    fold with full coverage.
    """
    if max_cells <= 0:
        max_cells = cloud.capacity
    table = build_cell_table(cloud, cell=radius, max_cells=max_cells,
                             cap=cell_cap)
    n = cloud.capacity
    pad = (-n) % chunk
    qxyz = jnp.pad(cloud.xyz, ((0, pad), (0, 0)))
    qmask = jnp.pad(cloud.mask, (0, pad))

    def body(args):
        x, m = args
        return _pca_cell_block(table, x, m, radius)

    out = jax.lax.map(body, (qxyz.reshape(-1, chunk, 3),
                             qmask.reshape(-1, chunk)))
    return PCAFeatures(*(v.reshape((-1,) + v.shape[2:])[:n] for v in out))


@jax.jit
def pca_from_neighbors(cloud: PointCloud, nb: NeighborList) -> PCAFeatures:
    """PCA features from a precomputed neighbor list (small clouds only)."""
    cov, _, cnt = neighborhood_covariance(cloud.xyz, nb)
    vals, vecs = eigh3(cov)
    vals = jnp.maximum(vals, 0.0)
    total = jnp.sum(vals, axis=-1)
    curvature = jnp.where(total > 0, vals[:, 2] / jnp.maximum(total, 1e-30), 0.0)
    valid = cloud.mask & (cnt >= 3)
    return PCAFeatures(eigvals=vals, principal=vecs[:, :, 0],
                       normal=vecs[:, :, 2], curvature=curvature,
                       n_neighbors=cnt.astype(jnp.int32), valid=valid)
