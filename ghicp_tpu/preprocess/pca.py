"""Batched neighborhood PCA: eigenvalues, curvature, normals.

TPU-native re-design of ``PrincipleComponentAnalysis`` (reference
``include/pca.h:133-250``): one vectorized pass computes every point's
neighborhood covariance and a batched 3x3 Jacobi eigendecomposition, instead
of a serial KD-tree query + Eigen solve per point.

Feature definitions follow pca.h:225-247 exactly:
  curvature   = lambda3 / (lambda1 + lambda2 + lambda3)
  linearity   = (lambda1 - lambda2) / lambda1
  planarity   = (lambda2 - lambda3) / lambda1
  sphericity  = lambda3 / lambda1
with lambda1 >= lambda2 >= lambda3.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ghicp_tpu.core.types import PointCloud
from ghicp_tpu.ops.eigh3 import eigh3
from ghicp_tpu.preprocess.neighbors import NeighborList, radius_neighbors

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


def pca_features(cloud: PointCloud, radius: float, k: int = 64,
                 cell_cap: int = 16, chunk: int = 4096) -> PCAFeatures:
    """Per-point PCA features over a fixed-radius (K-capped) neighborhood."""
    nb = radius_neighbors(cloud, cloud, radius=radius, k=k,
                          cell_cap=cell_cap, chunk=chunk)
    return pca_from_neighbors(cloud, nb)


@jax.jit
def pca_from_neighbors(cloud: PointCloud, nb: NeighborList) -> PCAFeatures:
    cov, _, cnt = neighborhood_covariance(cloud.xyz, nb)
    vals, vecs = eigh3(cov)
    vals = jnp.maximum(vals, 0.0)  # covariance is PSD; clamp Jacobi round-off
    total = jnp.sum(vals, axis=-1)
    curvature = jnp.where(total > 0, vals[:, 2] / jnp.maximum(total, 1e-30), 0.0)
    valid = cloud.mask & (cnt >= 3)
    return PCAFeatures(eigvals=vals, principal=vecs[:, :, 0],
                       normal=vecs[:, :, 2], curvature=curvature,
                       n_neighbors=cnt.astype(jnp.int32), valid=valid)
