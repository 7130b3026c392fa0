"""Outlier / region filters (reference ``include/filter.hpp:91-143``).

Mask-based (no compaction) TPU equivalents of the remaining ``CFilter``
members beyond the voxel filter:

* :func:`sor_filter` — statistical outlier removal
  (``SORFilter``, filter.hpp:91-103, a PCL wrapper in the reference):
  drop points whose mean K-NN distance exceeds
  global_mean + std_mul * global_std.
* :func:`distance_filter` — keep points inside a horizontal-distance ring
  and a z band (``DisFilter``, filter.hpp:105-117 — which computes
  ``x^2 + y + y``; we compute the intended ``x^2 + y^2``, SURVEY.md §2
  quirks).
* :func:`bbx_filter` — drop points inside any of a set of active bounding
  boxes (``ActiveObjectFilter``, filter.hpp:119-141).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ghicp_tpu.core.types import PointCloud
from ghicp_tpu.preprocess.neighbors import radius_neighbors

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("mean_k", "std_mul", "radius"))
def sor_filter(cloud: PointCloud, mean_k: int = 50, std_mul: float = 2.0,
               radius: float = 1.0) -> PointCloud:
    """Statistical outlier removal: mask out points whose mean distance to
    their ``mean_k`` nearest neighbors (within ``radius``) is beyond
    mean + std_mul * std of that statistic over the cloud."""
    nb = radius_neighbors(cloud, cloud, radius=radius, k=mean_k,
                          include_self=False)
    d = jnp.sqrt(jnp.where(nb.valid, nb.dist2, 0.0))
    cnt = jnp.maximum(jnp.sum(nb.valid, axis=1), 1)
    mean_d = jnp.sum(d, axis=1) / cnt
    # Isolated points (no neighbors in radius) are outliers by definition.
    has_nb = jnp.sum(nb.valid, axis=1) > 0
    valid = cloud.mask & has_nb
    n = jnp.maximum(jnp.sum(valid), 1)
    mu = jnp.sum(jnp.where(valid, mean_d, 0.0)) / n
    var = jnp.sum(jnp.where(valid, (mean_d - mu) ** 2, 0.0)) / n
    thresh = mu + std_mul * jnp.sqrt(var)
    keep = valid & (mean_d <= thresh)
    return PointCloud(xyz=cloud.xyz, mask=keep)


@jax.jit
def distance_filter(cloud: PointCloud, xy_dis_max: float, z_min: float,
                    z_max: float) -> PointCloud:
    """Keep points with horizontal distance < xy_dis_max and z in band."""
    x, y, z = cloud.xyz[:, 0], cloud.xyz[:, 1], cloud.xyz[:, 2]
    keep = (cloud.mask & (x * x + y * y < xy_dis_max * xy_dis_max)
            & (z > z_min) & (z < z_max))
    return PointCloud(xyz=cloud.xyz, mask=keep)


@jax.jit
def bbx_filter(cloud: PointCloud, bbx_min: Array, bbx_max: Array
               ) -> PointCloud:
    """Drop points inside any active bounding box.

    bbx_min/bbx_max: [B, 3] box corners (ActiveObjectFilter semantics).
    """
    p = cloud.xyz[:, None, :]                           # [N, 1, 3]
    inside = jnp.all((p > bbx_min[None]) & (p < bbx_max[None]), axis=-1)
    keep = cloud.mask & ~jnp.any(inside, axis=-1)
    return PointCloud(xyz=cloud.xyz, mask=keep)
