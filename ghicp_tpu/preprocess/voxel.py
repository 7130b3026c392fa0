"""Voxel-grid downsampling (keep one point per voxel).

TPU-native re-design of ``CFilter::voxelfilter`` (reference
``include/filter.hpp:28-88``): the reference builds 64-bit linearized voxel
keys, sorts them and emits run heads.  Here the same idea becomes a fully
vectorized sort + run-head mask under jit, with two deliberate fixes over the
reference:

* the reference pre-sizes ``id_pairs`` and then push_backs, duplicating point
  0 into voxel 0 (filter.hpp:52-66) — we don't;
* instead of a 64-bit linear index (which can overflow), voxel coordinates are
  mixed into an int32 hash.  Hash collisions would merge two far-apart voxels
  (dropping at most one point) with probability ~n_voxels/2^32 — negligible,
  and harmless for downsampling semantics.

The output keeps the input's capacity: points are returned in voxel-key order
with a mask selecting one representative (the lowest-original-index point) per
voxel.  Compaction to a smaller bucket happens host-side between stages.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ghicp_tpu.core.types import PointCloud, cloud_bounds

Array = jax.Array

# Large odd multipliers mix the three voxel coordinates into 32 bits.
_P1, _P2, _P3 = 73856093, 19349663, 83492791


def voxel_keys(xyz: Array, min_xyz: Array, voxel_size) -> Array:
    """int32 hash key of the voxel containing each point ([N,3] -> [N])."""
    v = jnp.floor((xyz - min_xyz) * (1.0 / voxel_size)).astype(jnp.int32)
    return v[:, 0] * _P1 + v[:, 1] * _P2 + v[:, 2] * _P3


def voxel_downsample(cloud: PointCloud, voxel_size: float) -> PointCloud:
    """One point per voxel; jit-safe, shape-preserving (mask shrinks)."""
    bounds = cloud_bounds(cloud)
    keys = voxel_keys(cloud.xyz, bounds.min_xyz, voxel_size)
    # Invalid points sort last (max key) and stay masked out.
    keys = jnp.where(cloud.mask, keys, jnp.int32(2**31 - 1))
    n = cloud.capacity
    idx = jnp.arange(n, dtype=jnp.int32)
    # Sort by (key, original index): representative = first point of each run.
    order = jnp.lexsort((idx, keys))
    sorted_keys = keys[order]
    head = jnp.concatenate([
        jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]])
    mask = head & cloud.mask[order]
    return PointCloud(xyz=cloud.xyz[order], mask=mask)
