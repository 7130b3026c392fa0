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

import functools

import jax
import jax.numpy as jnp

from ghicp_tpu.core.types import PointCloud, cloud_bounds

Array = jax.Array

# Large odd multipliers mix the three voxel coordinates into 32 bits.
_P1, _P2, _P3 = 73856093, 19349663, 83492791


def voxel_keys(xyz: Array, min_xyz: Array, voxel_size) -> Array:
    """int32 hash key of the voxel containing each point ([N,3] -> [N]).

    Column-wise (1-D integer vectors only): [N,3] int32 intermediates cause
    pathological XLA:TPU compile times on the axon backend.
    """
    inv = 1.0 / voxel_size
    hx = jnp.floor((xyz[:, 0] - min_xyz[0]) * inv).astype(jnp.int32) * _P1
    hy = jnp.floor((xyz[:, 1] - min_xyz[1]) * inv).astype(jnp.int32) * _P2
    hz = jnp.floor((xyz[:, 2] - min_xyz[2]) * inv).astype(jnp.int32) * _P3
    return hx + hy + hz


@functools.partial(jax.jit, static_argnames=("voxel_size", "mode"))
def voxel_downsample(cloud: PointCloud, voxel_size: float,
                     mode: str = "first") -> PointCloud:
    """One point per voxel; jitted, shape-preserving (mask shrinks).

    mode="first" keeps the lowest-original-index raw point per voxel (the
    reference's semantics, filter.hpp:71-83).  mode="centroid" emits the
    mean of the voxel's points instead: the representative is then stable
    across re-scans of the same surface (keep-first wobbles by up to the
    voxel diagonal depending on which raw point lands first), which feeds
    descriptors a far less noisy support cloud.
    """
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
    xyz_sorted = cloud.xyz[order]
    if mode == "centroid":
        run_id = jnp.cumsum(head) - 1                     # [N] int32
        mf = cloud.mask[order].astype(jnp.float32)[:, None]
        sums = jax.ops.segment_sum(xyz_sorted * mf, run_id, num_segments=n)
        cnts = jax.ops.segment_sum(mf, run_id, num_segments=n)
        centroid = sums / jnp.maximum(cnts, 1.0)
        xyz_sorted = jnp.where(mask[:, None], centroid[run_id], xyz_sorted)
    return PointCloud(xyz=xyz_sorted, mask=mask)
