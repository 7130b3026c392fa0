"""Core array types for the TPU-native GH-ICP engine.

The reference (GH-ICP, ``include/utility.h:24-130``) models clouds as PCL
point vectors with dynamic sizes.  On TPU every shape must be static, so the
fundamental container here is a *padded* point cloud: a fixed-capacity
``[N, 3]`` float32 coordinate array plus a ``[N]`` validity mask.  All kernels
thread the mask through reductions instead of compacting.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def round_up(n: int, multiple: int) -> int:
    """Round ``n`` up to the next multiple of ``multiple``."""
    return ((n + multiple - 1) // multiple) * multiple


def bucket_size(n: int, multiple: int = 256, min_size: int = 256) -> int:
    """Pick a static bucket capacity for ``n`` live elements.

    Buckets are powers-of-two-ish multiples so recompilation stays rare when
    keypoint counts drift between scans (SURVEY.md §7 "static shapes").
    """
    n = max(n, 1)
    size = max(min_size, multiple)
    while size < n:
        size *= 2
    return size


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointCloud:
    """A fixed-capacity point cloud: padded coordinates + validity mask.

    TPU-native replacement for ``pcl::PointCloud<PointT>`` (utility.h:24-46).
    ``xyz`` rows at ``mask == False`` are padding and must be ignored by every
    consumer; they are filled with the cloud centroid so that distance-based
    kernels stay numerically tame.
    """

    xyz: Array   # [N, 3] float32
    mask: Array  # [N] bool

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def count(self) -> Array:
        """Number of live points (traced scalar)."""
        return jnp.sum(self.mask.astype(jnp.int32))

    @classmethod
    def from_points(cls, pts, capacity: Optional[int] = None) -> "PointCloud":
        """Build a padded cloud from a host-side [n,3] array."""
        pts = np.asarray(pts, dtype=np.float32)
        if pts.ndim != 2 or pts.shape[1] != 3:
            raise ValueError(f"expected [n,3] points, got {pts.shape}")
        n = pts.shape[0]
        cap = capacity if capacity is not None else bucket_size(n)
        if cap < n:
            raise ValueError(f"capacity {cap} < point count {n}")
        fill = pts.mean(axis=0) if n else np.zeros(3, np.float32)
        xyz = np.full((cap, 3), fill, dtype=np.float32)
        xyz[:n] = pts
        mask = np.zeros(cap, dtype=bool)
        mask[:n] = True
        return cls(xyz=jnp.asarray(xyz), mask=jnp.asarray(mask))

    def to_numpy(self) -> np.ndarray:
        """Host-side compacted [n,3] float32 array of live points."""
        xyz = fetch_xyz(self.xyz)
        mask = np.asarray(self.mask)
        return xyz[mask]


import functools


@functools.partial(jax.jit, static_argnames=("capacity",))
def _compact_gather(cloud: "PointCloud", capacity: int) -> "PointCloud":
    # Stable argsort on ~mask keeps live points first, in original order.
    sel = jnp.argsort(~cloud.mask)[:capacity]
    cmask = cloud.mask[sel]
    centroid = masked_mean(cloud.xyz, cloud.mask[:, None], axis=0)
    xyz = jnp.where(cmask[:, None], cloud.xyz[sel], centroid)
    return PointCloud(xyz=xyz, mask=cmask)


def compact_device(cloud: PointCloud,
                   capacity: Optional[int] = None) -> PointCloud:
    """Compact live points into a smaller bucket WITHOUT leaving the device.

    The host sees only a scalar count (for the static bucket size); the
    gather itself is an on-device stable argsort + take.  Replaces the
    [N,3] device->host->device bounce of ``to_numpy``/``from_points``
    between pipeline stages (~0.3 s per 1M-capacity cloud through the
    remote-TPU tunnel; the device-side sort is ~5 ms).  Padding rows are
    filled with the live centroid, matching ``from_points``.
    """
    if capacity is None:
        # Scalar count fetch = one remote round trip; callers compacting
        # several clouds should fetch all counts in ONE jax.device_get and
        # pass bucket_size(count) as ``capacity``.
        capacity = bucket_size(int(jnp.sum(cloud.mask)))
    cap = capacity
    if cap > cloud.capacity:
        cap = cloud.capacity
    return _compact_gather(cloud, cap)


def fetch_xyz(x) -> np.ndarray:
    """Device -> host transfer of an [N, 3] array via its transpose.

    Downloading small-minor-dim arrays through the axon TPU tunnel is ~100x
    slower than downloading [3, N] (tiled-layout relayout on the device side
    of the link); route every coordinate download through this helper.
    """
    if hasattr(x, "device"):  # jax array
        return np.asarray(jnp.transpose(x)).T
    return np.asarray(x)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Bounds:
    """Axis-aligned bounding box (reference ``Bounds``, utility.h:66-90)."""

    min_xyz: Array  # [3]
    max_xyz: Array  # [3]

    @property
    def magnitude(self) -> Array:
        """Sum of extents — matches ``bbx_magnitude`` (ghicp_main.cpp:93)."""
        return jnp.sum(self.max_xyz - self.min_xyz)


def cloud_bounds(cloud: PointCloud) -> Bounds:
    """Masked bounding box of a padded cloud (utility.h:153-176)."""
    big = jnp.float32(3.0e38)
    m = cloud.mask[:, None]
    mn = jnp.min(jnp.where(m, cloud.xyz, big), axis=0)
    mx = jnp.max(jnp.where(m, cloud.xyz, -big), axis=0)
    return Bounds(min_xyz=mn, max_xyz=mx)


def masked_mean(x: Array, mask: Array, axis=None, keepdims=False) -> Array:
    """Mean of ``x`` over entries where ``mask`` is true."""
    mask = mask.astype(x.dtype)
    num = jnp.sum(x * mask, axis=axis, keepdims=keepdims)
    den = jnp.maximum(jnp.sum(mask, axis=axis, keepdims=keepdims), 1.0)
    return num / den
