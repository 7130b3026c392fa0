"""BSC (Binary Shape Context) feature encoder, batched for TPU.

TPU-native re-design of ``BSCEncoder`` (reference
``include/binary_feature_extraction.hpp``).  Semantics preserved:

* per-keypoint neighborhood = ball of radius sqrt(3)*r (bfe.hpp:641), where
  r is the keypoint non-max radius (ghicp_main.cpp:113);
* local coordinate system (LCS) from distance-weighted PCA with weight
  ``sqrt(2)*r - dist`` around the *unweighted* centroid (bfe.hpp:940-1035):
  X = principal eigenvector, Y = X x N (N = smallest eigenvector), Z = X x Y
  (bfe.hpp:137-146);
* neighborhood rotated into the LCS, projected onto the XOY/XOZ/YOZ planes,
  each binned on a g x g grid by Gaussian-weighted point count and average
  depth: weight = exp(-d^2 / (2 delta^2)) with delta = cell/2, support radius
  1.5*cell around each cell center (bfe.hpp:196-245 — note PCL's radiusSearch
  returns *squared* distances, which is what feeds the exponent);
* binarization (bfe.hpp:464-565): g^2*3 occupancy bits (normalized density
  > 0.1), then per plane g^2 random cell pairs x {depth-difference,
  density-difference} comparison bits against mean +- 1 sigma over the pairs.
  The reference's density-vacancy gate reads plane-0 densities regardless of
  the current plane (bfe.hpp:543 — no ``+offset``); we replicate that to keep
  Hamming distributions aligned;
* 1/2/4 axis-flipped LCS variants generated as pure index permutations of the
  grids (bfe.hpp:678-837): variant planes (xy,xz,yz) permuted by
  (flip-both, flip-v, flip-v), (flip-u, flip-v, flip-both),
  (flip-v, flip-both, flip-u) for variants 1..3.

Replacements of host machinery: the persisted ``sample_pattern.txt``
(bfe.hpp:96-116) becomes a seeded PRNG pattern; the per-cell KD-tree searches
become one dense [K, g^2] Gaussian weight product per plane (vectorized over
keypoints); bit-packing targets uint32 lanes for
``jax.lax.population_count``.

Everything is vmapped over keypoints: no python loops at runtime.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ghicp_tpu.core.config import GHICPConfig
from ghicp_tpu.core.types import PointCloud
from ghicp_tpu.ops.eigh3 import eigh3
from ghicp_tpu.preprocess.neighbors import radius_neighbors

Array = jax.Array


class BSCFeatures(NamedTuple):
    """Packed binary features. packed[v, s, w] = uint32 lane w of variant v."""

    packed: Array   # [V, S, n_words] uint32
    mask: Array     # [S] keypoint validity
    n_bits: int
    frames: Optional[Array] = None  # [S, 3, 3] LCS rotations (rows = axes)
                                    # — the frames the encoder rotated each
                                    # neighborhood into, exported so pose-
                                    # hypothesis consumers (matching/
                                    # ransac.py) skip a second neighbor
                                    # search + weighted PCA (bsc_frames)


def sample_pattern(seed: int, grid_side: int) -> np.ndarray:
    """[g^2, 2] random distinct, unordered-unique cell index pairs.

    Deterministic PRNG replacement for the reference's hidden
    ``sample_pattern.txt`` runtime input (bfe.hpp:86-116).
    """
    g2 = grid_side * grid_side
    rng = np.random.default_rng(seed)
    pairs = []
    seen = set()
    while len(pairs) < g2:
        a, b = int(rng.integers(g2)), int(rng.integers(g2))
        if a == b or (a, b) in seen or (b, a) in seen:
            continue
        seen.add((a, b))
        pairs.append((a, b))
    return np.asarray(pairs, dtype=np.int32)


def _flip_permutations(g: int) -> np.ndarray:
    """Index permutations of a g x g plane grid (bfe.hpp:701-758).

    Cell linear index k = u + v*g (bfe.hpp:239 layout).  Returns [4, g*g]:
    identity, flip-both (type 1), flip-v (type 2), flip-u (type 3).
    """
    k = np.arange(g * g)
    u, v = k % g, k // g
    ident = k
    flip_both = (g - 1 - u) + (g - 1 - v) * g
    flip_v = u + (g - 1 - v) * g
    flip_u = (g - 1 - u) + v * g
    return np.stack([ident, flip_both, flip_v, flip_u])


def variant_permutations(g: int, num_variants: int) -> np.ndarray:
    """[V, 3, g^2] per-plane grid permutations for the LCS flip variants.

    The four variants are the four proper-rotation sign combinations of the
    PCA axes (x, n) the eigensolver cannot disambiguate (bfe.hpp:762-837):
      0: ( x,  y,  z)    1: (-x, -y,  z)   [x -> -x]
      2: ( x, -y, -z)    [n -> -n]         3: (-x,  y, -z)   [both]
    Each flip maps the (xy, xz, yz) projection grids to exact cell
    permutations; depth values negate along flipped depth axes, which the
    mean/std-symmetric comparison bits (bfe.hpp:525-560) are invariant to —
    so the permuted feature equals the feature computed in the flipped LCS.

    Note: the reference's ``ReArrange_reverse_sym_*`` (bfe.hpp:702-733) reads
    its grids with a transposed index layout (k/side vs the k%side used at
    construction, bfe.hpp:239), so its rearrangements flip the wrong plane
    axis on some planes.  We use the geometrically exact permutations — a
    deliberate fidelity fix, validated by the rotation-invariance test.
    """
    f = _flip_permutations(g)
    ident, both, flip_v, flip_u = f[0], f[1], f[2], f[3]
    table = [
        (ident, ident, ident),    # ( x,  y,  z)
        (both, flip_u, flip_u),   # (-x, -y,  z): qx,qy flip
        (flip_v, flip_v, both),   # ( x, -y, -z): qy,qz flip
        (flip_u, both, flip_v),   # (-x,  y, -z): qx,qz flip
    ]
    return np.stack([np.stack(t) for t in table])[:num_variants]


def _local_coordinate_system(nxyz: Array, nvalid: Array, kp: Array, r: float):
    """Weighted-PCA LCS (bfe.hpp:940-1035). nxyz: [K,3] neighbor coords.

    Returns [3,3] rotation whose ROWS are the (x, y, z) LCS axes.  Axis signs
    are canonicalized (largest-|component| positive) — the reference leaves
    them to Eigen's arbitrary choice and compensates with the flipped
    variants; a deterministic convention composes with the same variants.
    """
    w = jnp.where(nvalid, np.sqrt(2.0) * r -
                  jnp.sqrt(jnp.sum((nxyz - kp) ** 2, axis=-1)), 0.0)
    nv = jnp.maximum(jnp.sum(nvalid.astype(jnp.float32)), 1.0)
    center = jnp.sum(jnp.where(nvalid[:, None], nxyz, 0.0), axis=0) / nv
    d = jnp.where(nvalid[:, None], nxyz - center, 0.0)
    cov = jnp.einsum("k,ki,kj->ij", w, d, d) / jnp.where(
        jnp.abs(jnp.sum(w)) > 1e-12, jnp.sum(w), 1.0)
    vals, vecs = eigh3(cov)
    x = vecs[:, 0]
    n = vecs[:, 2]

    def canon(v):
        i = jnp.argmax(jnp.abs(v))
        return v * jnp.sign(v[i] + 1e-30)

    x = canon(x)
    n = canon(n)
    y = jnp.cross(x, n)
    y = y / jnp.maximum(jnp.linalg.norm(y), 1e-12)
    z = jnp.cross(x, y)
    return jnp.stack([x, y, z])


def _grid_accumulate(local: Array, nvalid: Array, g: int, r: float):
    """Gaussian binning of LCS-local points onto the 3 projection planes.

    local: [K, 3]. Returns (density_nw [3, g^2], avg_depth [3, g^2]),
    reproducing constructCubicGrid (bfe.hpp:196-373).
    """
    unit = 2.0 * r / g
    delta = unit * 0.5
    centers = (jnp.arange(g, dtype=jnp.float32) + 0.5) * unit - r  # [g]
    # planes: (u, v, depth-axis): XY->z, XZ->y, YZ->x (bfe.hpp:206-313)
    plane_axes = ((0, 1, 2), (0, 2, 1), (1, 2, 0))
    densities, depths = [], []
    support2 = (1.5 * unit) ** 2
    inv2d2 = 1.0 / (2.0 * delta * delta)
    for (ua, va, da) in plane_axes:
        u, v, dep = local[:, ua], local[:, va], local[:, da] + r
        du2 = (u[:, None] - centers[None, :]) ** 2          # [K, g]
        dv2 = (v[:, None] - centers[None, :]) ** 2          # [K, g]
        # [K, g_u, g_v] squared distance point -> cell center
        d2 = du2[:, :, None] + dv2[:, None, :]
        wgt = jnp.where((d2 <= support2) & nvalid[:, None, None],
                        jnp.exp(-d2 * inv2d2), 0.0)
        pnum = jnp.sum(wgt, axis=0)                          # [g_u, g_v]
        dsum = jnp.sum(wgt * dep[:, None, None], axis=0)
        avg_depth = jnp.where(pnum > 0, dsum / jnp.maximum(pnum, 1e-30), 0.0)
        # linear cell index k = u + v*g  ->  transpose to [g_v, g_u] then flat
        densities.append(pnum.T.reshape(-1))
        depths.append(avg_depth.T.reshape(-1))
    pnum3 = jnp.stack(densities)                             # [3, g^2]
    depth3 = jnp.stack(depths)
    n_pts = jnp.maximum(jnp.sum(nvalid.astype(jnp.float32)), 1.0)
    neigh_density = n_pts / (np.pi * r * r)
    nw = (pnum3 / (unit * unit)) / neigh_density
    return nw, depth3


def _binarize(nw: Array, depth: Array, pairs: Array, thresh: float = 0.1):
    """One variant's 441 bits from [3, g^2] grids (bfe.hpp:464-565).

    Returns float32 [n_bits] of {0, 1}.
    """
    g2 = nw.shape[1]
    occupancy = (nw > thresh).reshape(-1)                    # [3*g^2]
    p1, p2 = pairs[:, 0], pairs[:, 1]
    # Reference quirk (bfe.hpp:543): the density-vacancy gate always reads
    # plane 0 (XY), replicated here for Hamming-distribution parity.
    gate0 = (nw[0, p1] < thresh) & (nw[0, p2] < thresh)      # [g^2]
    compare = []
    for plane in range(3):
        dd = depth[plane, p1] - depth[plane, p2]
        dm = jnp.mean(dd)
        ds = jnp.sqrt(jnp.mean((dd - dm) ** 2))
        depth_bit = jnp.abs(dd - dm) > ds
        nd = nw[plane, p1] - nw[plane, p2]
        nm = jnp.mean(nd)
        ns = jnp.sqrt(jnp.mean((nd - nm) ** 2))
        dens_bit = (~gate0) & (jnp.abs(nd - nm) > ns)
        compare.append(jnp.stack([depth_bit, dens_bit], axis=1).reshape(-1))
    bits = jnp.concatenate([occupancy] + compare)
    return bits.astype(jnp.float32)


def pack_bits(bits: Array) -> Array:
    """Pack [..., n_bits] {0,1} floats into [..., ceil(n/32)] uint32 lanes."""
    n = bits.shape[-1]
    n_words = (n + 31) // 32
    pad = n_words * 32 - n
    b = jnp.pad(bits.astype(jnp.uint32), [(0, 0)] * (bits.ndim - 1) + [(0, pad)])
    b = b.reshape(*b.shape[:-1], n_words, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def unpack_bits(packed: Array, n_bits: int) -> Array:
    """Inverse of pack_bits -> float32 {0,1} [..., n_bits]."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    b = (packed[..., None] >> shifts) & jnp.uint32(1)
    return b.reshape(*packed.shape[:-1], -1)[..., :n_bits].astype(jnp.float32)


def _encode_keypoint(nxyz, nvalid, kp, pairs, perms, g, r):
    """All variants' bits for one keypoint.
    Returns ([V, n_bits] float32 bits, [3, 3] LCS frame)."""
    R = _local_coordinate_system(nxyz, nvalid, kp, r)
    local = jnp.where(nvalid[:, None], (nxyz - kp) @ R.T, 2.0 * r)
    nw, depth = _grid_accumulate(local, nvalid, g, r)

    def one_variant(perm):  # perm: [3, g^2]
        nw_v = jnp.take_along_axis(nw, perm, axis=1)
        depth_v = jnp.take_along_axis(depth, perm, axis=1)
        return _binarize(nw_v, depth_v, pairs)

    return jax.vmap(one_variant)(perms), R


@functools.partial(jax.jit, static_argnames=("grid_side", "radius",
                                             "num_variants", "neighbor_k"))
def _extract_jit(cloud: PointCloud, kp_xyz: Array, kp_mask: Array,
                 pairs: Array, perms: Array, radius: float, grid_side: int,
                 num_variants: int, neighbor_k: int) -> Array:
    kp_cloud = PointCloud(xyz=kp_xyz, mask=kp_mask)
    # cell_cap k/2 (not k/4): the 27-cell block must retain ~3x the K cap
    # IN the support ball so the metric nearest-K selection — identical
    # under rigid motion — stays the binding filter; with a smaller cap
    # the (cell-partition-based, motion-sensitive) even thinning of
    # overflowing cells decides the neighborhood instead and descriptor
    # repeatability degrades at high density / large radius.
    nb = radius_neighbors(kp_cloud, cloud, radius=float(np.sqrt(3.0) * radius),
                          k=neighbor_k, cell_cap=max(neighbor_k // 2, 16))
    nxyz = cloud.xyz[nb.idx]                                # [S, K, 3]
    nvalid = nb.valid

    bits, frames = jax.vmap(
        lambda nx, nv, kp: _encode_keypoint(nx, nv, kp, pairs, perms,
                                            grid_side, radius)
    )(nxyz, nvalid, kp_xyz)                                  # [S, V, n_bits]
    # Invalid keypoints -> all-zero features.
    bits = jnp.where(kp_mask[:, None, None], bits, 0.0)
    return pack_bits(bits).transpose(1, 0, 2), frames        # [V, S, W]


def extract_bsc(cloud: PointCloud, keypoints: Array, kp_mask: Array,
                config: GHICPConfig, num_variants: int) -> BSCFeatures:
    """BSC features at keypoint locations over the support ``cloud``.

    ``keypoints``: either [S] int32 indices into the cloud or [S, 3] float
    positions (sub-voxel refined keypoints are off-lattice).
    ``num_variants``: 1 for the target cloud, ``config.bsc_num_variants``
    (2 or 4) for the source (bfe.hpp:603-676; ghicp_main.cpp:115-116).
    """
    if keypoints.ndim == 1:
        kp_xyz = cloud.xyz[keypoints]
    else:
        kp_xyz = keypoints
    g = config.bsc_grid_side
    pairs = jnp.asarray(sample_pattern(config.bsc_seed, g))
    perms = jnp.asarray(variant_permutations(g, num_variants))
    # Descriptor radius: the reference reuses the NMS radius
    # (ghicp_main.cpp:113), whose TLS settings are 1.0-1.5 m (run.sh:13-14).
    # When NMS runs tighter than that (we default 0.5), tying the descriptor
    # to it shrinks the grid cells (2r/7) below the keypoint localization
    # noise and the bits decorrelate — bsc_radius overrides the tie.
    radius = config.bsc_radius or float(config.non_max_radius)
    packed, frames = _extract_jit(cloud, kp_xyz, kp_mask, pairs, perms,
                                  radius=float(radius), grid_side=g,
                                  num_variants=num_variants,
                                  neighbor_k=config.bsc_neighbor_k)
    return BSCFeatures(packed=packed, mask=kp_mask,
                       n_bits=config.bsc_total_bits, frames=frames)


@functools.partial(jax.jit, static_argnames=("radius", "neighbor_k"))
def bsc_frames(cloud: PointCloud, kp_xyz: Array, kp_mask: Array,
               radius: float, neighbor_k: int = 128) -> Array:
    """Per-keypoint LCS rotation matrices ([S, 3, 3], rows = axes).

    The same weighted-PCA local frames the BSC encoder rotates
    neighborhoods into (bfe.hpp:121-155, 940-1035), exported for
    frame-based pose hypotheses: one keypoint correspondence plus its two
    frames fixes a full 6-DoF rigid transform (matching/ransac.py)."""
    kp_cloud = PointCloud(xyz=kp_xyz, mask=kp_mask)
    # cell_cap k/2 (not k/4): the 27-cell block must retain ~3x the K cap
    # IN the support ball so the metric nearest-K selection — identical
    # under rigid motion — stays the binding filter; with a smaller cap
    # the (cell-partition-based, motion-sensitive) even thinning of
    # overflowing cells decides the neighborhood instead and descriptor
    # repeatability degrades at high density / large radius.
    nb = radius_neighbors(kp_cloud, cloud, radius=float(np.sqrt(3.0) * radius),
                          k=neighbor_k, cell_cap=max(neighbor_k // 2, 16))
    return jax.vmap(
        lambda idx, nv, kp: _local_coordinate_system(cloud.xyz[idx], nv, kp,
                                                     radius)
    )(nb.idx, nb.valid, kp_xyz)
