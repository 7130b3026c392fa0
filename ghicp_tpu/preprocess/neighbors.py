"""Fixed-K radius neighbor search on a voxel grid — the KD-tree replacement.

The reference leans on PCL KD-trees for every neighborhood query
(``include/pca.h:138``, ``include/binary_feature_extraction.hpp:641``,
``include/keypoint_detect.hpp:162``).  KD-trees are pointer-chasing and
serial; on TPU we instead bucket support points into grid cells of side
``radius`` (so all neighbors of a query live in its 27 surrounding cells),
sort once by cell hash, and turn every query into a fixed-shape gather:

  1. hash support points by cell, argsort by (hash, index);
  2. per query x 27 neighbor cells: ``searchsorted`` start/end in the sorted
     hash array, take up to ``cell_cap`` candidates per cell;
  3. mask candidates by true squared distance <= radius^2, keep the K nearest
     via ``top_k``.

Everything is static-shape; truncation (cell_cap / K) is the documented
approximation knob (SURVEY.md §7 hard part 2).  Hash collisions only inject
far-away candidates which the exact distance test then rejects.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ghicp_tpu.core.types import PointCloud

Array = jax.Array

_P1, _P2, _P3 = 73856093, 19349663, 83492791

# Hash deltas of the 27 neighbor cells.  The cell hash is linear in the cell
# coordinates, so hash(c + off) = hash(c) + hash(off): queries only ever
# build [B] and [B, 27] tensors.  (Materializing [B, 27, 3] int32
# intermediates triggers a pathological multi-minute XLA:TPU compile on the
# axon backend — keep integer tensors 2-D with large minor dims.)
_OFFSET_HASHES = np.array(
    [dx * _P1 + dy * _P2 + dz * _P3
     for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    dtype=np.int32)  # [27]


class NeighborList(NamedTuple):
    """K-capped neighborhood: indices into the support cloud + validity."""

    idx: Array     # [Nq, K] int32 indices into support
    valid: Array   # [Nq, K] bool
    dist2: Array   # [Nq, K] float32 squared distances (inf where invalid)

    @property
    def count(self) -> Array:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


class HashGrid(NamedTuple):
    """Support cloud sorted by cell hash, ready for repeated queries."""

    sorted_keys: Array  # [N] int32 cell hashes, ascending
    order: Array        # [N] int32 permutation into the original support
    xyz: Array          # [N, 3] support coordinates (original order)
    mask: Array         # [N] support validity (original order)
    min_xyz: Array      # [3] grid origin
    cell: float         # cell side length


def _point_hash(xyz: Array, min_xyz: Array, cell: float) -> Array:
    """[N] int32 cell hash per point, built from 1-D column vectors only."""
    inv = 1.0 / cell
    hx = jnp.floor((xyz[:, 0] - min_xyz[0]) * inv).astype(jnp.int32) * _P1
    hy = jnp.floor((xyz[:, 1] - min_xyz[1]) * inv).astype(jnp.int32) * _P2
    hz = jnp.floor((xyz[:, 2] - min_xyz[2]) * inv).astype(jnp.int32) * _P3
    return hx + hy + hz


def build_grid(support: PointCloud, cell: float) -> HashGrid:
    mn = jnp.min(jnp.where(support.mask[:, None], support.xyz, 3e38), axis=0)
    keys = _point_hash(support.xyz, mn, cell)
    keys = jnp.where(support.mask, keys, jnp.int32(2**31 - 1))
    order = jnp.argsort(keys).astype(jnp.int32)
    return HashGrid(sorted_keys=keys[order], order=order, xyz=support.xyz,
                    mask=support.mask, min_xyz=mn, cell=cell)


class CellTable(NamedTuple):
    """Cell-padded support layout: one [cap, 3] coordinate block per occupied
    grid cell, cells ordered by ascending hash.

    The point of this layout (vs the slot-window gather of
    :func:`_candidate_window`) is gather *row* economy: XLA:TPU gathers run at
    a fixed rate per **row** regardless of row width (measured ~60M rows/s on
    the axon backend), so fetching a query's 27 neighbor cells as 27 rows of
    ``[cap, 3]`` is ~``cap``x cheaper than fetching ``27 * cap`` scalar-row
    candidates.  This is the TPU replacement for the reference's per-point
    KD-tree radius queries in PCA (pca.h:138,151-157).
    """

    hashes: Array   # [C] int32 ascending cell hashes; INT_MAX padding
    xyz: Array      # [C, cap, 3] cell-resident coordinates (zeros padding)
    idx: Array      # [C, cap] int32 original support indices (0 padding)
    cnt: Array      # [C] int32 resident count per cell (clipped to cap)
    min_xyz: Array  # [3] grid origin
    cell: float     # cell side length


def build_cell_table(support: PointCloud, cell: float, max_cells: int,
                     cap: int) -> CellTable:
    """Sort by cell hash, then scatter each point to (cell slot, rank) lanes.

    ``max_cells`` must cover the number of occupied cells; overflowing cells
    (or per-cell residents beyond ``cap``) are dropped from candidate sets —
    the same truncation knob as ``cell_cap`` in the slot-window path.
    """
    imax = jnp.int32(2**31 - 1)
    mn = jnp.min(jnp.where(support.mask[:, None], support.xyz, 3e38), axis=0)
    keys = _point_hash(support.xyz, mn, cell)
    keys = jnp.where(support.mask, keys, imax)
    order = jnp.argsort(keys).astype(jnp.int32)
    sk = keys[order]                                   # [N] ascending
    n = sk.shape[0]
    ar = jnp.arange(n, dtype=jnp.int32)
    heads = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    cell_id = jnp.cumsum(heads.astype(jnp.int32)) - 1  # [N] ascending
    run_start = jax.lax.cummax(jnp.where(heads, ar, 0))
    rank = ar - run_start
    # Residents beyond ``cap`` must be dropped UNIFORMLY, not head-first:
    # the sort is spatially ordered (equal-key runs keep voxel-key order),
    # so keeping ranks [0, cap) of an overflowing cell keeps a spatially
    # CONTIGUOUS corner — a systematic neighborhood bias that guts
    # density-statistic descriptors at large support radii (measured:
    # BSC at the NMS-1.0 bench config, where 1.73 m cells hold ~5x the
    # cap, lost its candidate precision entirely).  A per-cell stride
    # ceil(len/cap) keeps an evenly-spaced subset instead; cells within
    # ``cap`` are untouched (stride 1 = exact).
    # Run length per point, scan-only (no gathers): the NEXT run's start is
    # the reversed cummin over "index+1 where a new run begins there".
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(jnp.where(
        jnp.concatenate([heads[1:], jnp.ones((1,), bool)]), ar + 1, n))))
    run_len = jnp.maximum(nxt - run_start, 1)
    # Exact even selection of min(len, cap) residents: keep rank r iff
    # floor((r+1)*cap/len) > floor(r*cap/len); kept slot = floor(r*cap/len)
    # (contiguous by construction when len > cap).
    over = run_len > cap
    keep = (~over) | (((rank + 1) * cap) // run_len
                      > (rank * cap) // run_len)
    rank_k = jnp.where(over, (rank * cap) // run_len, rank)
    valid = sk != imax
    in_table = valid & (cell_id < max_cells)
    slot = jnp.where(in_table & keep & (rank_k < cap),
                     cell_id * cap + rank_k, max_cells * cap)
    flat = jnp.zeros((max_cells * cap + 1, 3), jnp.float32)
    flat = flat.at[slot].set(support.xyz[order], mode="drop")
    flat_idx = jnp.zeros((max_cells * cap + 1,), jnp.int32)
    flat_idx = flat_idx.at[slot].set(order, mode="drop")
    head_slot = jnp.where(heads & in_table, cell_id, max_cells)
    hashes = jnp.full((max_cells + 1,), imax, jnp.int32)
    hashes = hashes.at[head_slot].set(sk, mode="drop")
    cnt = jnp.zeros((max_cells + 1,), jnp.int32)
    cnt = cnt.at[jnp.where(in_table & keep & (rank_k < cap), cell_id,
                           max_cells)].add(1, mode="drop")
    return CellTable(hashes=hashes[:max_cells],
                     xyz=flat[:-1].reshape(max_cells, cap, 3),
                     idx=flat_idx[:-1].reshape(max_cells, cap),
                     cnt=jnp.minimum(cnt[:max_cells], cap),
                     min_xyz=mn, cell=cell)


# Coarse stride for the two-level cell lookup (see _lookup_cells).
_LOOKUP_G = 128


def _lookup_cells(table: CellTable, nh: Array) -> Array:
    """Positions of cell hashes ``nh`` in the sorted table, WITHOUT binary
    search.

    ``jnp.searchsorted`` lowers to ~17 dependent gather steps on XLA:TPU;
    at the measured ~60M gather rows/s ceiling the lookup dominated the
    whole PCA stage (15 of 21 ms per 4096-query chunk).  Two-level scheme:

      1. coarse: compare against every ``G``-th hash (one broadcast
         compare-sum, pure VPU) -> bucket index;
      2. fine: gather ONE [G] row per query from the [M/G, G]-reshaped
         hash array and count entries < nh inside it (one block-row gather
         + one compare-sum).

    Returns the same ``side='left'`` insertion positions as searchsorted
    for present keys (callers verify presence with an equality check).
    """
    M = table.hashes.shape[0]
    G = _LOOKUP_G
    pad = (-M) % G
    hp = jnp.pad(table.hashes, (0, pad), constant_values=jnp.int32(2**31 - 1))
    coarse = hp[::G]                                     # [M/G]
    shape = nh.shape
    q = nh.reshape(-1)                                   # [Q]
    bucket = jnp.sum((coarse[None, :] <= q[:, None]).astype(jnp.int32),
                     axis=1) - 1                         # [Q], >= -1
    bucket = jnp.maximum(bucket, 0)
    rows = hp.reshape(-1, G)[bucket]                     # [Q, G] one row each
    off = jnp.sum((rows < q[:, None]).astype(jnp.int32), axis=1)
    return (bucket * G + off).reshape(shape)


def cell_candidates(table: CellTable, qxyz: Array, qmask: Array):
    """In-radius candidate coordinates per query from the 27 neighbor cells.

    Returns (cxyz [B, 27*cap, 3], ok [B, 27*cap]); ``ok`` covers cell
    existence and lane residency but NOT the radius test (callers apply it on
    their own distance computation).  The only large gather is [B, 27] rows
    of [cap, 3] blocks.
    """
    cap = table.xyz.shape[1]
    qh = _point_hash(qxyz, table.min_xyz, table.cell)
    nh = qh[:, None] + jnp.asarray(_OFFSET_HASHES)[None, :]       # [B, 27]
    cid = jnp.minimum(_lookup_cells(table, nh),
                      table.hashes.shape[0] - 1).astype(jnp.int32)
    exists = table.hashes[cid] == nh                              # [B, 27]
    cxyz = table.xyz[cid]                                         # [B,27,cap,3]
    lane = jnp.arange(cap, dtype=jnp.int32)
    ok = exists[:, :, None] & (lane[None, None, :] < table.cnt[cid][:, :, None])
    ok &= qmask[:, None, None]
    b = qxyz.shape[0]
    return cxyz.reshape(b, 27 * cap, 3), ok.reshape(b, 27 * cap)


def _candidate_window(grid: HashGrid, qxyz: Array, qmask: Array,
                      radius: float, cell_cap: int):
    """All in-radius candidates per query: (cand [B, 27*cell_cap] indices,
    ok [B, 27*cell_cap] validity).  Built 2-D throughout."""
    qh = _point_hash(qxyz, grid.min_xyz, grid.cell)
    hashes = qh[:, None] + jnp.asarray(_OFFSET_HASHES)[None, :]   # [B, 27]
    start = jnp.searchsorted(grid.sorted_keys, hashes, side="left")
    end = jnp.searchsorted(grid.sorted_keys, hashes, side="right")
    start_r = jnp.repeat(start, cell_cap, axis=1)        # [B, C]
    end_r = jnp.repeat(end, cell_cap, axis=1)
    lane = jnp.tile(jnp.arange(cell_cap, dtype=jnp.int32), 27)[None, :]
    slots = start_r + lane
    in_cell = slots < end_r
    slots = jnp.clip(slots, 0, grid.sorted_keys.shape[0] - 1)
    cand = grid.order[slots]                             # [B, C]
    cxyz = grid.xyz[cand]
    d2 = jnp.sum((cxyz - qxyz[:, None, :]) ** 2, axis=-1)
    ok = (in_cell & grid.mask[cand] & (d2 <= radius * radius)
          & qmask[:, None])
    return cand, ok


def _query_block(grid: HashGrid, qxyz: Array, qmask: Array, radius: float,
                 k: int, cell_cap: int, exclude_self_idx: Optional[Array]):
    """K-nearest in-radius neighbors for one block of queries. qxyz: [B,3]."""
    cand, ok = _candidate_window(grid, qxyz, qmask, radius, cell_cap)
    cxyz = grid.xyz[cand]                                # [B, C, 3]
    d2 = jnp.sum((cxyz - qxyz[:, None, :]) ** 2, axis=-1)
    if exclude_self_idx is not None:
        ok &= cand != exclude_self_idx[:, None]
    d2 = jnp.where(ok, d2, jnp.float32(jnp.inf))
    # K nearest among candidates.
    neg, sel = jax.lax.top_k(-d2, k)                     # [B, K]
    idx = jnp.take_along_axis(cand, sel, axis=1)
    valid = jnp.take_along_axis(ok, sel, axis=1)
    return NeighborList(idx=idx, valid=valid, dist2=-neg)


def _query_block_ct(table: CellTable, qxyz: Array, qmask: Array,
                    radius: float, k: int,
                    exclude_self_idx: Optional[Array]) -> NeighborList:
    """K-nearest in-radius neighbors for one query block via the cell table.

    The only large gathers are [B, 27] rows of [cap, 3] / [cap] blocks —
    ~cap x fewer gather rows than the slot-window formulation (gathers cost
    per row on XLA:TPU; see :class:`CellTable`).
    """
    cap = table.xyz.shape[1]
    b = qxyz.shape[0]
    qh = _point_hash(qxyz, table.min_xyz, table.cell)
    nh = qh[:, None] + jnp.asarray(_OFFSET_HASHES)[None, :]       # [B, 27]
    cid = jnp.minimum(_lookup_cells(table, nh),
                      table.hashes.shape[0] - 1).astype(jnp.int32)
    exists = table.hashes[cid] == nh
    cxyz = table.xyz[cid].reshape(b, 27 * cap, 3)
    cidx = table.idx[cid].reshape(b, 27 * cap)
    lane = jnp.arange(cap, dtype=jnp.int32)
    ok = (exists[:, :, None]
          & (lane[None, None, :] < table.cnt[cid][:, :, None]))
    ok = ok.reshape(b, 27 * cap) & qmask[:, None]
    d2 = jnp.sum((cxyz - qxyz[:, None, :]) ** 2, axis=-1)
    ok &= d2 <= radius * radius
    if exclude_self_idx is not None:
        ok &= cidx != exclude_self_idx[:, None]
    d2 = jnp.where(ok, d2, jnp.float32(jnp.inf))
    neg, sel = jax.lax.top_k(-d2, k)                              # [B, K]
    idx = jnp.take_along_axis(cidx, sel, axis=1)
    valid = jnp.take_along_axis(ok, sel, axis=1)
    return NeighborList(idx=idx, valid=valid, dist2=-neg)


@functools.partial(jax.jit, static_argnames=("radius", "k", "cell_cap",
                                             "chunk", "include_self",
                                             "max_cells"))
def radius_neighbors(query: PointCloud, support: PointCloud, radius: float,
                     k: int = 64, cell_cap: int = 16, chunk: int = 4096,
                     include_self: bool = True,
                     max_cells: int = 0) -> NeighborList:
    """K-capped fixed-radius neighbors of each query point in the support.

    Mirrors ``tree.radiusSearch(pt, radius, ...)`` semantics with a K cap,
    computed through the cell table (block-row gathers).  ``max_cells`` (0 =
    support capacity, which can never overflow) bounds the table;
    ``include_self=False`` drops exact index matches (for self-neighborhoods
    where the caller wants strict neighbors).
    """
    if max_cells <= 0:
        max_cells = support.capacity
    table = build_cell_table(support, cell=radius, max_cells=max_cells,
                             cap=cell_cap)
    n = query.capacity
    pad = (-n) % chunk
    qxyz = jnp.pad(query.xyz, ((0, pad), (0, 0)))
    qmask = jnp.pad(query.mask, (0, pad))
    self_idx = None
    if not include_self:
        self_idx = jnp.pad(jnp.arange(n, dtype=jnp.int32), (0, pad),
                           constant_values=-1)
    qxyz = qxyz.reshape(-1, chunk, 3)
    qmask = qmask.reshape(-1, chunk)
    if self_idx is not None:
        self_idx = self_idx.reshape(-1, chunk)

        def body(args):
            x, m, s = args
            return _query_block_ct(table, x, m, radius, k, s)
        out = jax.lax.map(body, (qxyz, qmask, self_idx))
    else:
        def body(args):
            x, m = args
            return _query_block_ct(table, x, m, radius, k, None)
        out = jax.lax.map(body, (qxyz, qmask))
    return NeighborList(idx=out.idx.reshape(-1, k)[:n],
                        valid=out.valid.reshape(-1, k)[:n],
                        dist2=out.dist2.reshape(-1, k)[:n])
