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
from ghicp_tpu.preprocess.neighbors import (_OFFSET_HASHES, CellTable,
                                            NeighborList, _lookup_cells,
                                            build_cell_table, cell_candidates)

Array = jax.Array

_HI = jax.lax.Precision.HIGHEST


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


def _outer6(d: Array) -> Array:
    """Unique second-moment products (xx, yy, zz, xy, xz, yz) of [..., 3]."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    return jnp.stack([x * x, y * y, z * z, x * y, x * z, y * z], axis=-1)


def _cov_from6(s2: Array) -> Array:
    """[..., 6] unique moments -> [..., 3, 3] symmetric matrix."""
    xx, yy, zz, xy, xz, yz = (s2[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


@functools.partial(jax.jit, static_argnames=("radius", "n_chunks", "chunk",
                                             "capacity"))
def _pca_cell_pair(table: CellTable, radius: float, chunk: int,
                   n_chunks: int, capacity: int):
    """Cell-pair PCA: one pass over occupied cells, queries = cell residents.

    Gather economy beats even the per-query cell-table path: the 27
    neighbor-block rows are fetched once per CELL, not once per QUERY
    (~``cap``x fewer gather rows), and the moment accumulation is one masked
    [cap, 27*cap] @ [27*cap, 10] matmul per cell (MXU).  Numerics: all
    coordinates are centered at the cell's resident mean before any product,
    so the E[ddT] - mu muT subtraction happens on O(radius) magnitudes.

    The occupied cells form a prefix of the (hash-sorted) table; callers pass
    ``n_chunks`` covering that prefix.  Returns per-slot features plus the
    original point index per slot for scattering, shapes [P, cap, ...] with
    P = n_chunks * chunk.
    """
    cap = table.xyz.shape[1]
    P = n_chunks * chunk
    M = table.hashes.shape[0]
    if P > M:
        # Pad the cell axis so dynamic_slice never clamps (clamped slices
        # would re-read earlier cells and double-scatter their points).
        ext = P - M
        table = CellTable(
            hashes=jnp.pad(table.hashes, (0, ext),
                           constant_values=jnp.int32(2**31 - 1)),
            xyz=jnp.pad(table.xyz, ((0, ext), (0, 0), (0, 0))),
            idx=jnp.pad(table.idx, ((0, ext), (0, 0))),
            cnt=jnp.pad(table.cnt, (0, ext)),
            min_xyz=table.min_xyz, cell=table.cell)
    r2 = jnp.float32(radius * radius)
    offs = jnp.asarray(_OFFSET_HASHES)

    def body(i):
        sl = i * chunk
        hashes = jax.lax.dynamic_slice_in_dim(table.hashes, sl, chunk)
        qxyz = jax.lax.dynamic_slice_in_dim(table.xyz, sl, chunk)   # [B,cap,3]
        qcnt = jax.lax.dynamic_slice_in_dim(table.cnt, sl, chunk)   # [B]
        lane = jnp.arange(cap, dtype=jnp.int32)
        qok = lane[None, :] < qcnt[:, None]                         # [B,cap]
        nh = hashes[:, None] + offs[None, :]                        # [B,27]
        cid = jnp.minimum(_lookup_cells(table, nh),
                          table.hashes.shape[0] - 1).astype(jnp.int32)
        exists = table.hashes[cid] == nh                            # [B,27]
        cand = table.xyz[cid]                                       # [B,27,cap,3]
        ccnt = table.cnt[cid]                                       # [B,27]
        cok = exists[:, :, None] & (lane[None, None, :] < ccnt[:, :, None])
        b = chunk
        cand = cand.reshape(b, 27 * cap, 3)
        cok = cok.reshape(b, 27 * cap)
        qokf = qok.astype(jnp.float32)
        center = (jnp.sum(qxyz * qokf[..., None], axis=1)
                  / jnp.maximum(jnp.sum(qokf, axis=1), 1.0)[:, None])
        q = (qxyz - center[:, None, :]) * qokf[..., None]
        c = jnp.where(cok[..., None], cand - center[:, None, :], 0.0)
        q2 = jnp.sum(q * q, axis=-1)                                # [B,cap]
        c2 = jnp.sum(c * c, axis=-1)                                # [B,27cap]
        qc = jnp.einsum("bqi,bci->bqc", q, c, precision=_HI)
        d2 = q2[:, :, None] + c2[:, None, :] - 2.0 * qc
        w = (cok[:, None, :] & (d2 <= r2)).astype(jnp.float32)      # [B,cap,27cap]
        feats = jnp.concatenate(
            [c, _outer6(c), jnp.where(cok, 1.0, 0.0)[..., None]], axis=-1)
        m = jnp.einsum("bqc,bcf->bqf", w, feats, precision=_HI)     # [B,cap,10]
        idx = jax.lax.dynamic_slice_in_dim(table.idx, sl, chunk)    # [B,cap]
        return m, idx, qok

    # Scatter the RAW 10 moments to original point order FIRST, then run
    # the eigendecomposition on the compact [capacity] point set.  The cell
    # slot axis is ~2.5x the live point count (cap-padded cells), and
    # eigh3 + the [slots, 3, 3] eigenvector relayouts + scatters on the
    # slot axis were the module's dominant cost (measured ~80 of 156ms at
    # 665k slots / 262k points).  The moments are cell-mean-centered, but
    # cov = E[ccT] - mu muT is translation-invariant, so assembling cov
    # after the scatter is exact.
    m, idx, resident = jax.lax.map(body, jnp.arange(n_chunks))
    m = m.reshape(P * cap, 10)
    idx = idx.reshape(P * cap)
    resident = resident.reshape(P * cap)
    n = capacity
    tgt = jnp.where(resident, idx, n)

    def scat(x, fill=0.0):
        base = jnp.full((n + 1,) + x.shape[1:], fill, x.dtype)
        return base.at[tgt].set(x, mode="drop")[:n]

    m_p = scat(m)                                              # [n, 10]
    valid_p = scat(resident)
    cnt = jnp.maximum(m_p[:, 9], 1.0)
    s1 = m_p[:, 0:3] / cnt[:, None]
    s2 = m_p[:, 3:9] / cnt[:, None]
    cov = _cov_from6(s2) - s1[:, :, None] * s1[:, None, :]
    vals, vecs = eigh3(cov)
    vals = jnp.maximum(vals, 0.0)
    total = jnp.sum(vals, axis=-1)
    curvature = jnp.where(total > 0, vals[:, 2] / jnp.maximum(total, 1e-30),
                          0.0)
    return PCAFeatures(
        eigvals=vals, principal=vecs[:, :, 0],
        normal=vecs[:, :, 2], curvature=curvature,
        n_neighbors=m_p[:, 9].astype(jnp.int32),
        valid=valid_p & (m_p[:, 9] >= 3))


@functools.partial(jax.jit, static_argnames=("radius", "chunk"))
def _pca_query_subset(table: CellTable, qxyz: Array, qmask: Array,
                      radius: float, chunk: int) -> PCAFeatures:
    """Per-query cell-table PCA over an explicit (small) query set."""
    nq = qxyz.shape[0]
    pad = (-nq) % chunk
    qx = jnp.pad(qxyz, ((0, pad), (0, 0)))
    qm = jnp.pad(qmask, (0, pad))

    def body(args):
        x, m = args
        return _pca_cell_block(table, x, m, radius)

    out = jax.lax.map(body, (qx.reshape(-1, chunk, 3),
                             qm.reshape(-1, chunk)))
    return PCAFeatures(*(v.reshape((-1,) + v.shape[2:])[:nq] for v in out))


def pca_begin(cloud: PointCloud, radius: float, cell_cap: int = 64,
              max_cells: int = 0):
    """Stage 1 of the cell-pair PCA: build the cell table and dispatch the
    occupied-cell count.  Returns ``(table, n_cells_dev)`` with the count
    still on device — callers driving several clouds fetch all counts in
    ONE paired ``device_get`` instead of one blocking round trip each
    (remote-transport round trips cost ~26 ms regardless of payload)."""
    if max_cells <= 0:
        max_cells = cloud.capacity
    table = build_cell_table(cloud, cell=radius, max_cells=max_cells,
                             cap=cell_cap)
    n_cells_dev = jnp.sum(
        (table.hashes != jnp.int32(2**31 - 1)).astype(jnp.int32))
    return table, n_cells_dev


def pca_dispatch(cloud: PointCloud, table: CellTable, n_cells: int,
                 radius: float, max_cells: int = 0):
    """Stage 2: launch the cell-pair sweep (``n_cells`` is the fetched
    occupied-cell count).  Returns ``(feats, spill_mask, n_spill_dev)``
    with the spill count still on device (same pairing rationale)."""
    if max_cells <= 0:
        max_cells = cloud.capacity
    n = cloud.capacity
    cell_chunk = 256
    n_chunks = max((min(n_cells, max_cells) + cell_chunk - 1) // cell_chunk, 1)
    # Round the chunk count up to 1/8-granular powers of two: n_chunks is
    # a STATIC argument, so every distinct occupied-cell count would
    # otherwise compile a fresh ~10s executable (source vs target, scene
    # vs scene).  Extra chunks scan sentinel-hash table slots (masked
    # work, <= 12.5% waste); clamp to the table's own slot count.
    if n_chunks > 8:
        g = 1 << max(n_chunks.bit_length() - 4, 0)
        n_chunks = -(-n_chunks // g) * g
    n_chunks = min(n_chunks, max((max_cells + cell_chunk - 1) // cell_chunk,
                                 1))
    feats = _pca_cell_pair(table, radius, cell_chunk, n_chunks, n)
    # Spill: valid points not resident in the table (rank >= cap or cell
    # beyond max_cells).  Rare at sane caps.
    in_table = feats.n_neighbors > 0  # residents always count themselves
    spill = cloud.mask & ~in_table
    return feats, spill, jnp.sum(spill.astype(jnp.int32))


def pca_finalize(cloud: PointCloud, table: CellTable, feats: PCAFeatures,
                 spill: Array, n_spill: int, radius: float) -> PCAFeatures:
    """Stage 3: per-query fallback for spilled points (``n_spill`` is the
    fetched count; 0 in the common case = no work, no dispatch)."""
    if n_spill == 0:
        return feats
    from ghicp_tpu.core.types import bucket_size
    cap_s = bucket_size(n_spill, min_size=256)
    sel = jnp.argsort(~spill)[:cap_s]
    smask = spill[sel]
    sp = _pca_query_subset(table, cloud.xyz[sel], smask, radius,
                           chunk=min(1024, cap_s))
    def merge(base, upd):
        u = jnp.where(smask.reshape(smask.shape + (1,) * (upd.ndim - 1)),
                      upd, base[sel])
        return base.at[sel].set(u)
    return PCAFeatures(
        eigvals=merge(feats.eigvals, sp.eigvals),
        principal=merge(feats.principal, sp.principal),
        normal=merge(feats.normal, sp.normal),
        curvature=merge(feats.curvature, sp.curvature),
        n_neighbors=merge(feats.n_neighbors, sp.n_neighbors),
        valid=merge(feats.valid, sp.valid))


def pca_features_pair(cloud_a: PointCloud, cloud_b: PointCloud,
                      radius: float, cell_cap: int = 64,
                      max_cells: int = 0):
    """Cell-pair PCA for TWO clouds with paired host syncs: both tables
    build (and both sweeps run) back to back, and each of the two scalar
    syncs fetches both clouds' counts in one ``device_get`` — the
    pipeline's source/target PCA pays 2 round trips instead of 4, and the
    device work of one cloud overlaps the other's dispatch latency."""
    ta, na_dev = pca_begin(cloud_a, radius, cell_cap, max_cells)
    tb, nb_dev = pca_begin(cloud_b, radius, cell_cap, max_cells)
    na, nb = (int(x) for x in jax.device_get((na_dev, nb_dev)))
    # SHARED occupied-cell count: source/target landing in different chunk
    # buckets otherwise compile the ~25s cell-pair sweep executable TWICE
    # on a fresh cache (the sweep masks unoccupied cells, so the larger
    # count is correct for both clouds).
    n_shared = max(na, nb)
    fa, spa, nsa_dev = pca_dispatch(cloud_a, ta, n_shared, radius, max_cells)
    fb, spb, nsb_dev = pca_dispatch(cloud_b, tb, n_shared, radius, max_cells)
    nsa, nsb = (int(x) for x in jax.device_get((nsa_dev, nsb_dev)))
    return (pca_finalize(cloud_a, ta, fa, spa, nsa, radius),
            pca_finalize(cloud_b, tb, fb, spb, nsb, radius))


def pca_features(cloud: PointCloud, radius: float, k: int = 128,
                 cell_cap: int = 64, chunk: int = 4096,
                 max_cells: int = 0, cell_pair: bool = True) -> PCAFeatures:
    """Per-point PCA features over a fixed-radius (cap-truncated) neighborhood.

    Default path: cell-pair sweep over occupied cells (see
    :func:`_pca_cell_pair`), with residents that overflowed ``cell_cap`` (or
    ``max_cells``) — i.e. points absent from the table — handled by the
    per-query fallback so every valid point still gets features, exactly as
    the reference computes PCA for every point (pca.h:133-165).  Neighbor
    truncation semantics (``cell_cap``/``max_cells``) are identical in both
    paths.
    """
    if not cell_pair:
        return _pca_features_query(cloud, radius=radius, k=k,
                                   cell_cap=cell_cap, chunk=chunk,
                                   max_cells=max_cells)
    table, n_cells_dev = pca_begin(cloud, radius, cell_cap, max_cells)
    feats, spill, n_spill_dev = pca_dispatch(
        cloud, table, int(n_cells_dev), radius, max_cells)
    return pca_finalize(cloud, table, feats, spill, int(n_spill_dev),
                        radius)


@functools.partial(jax.jit, static_argnames=("radius", "k", "cell_cap",
                                             "chunk", "max_cells"))
def _pca_features_query(cloud: PointCloud, radius: float, k: int = 128,
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
