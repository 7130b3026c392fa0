"""SPMD GH-ICP: source-keypoint rows sharded over a device mesh.

The reference is single-process (SURVEY.md §2: "Parallelism: none"); the
scale axis of GH-ICP is the n_s x n_t cost matrix (the analogue of attention
scores, SURVEY.md §5).  Here the *same engine code* (`ghicp_loop`) runs under
``jax.shard_map`` over a 1-D mesh:

  * source keypoints, masks and the FD matrix are sharded by rows —
    each device owns S/d rows of every [S, T] matrix it builds;
  * target keypoints and prices are replicated;
  * all cross-row reductions (cost statistics, auction bid resolution,
    Kabsch cross-covariance, RMSE sums, convergence flags) ride the mesh
    axis as psum/pmax/pmin collectives (ICI on a real slice) through the
    :class:`~ghicp_tpu.core.comm.Comm` object.

The auction's per-round traffic is O(T) scalars per device (column price
vector + winner ids), independent of the row count — the bidding compute
stays fully local.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ghicp_tpu.core.comm import Comm
from ghicp_tpu.core.config import GHICPConfig
from ghicp_tpu.registration.ghicp import (GHICPResult, IterationMetrics,
                                          ghicp_loop)

AXIS = "rows"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D device mesh over the first ``n_devices`` local devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


def ghicp_register_sharded(kp_s, mask_s, kp_t, mask_t, fd, bbx_magnitude,
                           config: GHICPConfig, mesh: Mesh,
                           stream=None) -> GHICPResult:
    """Row-sharded GH-ICP over ``mesh``.  kp_s/mask_s/fd row counts must be
    divisible by the mesh size (pad the keypoint bucket accordingly).

    ``stream`` (StreamFeatures, with ``fd=None``) runs the matrix-free
    lane sharded: source factor rows are sharded with the keypoints,
    target factors replicated; every device sweeps its row shard and the
    auction's price/winner resolution rides the mesh axis — no [S, T]
    block exists on any device.  (Ring-rotated target factors for
    memory-sharded targets live in ghicp_register_ring.)
    """
    S = kp_s.shape[0]
    n = mesh.devices.size
    if S % n != 0:
        raise ValueError(f"row count {S} not divisible by mesh size {n}")
    comm = Comm(axis=AXIS)

    out_specs = GHICPResult(
        transform=P(), iterations=P(), converged=P(), success=P(),
        final_rmse=P(),
        metrics=IterationMetrics(energy=P(), rmse=P(), rmse_after=P(),
                                 cor=P(), iou=P(), penalty=P(), rounds=P()),
        matches=P(AXIS))

    if stream is None:
        @jax.jit
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P(), P(), P(AXIS), P()),
            out_specs=out_specs, check_vma=False)
        def run(kp_s, mask_s, kp_t, mask_t, fd, bbx):
            return ghicp_loop(kp_s, mask_s, kp_t, mask_t, fd, bbx, config,
                              comm=comm, total_rows=S)

        return run(kp_s, mask_s, kp_t, mask_t, fd,
                   jnp.asarray(bbx_magnitude, jnp.float32))

    from ghicp_tpu.ops.stream_kernel import StreamFeatures
    stream_specs = StreamFeatures(fs=P(None, AXIS, None), ft=P(),
                                  na=P(None, AXIS), nb=P())

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(), P(), stream_specs, P()),
        out_specs=out_specs, check_vma=False)
    def run_stream(kp_s, mask_s, kp_t, mask_t, feats, bbx):
        return ghicp_loop(kp_s, mask_s, kp_t, mask_t, None, bbx, config,
                          comm=comm, total_rows=S, stream=feats)

    return run_stream(kp_s, mask_s, kp_t, mask_t, stream,
                      jnp.asarray(bbx_magnitude, jnp.float32))


def ghicp_register_ring(kp_s, mask_s, kp_t, mask_t, stream, packed_s,
                        packed_t, bbx_magnitude, config: GHICPConfig,
                        mesh: Mesh) -> GHICPResult:
    """Ring-sharded streaming GH-ICP (the SURVEY §5 dataflow): source
    factor rows sharded AND target factor blocks sharded, each sweep
    rotating the target block around the mesh axis via ``ppermute`` — the
    ring-attention analog applied to the cost field.  Only O(C) scalars
    (coordinates, popcounts, prices, masks) are replicated; the O(C*F)
    unpacked target factors live as one block per device.  BSC (hamming)
    lane; ``packed_s``/``packed_t`` are the uint32 bit words
    ([V, S, W] / [V', C, W]) kept for matched-pair selection gathers.
    """
    from ghicp_tpu.ops.stream_kernel import RingFeatures

    S = kp_s.shape[0]
    C = kp_t.shape[0]
    n = mesh.devices.size
    if S % n != 0 or C % n != 0:
        raise ValueError(f"row/col counts ({S}, {C}) not divisible by "
                         f"mesh size {n}")
    comm = Comm(axis=AXIS)
    ring = RingFeatures(fs=stream.fs, na=stream.na, ft_blk=stream.ft,
                        nb=stream.nb, words_s=packed_s,
                        words_t=packed_t[0])
    ring_specs = RingFeatures(
        fs=P(None, AXIS, None), na=P(None, AXIS), ft_blk=P(AXIS, None),
        nb=P(), words_s=P(None, AXIS, None), words_t=P())
    out_specs = GHICPResult(
        transform=P(), iterations=P(), converged=P(), success=P(),
        final_rmse=P(),
        metrics=IterationMetrics(energy=P(), rmse=P(), rmse_after=P(),
                                 cor=P(), iou=P(), penalty=P(), rounds=P()),
        matches=P(AXIS))

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(), P(), ring_specs, P()),
        out_specs=out_specs, check_vma=False)
    def run_ring(kp_s, mask_s, kp_t, mask_t, ring, bbx):
        return ghicp_loop(kp_s, mask_s, kp_t, mask_t, None, bbx, config,
                          comm=comm, total_rows=S, stream=ring)

    return run_ring(kp_s, mask_s, kp_t, mask_t, ring,
                    jnp.asarray(bbx_magnitude, jnp.float32))
