"""Multi-host orchestration: jax.distributed wiring + pair-parallel graphs.

The reference is one process on one CPU (SURVEY.md §2: "Parallelism: none").
The TPU framework scales along two orthogonal axes (SURVEY.md §5
"Distributed communication backend"):

* **within a pair** — source-keypoint rows sharded over the mesh
  (:mod:`ghicp_tpu.shard.spmd`); collectives ride ICI inside a slice and DCN
  across hosts once ``jax.distributed`` is initialized;
* **across pairs** — a station graph's pair list partitioned over hosts
  (this module): every process preprocesses only the stations its pairs
  touch, runs the jitted engine on its local pair subset, and the final
  per-pair transforms are exchanged with one
  ``multihost_utils.process_allgather`` at the end (a few hundred bytes per
  pair — the only cross-host traffic on this axis).

Both axes are driven by the same engine code; single-process runs take the
identical code path with ``process_count() == 1``.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ghicp_tpu.core.config import GHICPConfig


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialize ``jax.distributed`` from args or environment; idempotent.

    Environment fallbacks (the usual TPU pod / GKE conventions):
    ``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``.
    A single-process run (no coordinator configured) is a silent no-op.
    Returns the process count.
    """
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator:
        num_processes = num_processes or int(
            os.environ.get("JAX_NUM_PROCESSES", "1"))
        process_id = process_id if process_id is not None else int(
            os.environ.get("JAX_PROCESS_ID", "0"))
        try:
            jax.distributed.initialize(coordinator_address=coordinator,
                                       num_processes=num_processes,
                                       process_id=process_id)
        except RuntimeError as e:
            # Tolerate only re-initialization; anything else (bind failure,
            # rendezvous timeout) must surface, not silently degrade to a
            # single-process run.
            if "already initialized" not in str(e).lower():
                raise
    return jax.process_count()


def partition_pairs(pairs: Sequence[Tuple[int, int]], process_id: int,
                    process_count: int) -> List[Tuple[int, int]]:
    """Round-robin pair partition — static, deterministic, load-balanced for
    homogeneous pair sizes (keypoint buckets share one capacity)."""
    return [p for i, p in enumerate(pairs) if i % process_count == process_id]


def register_graph_distributed(clouds: Sequence[np.ndarray],
                               pairs: Sequence[Tuple[int, int]],
                               config: GHICPConfig,
                               keypoint_capacity: Optional[int] = None):
    """Station-graph registration with pairs partitioned across processes.

    Every process returns the full result: (per-pair transforms [P, 4, 4] in
    input pair order, global station poses).  Pose chaining (the
    maximum-quality spanning tree, :func:`_poses_from_mst`) runs redundantly
    on every host from the gathered transforms — cheaper than coordinating,
    and deterministic.
    """
    import jax
    import jax.numpy as jnp

    from ghicp_tpu.registration.graph import build_station, register_graph

    pc, pid = jax.process_count(), jax.process_index()
    if pc == 1:
        results, poses = register_graph(clouds, pairs, config,
                                        keypoint_capacity)
        tfs = np.stack([r.transform for r in results]) if results else \
            np.zeros((0, 4, 4), np.float32)
        quals = np.array([r.quality for r in results], np.float32)
        return tfs, quals, poses

    from jax.experimental import multihost_utils

    cap = keypoint_capacity or config.keypoint_capacity or 2048
    mine = [(i, p) for i, p in enumerate(pairs) if i % pc == pid]
    needed = sorted({s for _, (s, t) in mine for s in (s, t)})
    stations = {i: build_station(clouds[i], i, config, cap) for i in needed}

    from ghicp_tpu.registration.ghicp import ghicp_register
    from ghicp_tpu.registration.graph import (_coarse_init_pair,
                                              station_pair_fd)

    # Dense [P, 4, 4] / [P] buffers; each process fills its slots, the
    # all-gather max-reduces them together (empty slots stay zero).
    P_n = len(pairs)
    tfs = np.zeros((P_n, 4, 4), np.float32)
    quals = np.zeros((P_n,), np.float32)
    for gi, (si, ti) in mine:
        s, t = stations[si], stations[ti]
        fd = station_pair_fd(s, t, config)
        T0, it_shift = _coarse_init_pair(s, t, fd, config)
        res = ghicp_register(s.kp_xyz, s.kp_mask, t.kp_xyz, t.kp_mask, fd,
                             jnp.float32(s.bbx_magnitude), config,
                             init_transform=T0, it_shift=it_shift)
        tfs[gi] = np.asarray(res.transform)
        it = max(int(res.iterations) - 1, 0)
        quals[gi] = float(np.asarray(res.metrics.iou)[it])

    gathered_t = multihost_utils.process_allgather(jnp.asarray(tfs))
    gathered_q = multihost_utils.process_allgather(jnp.asarray(quals))
    tfs = np.asarray(jnp.sum(gathered_t, axis=0))
    quals = np.asarray(jnp.sum(gathered_q, axis=0))
    poses = _poses_from_mst_static(len(clouds), list(pairs), tfs, quals)
    return tfs, quals, poses


def _poses_from_mst_static(n: int, pairs: List[Tuple[int, int]],
                           tfs: np.ndarray, quals: np.ndarray):
    """MST pose chaining from flat (pairs, transforms, qualities) arrays —
    the gathered-representation twin of ``graph._poses_from_mst``."""
    import heapq

    edges = {i: [] for i in range(n)}
    for (s, t), T, q in zip(pairs, tfs, quals):
        edges[s].append((float(q), t, np.linalg.inv(T)))
        edges[t].append((float(q), s, T))
    poses: List[Optional[np.ndarray]] = [None] * n
    poses[0] = np.eye(4, dtype=np.float32)
    visited = {0}
    heap = [(-q, 0, nbr, T) for (q, nbr, T) in edges[0]]
    heapq.heapify(heap)
    while heap and len(visited) < n:
        negq, frm, to, T_to_frm = heapq.heappop(heap)
        if to in visited:
            continue
        poses[to] = (poses[frm] @ T_to_frm).astype(np.float32)
        visited.add(to)
        for (q, nbr, T) in edges[to]:
            if nbr not in visited:
                heapq.heappush(heap, (-q, to, nbr, T))
    for i in range(n):
        if poses[i] is None:
            poses[i] = np.eye(4, dtype=np.float32)
    return poses
