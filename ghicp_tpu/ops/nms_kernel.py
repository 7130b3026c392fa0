"""Whole-fixed-point NMS kernel: every suppression round in ONE Pallas launch.

The XLA NMS path (ghicp_tpu/preprocess/keypoints.py) precomputes K-capped
radius neighbor lists and then, per round, gathers the alive/wins masks over
the [N, K] lists — ~50M gather rows per round at TLS candidate counts
(~0.2s/round on the 60M rows/s gather ceiling, 7+ rounds).  This kernel
replaces the gathers with tiled distance tests: candidate coordinates,
curvatures and the alive/wins/selected masks (~2MB at 64k candidates) live in
VMEM scratch for the whole fixed point, each round is two tiled sweeps over
the pair space with the MXU carrying the distance cross terms, and the round
loop early-exits the moment no candidate is undecided.  No neighbor lists,
no K cap — the suppression radius is *exact*, which is more faithful to the
reference's KD-tree ``nonMaximaSuppression`` (keypoint_detect.hpp:149-191)
than the capped gather path.

Spatial tile pruning: candidates are Morton-sorted before the launch, each
tile's bounding box is computed, and a per-row-tile list of column tiles
whose bbox is within ``radius`` is handed to the kernel (SMEM).  Tiles
farther apart than the radius provably cannot interact, so each row sweeps
only its O(1) spatial neighbors instead of all N/ts tiles — at TLS candidate
counts (~48k in a 64k bucket, 256 tiles) this removes ~95% of the tile-pair
work.  Tie-breaking stays on the ORIGINAL candidate index (carried through
the sort), so the result is bit-identical to the unsorted fixed point.

Per-round semantics (identical to ``non_max_suppression``'s fixed point):
  a candidate wins iff it is alive and lexicographically (curvature desc,
  original index asc) beats every alive candidate within ``radius`` (exact,
  not K-capped); winners are selected, and every alive candidate within
  ``radius`` of a winner is suppressed.  Iterating reproduces the serial
  greedy-by-curvature result exactly.

Numerics: distances use the norm expansion |xi|^2 + |xj|^2 - 2 xi.xj so the
cross term rides the MXU; the wrapper centers coordinates on the candidate
centroid first, bounding the f32 rounding of the norms to ~1e-7 * extent^2
(TLS: ~1e-3 m^2 against radius^2 >= 0.25 — only exact-boundary pairs can
flip, which the end metric is insensitive to).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG = -3.0e38
_BIG = 2**30


def _nms_kernel(r2_ref, maxr_ref, nbr_cnt_ref, nbr_idx_ref, xyz_ref, norm_ref,
                curv_ref, oid_ref, cand_ref, sel_out, rounds_out,
                s_alive, s_wins, s_sel, *, ts: int):
    n_tiles = curv_ref.shape[0]
    r2 = r2_ref[0]
    max_rounds = maxr_ref[0]

    s_alive[:, :] = cand_ref[:, :]
    s_sel[:, :] = jnp.zeros_like(s_sel)

    def dist2_tile(r, c):
        # [ts, ts] squared distances between row tile r and column tile c.
        # HIGHEST precision: the TPU default truncates the multiplies to
        # bf16, which at radius^2 scale flips in/out-of-radius decisions a
        # few percent of the time (points then escape suppression).
        d = jax.lax.dot_general(xyz_ref[r], xyz_ref[c],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        return norm_ref[r][:, None] + norm_ref[c][None, :] - 2.0 * d

    def sweep1_row(r, _):
        """wins[r]: alive rows that beat every alive in-radius candidate."""
        s_wins[r, :] = jnp.zeros((ts,), jnp.int32)
        alive_i = s_alive[r, :]

        @pl.when(jnp.sum(alive_i) > 0)
        def _():
            oidi = oid_ref[r]
            curvi = curv_ref[r]

            def col(j, carry):
                c = nbr_idx_ref[r, j]
                maxc, idmin = carry
                oidj = oid_ref[c]
                m = ((dist2_tile(r, c) <= r2)
                     & (oidi[:, None] != oidj[None, :])
                     & (s_alive[c, :][None, :] > 0))
                cj = jnp.where(m, curv_ref[c][None, :], _NEG)
                tmax = jnp.max(cj, axis=1)
                tid = jnp.min(jnp.where(m & (cj == tmax[:, None]),
                                        oidj[None, :], _BIG), axis=1)
                better = tmax > maxc
                equal = tmax == maxc
                idmin = jnp.where(better, tid,
                                  jnp.where(equal, jnp.minimum(idmin, tid),
                                            idmin))
                return jnp.maximum(maxc, tmax), idmin

            maxc0 = jnp.full((ts,), _NEG, jnp.float32)
            maxc, idmin = jax.lax.fori_loop(0, nbr_cnt_ref[r], col,
                                            (maxc0, jnp.full((ts,), _BIG)))
            wins = (alive_i > 0) & ((curvi > maxc)
                                    | ((curvi == maxc) & (oidi < idmin)))
            s_wins[r, :] = wins.astype(jnp.int32)
        return 0

    def sweep2_row(r, _):
        """Select winners; suppress alive candidates in radius of one."""
        alive_i = s_alive[r, :]
        s_sel[r, :] = s_sel[r, :] | s_wins[r, :]

        @pl.when(jnp.sum(alive_i) > 0)
        def _():
            oidi = oid_ref[r]

            def col(j, supp):
                c = nbr_idx_ref[r, j]
                m = ((dist2_tile(r, c) <= r2)
                     & (oidi[:, None] != oid_ref[c][None, :])
                     & (s_wins[c, :][None, :] > 0))
                # int32 carry: Mosaic mislays an i1 vector loop carry.
                return jnp.maximum(supp, jnp.any(m, axis=1).astype(jnp.int32))

            supp = jax.lax.fori_loop(0, nbr_cnt_ref[r], col,
                                     jnp.zeros((ts,), jnp.int32))
            s_alive[r, :] = ((alive_i > 0) & (s_wins[r, :] == 0)
                             & (supp == 0)).astype(jnp.int32)
        return 0

    def round_cond(carry):
        rounds, n_alive = carry
        return (n_alive > 0) & (rounds < max_rounds)

    def round_body(carry):
        rounds, _ = carry
        jax.lax.fori_loop(0, n_tiles, sweep1_row, 0)
        jax.lax.fori_loop(0, n_tiles, sweep2_row, 0)
        return rounds + 1, jnp.sum(s_alive[:, :])

    rounds, _ = jax.lax.while_loop(round_cond, round_body,
                                   (jnp.int32(0), jnp.sum(s_alive[:, :])))
    sel_out[:, :] = s_sel[:, :]
    rounds_out[0] = rounds


def _spread3(v: Array) -> Array:
    """Spread the low 10 bits of ``v`` so consecutive bits are 3 apart."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


@functools.partial(jax.jit, static_argnames=("ts",))
def _nms_prep(xyz: Array, curv: Array, cand: Array, radius, ts: int):
    """Center, Morton-sort, tile, and compute the near-tile lists.

    Returns sorted per-tile inputs plus the full [T, T] near-tile index
    table and per-row counts; the wrapper slices the table to the measured
    max count (static shape) before the kernel launch.
    """
    N = curv.shape[0]
    n_tiles = N // ts
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    nc = jnp.maximum(jnp.sum(cand.astype(jnp.float32)), 1.0)
    center = jnp.sum(jnp.where(cand[:, None], xyz, 0.0), axis=0) / nc
    x = jnp.where(cand[:, None], xyz - center[None, :], 0.0)

    # Morton order at ~extent/1024 resolution (valid candidates only;
    # invalid rows sort last).
    mn = jnp.min(jnp.where(cand[:, None], x, 3e38), axis=0)
    mx = jnp.max(jnp.where(cand[:, None], x, -3e38), axis=0)
    q = jnp.maximum(jnp.max(mx - mn), 1e-6) / 1023.0
    ig = jnp.clip(((x - mn[None, :]) / q), 0.0, 1023.0).astype(jnp.int32)
    code = (_spread3(ig[:, 0]) | (_spread3(ig[:, 1]) << 1)
            | (_spread3(ig[:, 2]) << 2))
    code = jnp.where(cand, code, jnp.int32(2**31 - 1))
    order = jnp.argsort(code).astype(jnp.int32)          # stable

    xs = x[order]
    cs = curv[order].reshape(n_tiles, ts)
    cd = cand[order].reshape(n_tiles, ts)
    oid = order.reshape(n_tiles, ts)
    norm = jnp.sum(xs * xs, axis=1).reshape(n_tiles, ts)
    x8 = jnp.pad(xs, ((0, 0), (0, 5))).reshape(n_tiles, ts, 8)

    # Tile bounding boxes over valid candidates; tiles whose boxes are
    # farther than radius apart cannot interact in any round.
    xt = xs.reshape(n_tiles, ts, 3)
    vt = cd[:, :, None]
    tmn = jnp.min(jnp.where(vt, xt, 3e38), axis=1)        # [T, 3]
    tmx = jnp.max(jnp.where(vt, xt, -3e38), axis=1)
    gap = jnp.maximum(tmn[:, None, :] - tmx[None, :, :],
                      tmn[None, :, :] - tmx[:, None, :])
    gap = jnp.maximum(gap, 0.0)
    gap = jnp.minimum(gap, 1e19)                          # avoid inf*inf
    d2t = jnp.sum(gap * gap, axis=-1)
    near = d2t <= r2                                      # [T, T]
    nbr_cnt = jnp.sum(near.astype(jnp.int32), axis=1)
    nbr_idx = jnp.argsort(~near, axis=1).astype(jnp.int32)
    return x8, norm, cs, oid, cd, nbr_cnt, nbr_idx, order


@functools.partial(jax.jit,
                   static_argnames=("ts", "maxn", "max_rounds", "interpret"))
def _nms_launch(x8, norm, cs, oid, cd, nbr_cnt, nbr_idx_full, radius,
                ts: int, maxn: int, max_rounds: int, interpret: bool):
    n_tiles = cs.shape[0]
    nbr_idx = nbr_idx_full[:, :maxn]
    sel, rounds = pl.pallas_call(
        functools.partial(_nms_kernel, ts=ts),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # radius^2 [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # max_rounds [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # nbr_cnt [T]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # nbr_idx [T, maxn]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # xyz8 [T, ts, 8]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # |x|^2 [T, ts]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # curv [T, ts]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # original ids [T, ts]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cand [T, ts]
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((n_tiles, ts), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((n_tiles, ts), jnp.int32),    # alive
            pltpu.VMEM((n_tiles, ts), jnp.int32),    # wins
            pltpu.VMEM((n_tiles, ts), jnp.int32),    # selected
        ],
        interpret=interpret,
    )(jnp.asarray(radius, jnp.float32).reshape(1) ** 2,
      jnp.asarray(max_rounds, jnp.int32).reshape(1),
      nbr_cnt, nbr_idx, x8, norm, cs, oid,
      cd.astype(jnp.int32))
    return sel, rounds[0]


def nms_pallas(xyz: Array, curv: Array, cand: Array, radius,
               max_rounds: int = 128, ts: int = 256,
               interpret: bool = False):
    """Exact-radius greedy-equivalent NMS, whole fixed point in one launch.

    xyz [N, 3] f32, curv [N] f32, cand [N] bool (invalid/padding rows
    False); N % ts == 0.  Returns (selected [N] bool, rounds int32).
    Host-orchestrated: one scalar sync picks the static width of the
    near-tile table (bucketed so recompiles stay rare).
    """
    N = curv.shape[0]
    n_tiles = N // ts
    x8, norm, cs, oid, cd, nbr_cnt, nbr_idx, order = _nms_prep(
        xyz, curv, cand, radius, ts)
    maxn = int(jnp.max(nbr_cnt))
    # Bucket the static slice width: powers of two, capped at T.
    m = 8
    while m < maxn:
        m *= 2
    maxn = min(m, n_tiles)
    sel_sorted, rounds = _nms_launch(x8, norm, cs, oid, cd, nbr_cnt, nbr_idx,
                                     radius, ts, maxn, max_rounds, interpret)
    sel = jnp.zeros((N,), jnp.bool_).at[order].set(
        sel_sorted.reshape(N).astype(jnp.bool_))
    return sel, rounds


def nms_bruteforce_ref(xyz, curv, cand, radius, max_rounds: int = 128):
    """jnp reference of the same exact-radius fixed point (parity tests)."""
    N = curv.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    d2 = jnp.sum((xyz[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
    within = (d2 <= jnp.float32(radius) ** 2) & (idx[:, None] != idx[None, :])

    def round_body(carry):
        alive, sel, rounds = carry
        m = within & alive[None, :]
        cj = jnp.where(m, curv[None, :], _NEG)
        maxc = jnp.max(cj, axis=1)
        idmin = jnp.min(jnp.where(m & (cj == maxc[:, None]),
                                  idx[None, :], _BIG), axis=1)
        wins = alive & ((curv > maxc) | ((curv == maxc) & (idx < idmin)))
        sel = sel | wins
        supp = jnp.any(within & wins[None, :], axis=1)
        alive = alive & ~wins & ~supp
        return alive, sel, rounds + 1

    def cond(carry):
        alive, _, rounds = carry
        return jnp.any(alive) & (rounds < max_rounds)

    _, sel, rounds = jax.lax.while_loop(
        cond, round_body, (cand, jnp.zeros_like(cand), jnp.int32(0)))
    return sel, rounds
