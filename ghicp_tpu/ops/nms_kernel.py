"""Whole-fixed-point NMS kernel: every suppression round in ONE Pallas launch.

The XLA NMS path (ghicp_tpu/preprocess/keypoints.py) precomputes K-capped
radius neighbor lists and then, per round, gathers the alive/wins masks over
the [N, K] lists — ~50M gather rows per round at TLS candidate counts
(~0.2s/round on the 60M rows/s gather ceiling, 7+ rounds).  This kernel
replaces the gathers with tiled brute-force distance tests: candidate
coordinates, curvatures and the alive/wins/selected masks (~2MB at 64k
candidates) live in VMEM scratch for the whole fixed point, each round is
two tiled sweeps over the [N, N] pair space with the MXU carrying the
distance cross terms, and the round loop early-exits the moment no
candidate is undecided.  No neighbor lists, no K cap — the suppression
radius is *exact*, which is more faithful to the reference's KD-tree
``nonMaximaSuppression`` (keypoint_detect.hpp:149-191) than the capped
gather path.

Per-round semantics (identical to ``non_max_suppression``'s fixed point):
  a candidate wins iff it is alive and lexicographically (curvature desc,
  index asc) beats every alive candidate within ``radius`` (exact, not
  K-capped); winners are selected, and every alive candidate within
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


def _nms_kernel(r2_ref, maxr_ref, xyz_ref, norm_ref, curv_ref, cand_ref,
                sel_out, rounds_out, s_alive, s_wins, s_sel, *, ts: int):
    n_tiles = curv_ref.shape[0]
    r2 = r2_ref[0]
    max_rounds = maxr_ref[0]

    s_alive[:, :] = cand_ref[:, :]
    s_sel[:, :] = jnp.zeros_like(s_sel)

    def gid(t):
        return t * ts + jax.lax.broadcasted_iota(jnp.int32, (ts, 1), 0)[:, 0]

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
            gidi = gid(r)
            curvi = curv_ref[r]

            def col(c, carry):
                maxc, idmin = carry
                gidj = gid(c)
                m = ((dist2_tile(r, c) <= r2)
                     & (gidi[:, None] != gidj[None, :])
                     & (s_alive[c, :][None, :] > 0))
                cj = jnp.where(m, curv_ref[c][None, :], _NEG)
                tmax = jnp.max(cj, axis=1)
                tid = jnp.min(jnp.where(m & (cj == tmax[:, None]),
                                        gidj[None, :], _BIG), axis=1)
                better = tmax > maxc
                equal = tmax == maxc
                idmin = jnp.where(better, tid,
                                  jnp.where(equal, jnp.minimum(idmin, tid),
                                            idmin))
                return jnp.maximum(maxc, tmax), idmin

            maxc0 = jnp.full((ts,), _NEG, jnp.float32)
            maxc, idmin = jax.lax.fori_loop(0, n_tiles, col,
                                            (maxc0, jnp.full((ts,), _BIG)))
            wins = (alive_i > 0) & ((curvi > maxc)
                                    | ((curvi == maxc) & (gidi < idmin)))
            s_wins[r, :] = wins.astype(jnp.int32)
        return 0

    def sweep2_row(r, _):
        """Select winners; suppress alive candidates in radius of one."""
        alive_i = s_alive[r, :]
        s_sel[r, :] = s_sel[r, :] | s_wins[r, :]

        @pl.when(jnp.sum(alive_i) > 0)
        def _():
            gidi = gid(r)

            def col(c, supp):
                m = ((dist2_tile(r, c) <= r2)
                     & (gidi[:, None] != gid(c)[None, :])
                     & (s_wins[c, :][None, :] > 0))
                # int32 carry: Mosaic mislays an i1 vector loop carry.
                return jnp.maximum(supp, jnp.any(m, axis=1).astype(jnp.int32))

            supp = jax.lax.fori_loop(0, n_tiles, col,
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


@functools.partial(jax.jit, static_argnames=("ts", "max_rounds", "interpret"))
def nms_pallas(xyz: Array, curv: Array, cand: Array, radius,
               max_rounds: int = 128, ts: int = 256,
               interpret: bool = False):
    """Exact-radius greedy-equivalent NMS, whole fixed point in one launch.

    xyz [N, 3] f32, curv [N] f32, cand [N] bool (invalid/padding rows
    False); N % ts == 0.  Returns (selected [N] bool, rounds int32).
    """
    N = curv.shape[0]
    n_tiles = N // ts
    nc = jnp.maximum(jnp.sum(cand.astype(jnp.float32)), 1.0)
    center = jnp.sum(jnp.where(cand[:, None], xyz, 0.0), axis=0) / nc
    x = jnp.where(cand[:, None], xyz - center[None, :], 0.0)
    x8 = jnp.pad(x, ((0, 0), (0, 5))).reshape(n_tiles, ts, 8)
    norm = jnp.sum(x * x, axis=1).reshape(n_tiles, ts)
    sel, rounds = pl.pallas_call(
        functools.partial(_nms_kernel, ts=ts),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # radius^2 [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # max_rounds [1]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # xyz8 [T, ts, 8]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # |x|^2 [T, ts]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # curv [T, ts]
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
      x8, norm, curv.reshape(n_tiles, ts),
      cand.astype(jnp.int32).reshape(n_tiles, ts))
    return sel.reshape(N).astype(jnp.bool_), rounds[0]


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
