"""Streaming (matrix-free) auction: KM-equivalent matching with no [S,T].

The dense solvers in :mod:`ghicp_tpu.matching.auction` bid over a
materialized benefit matrix.  This module runs the SAME forward-auction
semantics (outside-option sink = -penalty reproducing KM's dummy padding,
ghicp_reg.cpp:348-365; epsilon-CS bound; assignment+price warm starts)
with every full-matrix reduction replaced by a matrix-free sweep
(:mod:`ghicp_tpu.ops.stream_kernel`): benefits are recomputed from the
coordinate/feature factors inside each sweep, so peak memory is
O(S*F + C*F) instead of O(S*T) — the reference's scaling wall
(ghicp_reg.h:26-30) is gone rather than moved.

Cost model: one sweep = one pass of ED cross terms + feature matmuls over
all (row tile, col tile) pairs.  A solve spends 1 sweep for statistics +
warm-start hints, up to ``max_sweeps`` bidding sweeps (Jacobi: every open
row re-bids at current prices), and one completion sweep when rows remain
open — with warm starts the typical engine iteration converges in the
first bidding sweep.  Epsilon escalates geometrically past a quarter of
the budget, mirroring the dense GS kernel's schedule.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ghicp_tpu.core.comm import LOCAL, Comm
from ghicp_tpu.matching.matchers import MatchResult
from ghicp_tpu.ops.stream_kernel import (StreamFeatures, stream_selected,
                                         stream_sweep, stream_sweep_ref)

Array = jax.Array

_NEG = jnp.float32(-3.0e38)
_SINK = jnp.int32(2**30)


class StreamSolveResult(NamedTuple):
    match: MatchResult
    prices: Array      # [C]
    energy: Array
    rounds: Array      # bidding sweeps executed
    eps_used: Array
    acol: Array        # [S]
    cd_sel: Array      # [S] matched-pair blended cost
    fd_sel: Array      # [S] matched-pair feature distance (stats input)
    penalty: Array
    cd_mean: Array
    cd_std: Array
    ed_max: Array      # drift-bound input for the next warm start


def _resolve_round(v1, j1, v2, eps_r, sink, state, row_gid, comm: Comm,
                   C: int):
    """One Jacobi bidding round from precomputed top-2 (same semantics as
    auction._bidding_round, factored over the sweep outputs)."""
    owner, acol, p = state
    R = v1.shape[0]
    unassigned = acol == -1
    to_sink = unassigned & (v1 <= sink)
    acol = jnp.where(to_sink, _SINK, acol)
    bidding = unassigned & ~to_sink
    v2s = jnp.maximum(v2, sink)
    bid = jnp.where(bidding, p[j1] + v1 - v2s + eps_r, _NEG)
    win_bid = jnp.full((C,), _NEG, jnp.float32).at[j1].max(bid)
    win_bid = comm.pmax(win_bid)
    is_best = bidding & (bid == win_bid[j1]) & (win_bid[j1] > _NEG)
    winner = jnp.full((C,), -1, jnp.int32).at[j1].max(
        jnp.where(is_best, row_gid, -1))
    winner = comm.pmax(winner)
    has_winner = winner >= 0
    offset = row_gid[0]
    evicted = jnp.where(has_winner & (owner >= 0), owner - offset, R)
    evicted = jnp.where((evicted >= 0) & (evicted < R), evicted, R)
    acol = acol.at[evicted].set(-1, mode="drop")
    taken = jnp.where(has_winner, winner - offset, R)
    taken = jnp.where((taken >= 0) & (taken < R), taken, R)
    acol = acol.at[taken].set(jnp.arange(C, dtype=jnp.int32), mode="drop")
    owner = jnp.where(has_winner, winner, owner)
    p = jnp.where(has_winner, win_bid, p)
    return owner, acol, p


def stream_solve(kp_s: Array, kp_t: Array, feats: StreamFeatures,
                 mask_s: Array, mask_t: Array, wed, wfd, scale,
                 penalty_from_stats: Callable,
                 eps_final: float, rel_eps: float, max_sweeps,
                 p0: Array, price_uncertainty, acol0: Array, pen_prev,
                 comm: Comm = LOCAL, total_rows: Optional[int] = None,
                 ts: int = 256, tc: int = 512, interpret: bool = False,
                 mult_blend: bool = False, use_kernel: bool = True,
                 sweep_fn: Optional[Callable] = None,
                 select_fn: Optional[Callable] = None) -> StreamSolveResult:
    """Matrix-free KM-equivalent solve for one engine iteration.

    ``penalty_from_stats(cd_mean, cd_std)`` maps the sweep's CD statistics
    to this iteration's penalty (the schedule lives in the engine, which
    owns rms/fdm/para state).  ``p0``/``price_uncertainty``/``acol0``
    warm-start exactly like the dense path (auction.py docstrings);
    ``price_uncertainty`` must EXCLUDE the penalty-drift term — the drift
    ``dpen = |penalty - pen_prev|`` is added here once the new penalty is
    known (the sink moved by that much), and the warm-start keep test uses
    sweep-0 hints adjusted by the same upper/lower-bound reasoning as the
    fused kernel path (ops/cost_kernel.py: v1 upper bound = v1_mid + dpen,
    vsel lower bound = vsel_mid).

    ``sweep_fn(prices, acol) -> SweepResult`` overrides the sweep
    implementation (the distributed ring, ops/stream_kernel.py::
    ring_sweep); otherwise the Pallas kernel (TPU) or the lax.scan
    reference runs.  ``select_fn(tgt_idx) -> (cd_sel, ed_sel, fd_sel)``
    likewise overrides the matched-pair gathers (the ring keeps target
    factors sharded, so selection reads the replicated packed words
    instead, ring_selected).
    """
    S = kp_s.shape[0]
    C = kp_t.shape[0]
    rows_total = total_rows if total_rows is not None else S
    row_gid = comm.axis_index() * S + jnp.arange(S, dtype=jnp.int32)
    if sweep_fn is None:
        if use_kernel and S % ts == 0 and C % tc == 0:
            def sweep_fn(p, ac):
                return stream_sweep(kp_s, kp_t, feats, mask_s, mask_t, p,
                                    ac, wed, wfd, scale, ts=ts, tc=tc,
                                    interpret=interpret,
                                    mult_blend=mult_blend)
        else:
            def sweep_fn(p, ac):
                return stream_sweep_ref(kp_s, kp_t, feats, mask_s, mask_t,
                                        p, ac, wed, wfd, scale, tc=tc,
                                        mult_blend=mult_blend)

    # --- sweep 0: statistics + warm-start hints at mid-deflated prices ---
    real0 = (acol0 >= 0) & (acol0 < C)
    owner0 = jnp.full((C,), -1, jnp.int32).at[
        jnp.where(real0, acol0, C)].max(
        jnp.where(real0, row_gid, -1), mode="drop")
    owner0 = comm.pmax(owner0)
    d_pre = jnp.float32(price_uncertainty)
    p_mid = jnp.where(owner0 >= 0, jnp.maximum(p0 - d_pre, 0.0), 0.0)
    sw0 = sweep_fn(p_mid, acol0)
    cnt = jnp.maximum(comm.psum(sw0.cnt), 1.0)
    s1 = comm.psum(sw0.cd_sum)
    s2 = comm.psum(sw0.cd_sumsq)
    cd_mean = s1 / cnt
    cd_std = jnp.sqrt(jnp.maximum(s2 / cnt - cd_mean * cd_mean, 0.0))
    penalty = penalty_from_stats(cd_mean, cd_std)
    b_max = comm.pmax(sw0.b_max)
    ed_max = comm.pmax(sw0.ed_max)
    sink = -penalty

    spread = jnp.maximum(b_max - sink, 0.0)
    eps = jnp.maximum(jnp.float32(eps_final), jnp.float32(rel_eps) * spread)

    # --- warm-start keep test (epsilon-CS under the new prices) ---
    # dpen widens both the price deflation and the keep epsilon: the sink
    # moved by |d penalty|, and sweep-0's hints were computed at p_mid
    # before the new penalty was known — v1 at the further-deflated start
    # prices is bounded above by v1_mid + dpen, vsel below by vsel_mid.
    dpen = jnp.abs(penalty - jnp.float32(pen_prev))
    v1_ub = sw0.v1 + dpen
    eps0 = jnp.clip(d_pre + dpen, eps, jnp.maximum(spread / 8.0, eps))
    jc0 = jnp.where(real0, acol0, 0)
    own_ok = real0 & (owner0[jc0] == row_gid)
    keep = own_ok & (sw0.vsel >= v1_ub - eps0)
    stay_sunk = (acol0 == _SINK) & (sink >= v1_ub - eps0)
    rel = own_ok & ~keep
    owner = owner0.at[jnp.where(rel, acol0, C)].set(-1, mode="drop")
    owner = comm.pmin(owner)
    acol = jnp.where(keep, acol0, jnp.where(stay_sunk, _SINK, -1))
    # Prices deflated for bidding (drift + penalty shift); a price is only
    # meaningful while an owner supports it.
    p = jnp.where(owner >= 0, jnp.maximum(p_mid - dpen, 0.0), 0.0)

    # --- Jacobi bidding sweeps with epsilon escalation ---
    budget = jnp.int32(max_sweeps)
    esc_after = jnp.maximum(budget // 4, 1)

    def cond(c):
        owner, acol, p, r = c
        open_rows = comm.psum(jnp.sum((acol == -1).astype(jnp.int32)))
        return (open_rows > 0) & (r < budget)

    def body(c):
        owner, acol, p, r = c
        sw = sweep_fn(p, acol)
        eps_r = eps * jnp.exp2(jnp.maximum(
            r + 1 - esc_after, 0).astype(jnp.float32))
        owner, acol, p = _resolve_round(sw.v1, sw.j1, sw.v2, eps_r, sink,
                                        (owner, acol, p), row_gid, comm, C)
        return owner, acol, p, r + 1

    owner, acol, p, rounds = jax.lax.while_loop(
        cond, body, (owner, acol, p, jnp.int32(0)))

    # --- greedy completion at final prices (budget exhaustion) ---
    leftover = acol == -1
    any_left = comm.psum(jnp.sum(leftover.astype(jnp.int32))) > 0

    def complete(acol):
        sw = sweep_fn(p, acol)
        return jnp.where(leftover,
                         jnp.where(sw.v1 > sink, sw.j1, _SINK), acol)

    acol = jax.lax.cond(any_left, complete, lambda a: a, acol)

    # --- selection, gate, energy (matrix-free gathers) ---
    matched = (acol >= 0) & (acol < C)
    jc = jnp.where(matched, acol, 0)
    if select_fn is not None:
        cd_sel, ed_sel, fd_sel = select_fn(jc)
    else:
        cd_sel, ed_sel, fd_sel = stream_selected(kp_s, kp_t, feats, jc,
                                                 wed, wfd, scale,
                                                 mult_blend=mult_blend)
    real = mask_s & matched & mask_t[jc] & (cd_sel < penalty)
    w = real.astype(jnp.float32)
    cor = comm.psum(jnp.sum(w))
    matched_cd = comm.psum(jnp.sum(jnp.where(real, cd_sel, 0.0)))
    n_sq = jnp.float32(max(rows_total, C))
    energy = matched_cd + penalty * (n_sq - cor)
    match = MatchResult(tgt_idx=jc.astype(jnp.int32), w=w,
                        n_matches=cor.astype(jnp.int32))
    eps_used = eps * jnp.exp2(jnp.maximum(
        rounds - esc_after, 0).astype(jnp.float32))
    return StreamSolveResult(match=match, prices=p, energy=energy,
                             rounds=rounds, eps_used=eps_used, acol=acol,
                             cd_sel=cd_sel, fd_sel=fd_sel, penalty=penalty,
                             cd_mean=cd_mean, cd_std=cd_std, ed_max=ed_max)
