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
    v1_next: Array     # [S] per-row bound on max_j (b - p) at this solve's
                       # bidding-start prices (fresh where observed, the
                       # inflated carry elsewhere) — next solve's carry
    b_max_next: Array  # benefit-spread carry for the next solve
    fd_max: Array      # max FD over valid pairs (fresh on a full sweep-0,
                       # carried through fast solves; exact forever since
                       # features are fixed) — tightens the engine's
                       # benefit-rise drift term dwfd*fd_max
    punc: Array        # [C] per-column price uncertainty at return (won
                       # columns: the eps overshoot; keep-certified
                       # columns: the keep slack) — the next warm start
                       # deflates each column by ITS OWN staleness instead
                       # of a global worst case (which leaked prices to
                       # zero over warm streaks and killed the keep test)


class StreamCarry(NamedTuple):
    """Cross-iteration hint carry for the warm fast path.

    ``v1_ub`` upper-bounds each row's best alternative value
    max_j (b_ij - p_j) at the PREVIOUS solve's bidding-start prices.
    Prices only rise within a solve, so the stale bound stays sound at any
    later prices; the next solve inflates it by (benefit drift + price
    deflation) before use.  When the penalty schedule is stats-free
    (BSC iterations past the early phase, ghicp_reg.cpp:279-293 takes the
    rms/fdm branch), the carried bounds replace sweep-0 entirely — the
    solve touches only CS-violator rows instead of all S x C pairs.
    """

    ok: Array       # bool: carry fields are valid
    v1_ub: Array    # [S]
    b_max: Array    # scalar: benefit max at carry time (epsilon spread)
    ed_max: Array   # scalar: ED max bound (price-drift input)
    fd_max: Array   # scalar: max FD over valid pairs (exact, permanent)
    v1_drift: Array  # scalar: ADDITIVE benefit-rise bound excluding the
                     # wfd-decay term (keypoint motion: ED can shrink by
                     # <= d_ed as the pose improves).  Benefit-rise bounds
                     # are NOT the price_uncertainty drift — that covers
                     # benefit DECREASES (the direction that over-prices
                     # columns); a stale v1 is invalidated by the opposite
                     # direction.  Without rise bounds the keep test holds
                     # rows whose best alternative improved — the matching
                     # freezes (measured: matched RMSE 0.67 -> 1.81)
    fd_term: Array   # scalar: dwfd * fd_max — the GLOBAL additive bound on
                     # the wfd-decay benefit rise (fallback lane)
    decay_ratio: Array  # scalar r = dwfd / wfd_next.  Enables the tight
                     # self-referential decay bound: the new argmax pair
                     # satisfies fd <= cd/wfd_next <= -v1_new/wfd_next, so
                     # v1_new <= A + r*max(-v1_new, 0) with A the additive
                     # bound — i.e. v1_new <= A/(1+r) for negative A.  For
                     # converged rows |v1| is small, so this inflates by
                     # ~|v1| * r instead of dwfd*fd_max (which dwarfs
                     # inter-pair margins for the first ~25 iterations)


def carry_init(n_rows: int) -> StreamCarry:
    """An invalid carry of the right shapes (engine state at iteration 0)."""
    return StreamCarry(ok=jnp.bool_(False),
                       v1_ub=jnp.zeros((n_rows,), jnp.float32),
                       b_max=jnp.float32(0.0), ed_max=jnp.float32(0.0),
                       fd_max=jnp.float32(0.0),
                       v1_drift=jnp.float32(0.0),
                       fd_term=jnp.float32(0.0),
                       decay_ratio=jnp.float32(0.0))


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
                 select_fn: Optional[Callable] = None,
                 carry: Optional[StreamCarry] = None,
                 stats_free=False, open_cap: int = 0,
                 compact_extra_sweeps: int = 0,
                 sweep_sub_fn: Optional[Callable] = None,
                 no_features: bool = False,
                 esc_period: int = 1) -> StreamSolveResult:
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

    Warm fast path (``carry`` + ``stats_free`` + ``open_cap``):

    * ``carry`` (a :class:`StreamCarry` from the previous solve) with
      ``stats_free`` true (the penalty schedule doesn't need this sweep's
      CD statistics) replaces sweep-0 with O(S*F) factor gathers: vsel is
      computed exactly at the kept columns, v1's role in the keep test is
      played by the carried upper bound inflated by the drift terms, and
      the spread/ed_max scalars come from the carry.  Sound because
      prices only rise within a solve and every inflation term is an
      upper bound — staleness only makes the keep test conservative.
    * ``open_cap`` > 0 compacts still-open rows into a fixed-capacity
      block before each bidding/completion sweep whenever they fit, so
      those sweeps cost O(open_cap * C) instead of O(S * C) (kept rows
      don't re-bid; computing their tiles was pure waste).  Falls back to
      full sweeps when more rows than ``open_cap`` are open (e.g. cold
      starts).  Requires the default sweep path (``feats``), not the
      ring's external ``sweep_fn``.
    """
    S = kp_s.shape[0]
    C = kp_t.shape[0]
    rows_total = total_rows if total_rows is not None else S
    row_gid = comm.axis_index() * S + jnp.arange(S, dtype=jnp.int32)
    # Column-tile width: the sweep kernel's cost at TLS scale is grid-
    # program dispatch, not compute (measured at 51200^2: 120 ms at
    # tc=512 / 20000 programs vs 61 ms at tc=4096 / 2400 programs) —
    # take the widest tile that divides C.
    tc = next((t for t in (4096, 2048, 1024, 512, 256, 128)
               if C % t == 0), tc)
    external_sweep = sweep_fn is not None
    if sweep_fn is None:
        if use_kernel and S % ts == 0 and C % tc == 0:
            def sweep_fn(p, ac):
                return stream_sweep(kp_s, kp_t, feats, mask_s, mask_t, p,
                                    ac, wed, wfd, scale, ts=ts, tc=tc,
                                    interpret=interpret,
                                    mult_blend=mult_blend,
                                    no_features=no_features)
        else:
            def sweep_fn(p, ac):
                return stream_sweep_ref(kp_s, kp_t, feats, mask_s, mask_t,
                                        p, ac, wed, wfd, scale, tc=tc,
                                        mult_blend=mult_blend,
                                        no_features=no_features)

    # Open-row compaction capacity (static).  ts-granular for the kernel;
    # disabled when it wouldn't shrink the sweep or the sweep is external
    # without a subset hook.  ``sweep_sub_fn(idx, sub_mask, p, ac_sub)``
    # is that hook: the ring lane gathers its local factor rows and runs
    # the rotating-block sweep over just the subset.  An external sweep
    # may contain collectives (ppermute), so with the hook the per-round
    # compact-vs-full choice must be mesh-uniform (pmax'd open count).
    cap = min(open_cap, S)
    if sweep_sub_fn is None and use_kernel and S % ts == 0:
        # The sweep kernel needs ts-granular row blocks: round UP so caps
        # below ts still engage compaction on the kernel path (rounding
        # down silently disabled it on TPU while working on the reference
        # path — a per-backend behavior difference).
        cap = min(-(-cap // ts) * ts, S)
    can_compact = 0 < cap < S and (
        sweep_sub_fn is not None
        or ((not external_sweep) and feats is not None))
    uniform_compact = sweep_sub_fn is not None

    def sub_sweep(idx, sub_mask, p, ac_sub):
        """Sweep over the gathered row subset (same semantics, fewer rows).
        The factor gather is O(cap*F) — trivia next to a full sweep."""
        if sweep_sub_fn is not None:
            return sweep_sub_fn(idx, sub_mask, p, ac_sub)
        sub = StreamFeatures(fs=feats.fs[:, idx], ft=feats.ft,
                             na=feats.na[:, idx], nb=feats.nb)
        kps_sub = kp_s[idx]
        if use_kernel and cap % ts == 0 and C % tc == 0:
            return stream_sweep(kps_sub, kp_t, sub, sub_mask, mask_t, p,
                                ac_sub, wed, wfd, scale, ts=ts, tc=tc,
                                interpret=interpret, mult_blend=mult_blend,
                                no_features=no_features)
        return stream_sweep_ref(kps_sub, kp_t, sub, sub_mask, mask_t, p,
                                ac_sub, wed, wfd, scale, tc=tc,
                                mult_blend=mult_blend,
                                no_features=no_features)

    # --- sweep 0: statistics + warm-start hints at mid-deflated prices ---
    real0 = (acol0 >= 0) & (acol0 < C)
    owner0 = jnp.full((C,), -1, jnp.int32).at[
        jnp.where(real0, acol0, C)].max(
        jnp.where(real0, row_gid, -1), mode="drop")
    owner0 = comm.pmax(owner0)
    # price_uncertainty: per-column vector [C] (re-certification scheme)
    # or scalar (legacy); scalar consumers below use its max.
    d_pre = jnp.asarray(price_uncertainty, jnp.float32)
    d_pre_max = jnp.max(d_pre)
    p_mid = jnp.where(owner0 >= 0, jnp.maximum(p0 - d_pre, 0.0), 0.0)
    jc0 = jnp.where(real0, acol0, 0)

    def _full_sweep0(_):
        sw0 = sweep_fn(p_mid, acol0)
        cnt = jnp.maximum(comm.psum(sw0.cnt), 1.0)
        s1 = comm.psum(sw0.cd_sum)
        s2 = comm.psum(sw0.cd_sumsq)
        cd_mean = s1 / cnt
        cd_std = jnp.sqrt(jnp.maximum(s2 / cnt - cd_mean * cd_mean, 0.0))
        penalty = penalty_from_stats(cd_mean, cd_std)
        b_max = comm.pmax(sw0.b_max)
        ed_max = comm.pmax(sw0.ed_max)
        # v1 measured fresh at p_mid: only the penalty-drift deflation
        # (applied below) separates it from the bidding-start prices.
        return (penalty, cd_mean, cd_std, b_max, ed_max,
                comm.pmax(sw0.fd_max), sw0.v1, sw0.vsel, sw0.j1, sw0.v2,
                jnp.bool_(True))

    def _carry_sweep0(_):
        # Stats-free penalty: the schedule ignores (mean, std) here.
        zero = jnp.float32(0.0)
        penalty = penalty_from_stats(zero, zero)
        if select_fn is not None:
            cd0, _, _ = select_fn(jc0)
        else:
            cd0, _, _ = stream_selected(kp_s, kp_t, feats, jc0, wed, wfd,
                                        scale, mult_blend=mult_blend,
                                        no_features=no_features)
        vsel = jnp.where(real0 & mask_s & mask_t[jc0],
                         -cd0 - p_mid[jc0], _NEG)
        # Carried v1 was measured at the PREVIOUS solve's bidding-start
        # prices under the previous benefits.  Additive inflations: ED
        # motion (v1_drift), price deflation applied since (<= d_pre),
        # and the penalty shift dp (known here).  The wfd-decay rise is
        # the tighter of (a) the global dwfd*fd_max term and (b) the
        # self-referential bound v1_new <= A + r*max(-v1_new, 0), i.e.
        # A/(1+r) for negative A — for converged rows |v1| is small and
        # (b) beats (a) by orders of magnitude.
        dp = jnp.abs(penalty - jnp.float32(pen_prev))
        A = carry.v1_ub + carry.v1_drift + d_pre_max + dp
        tight = jnp.where(A > 0, A, A / (1.0 + carry.decay_ratio))
        bound = jnp.minimum(A + carry.fd_term, tight)
        # Downstream adds dpen uniformly; pre-subtract so the final
        # v1_ub equals the bound computed here.
        # b = -cd <= 0 always: clamping the carried spread max at zero
        # stops the fd_term accumulation from inflating epsilon forever.
        return (penalty, zero, zero,
                jnp.minimum(carry.b_max + carry.fd_term, 0.0),
                carry.ed_max, carry.fd_max,
                bound - dp, vsel,
                jnp.zeros((S,), jnp.int32), jnp.full((S,), _NEG),
                jnp.bool_(False))

    if carry is None:
        (penalty, cd_mean, cd_std, b_max, ed_max, fd_max, v1_base,
         vsel0, sw0_j1, sw0_v2, swept0) = _full_sweep0(None)
    else:
        fast = carry.ok & jnp.asarray(stats_free)
        (penalty, cd_mean, cd_std, b_max, ed_max, fd_max, v1_base,
         vsel0, sw0_j1, sw0_v2, swept0) = jax.lax.cond(
            fast, _carry_sweep0, _full_sweep0, None)
    sink = -penalty

    spread = jnp.maximum(b_max - sink, 0.0)
    eps = jnp.maximum(jnp.float32(eps_final), jnp.float32(rel_eps) * spread)

    # --- warm-start keep test (epsilon-CS under the new prices) ---
    # dpen widens both the price deflation and the keep epsilon: the sink
    # moved by |d penalty|, and sweep-0's hints were computed at p_mid
    # before the new penalty was known — v1 at the further-deflated start
    # prices is bounded above by v1_mid + dpen, vsel below by vsel_mid.
    # The keep SLACK stays at the solve's own CS tolerance (~2x the base
    # epsilon, the terminal escalated value) plus the dpen measurement
    # slop; price-drift uncertainty belongs on the v1 bound, not here —
    # as extra slack it let rows keep assignments ~d_pre-suboptimal,
    # freezing the matching at several times the auction's epsilon
    # (measured: matched RMSE 0.54 -> 1.58 on one warm-heavy seed).
    dpen = jnp.abs(penalty - jnp.float32(pen_prev))
    v1_ub = v1_base + dpen
    eps0 = jnp.clip(dpen + 2.0 * eps, eps, jnp.maximum(spread / 8.0, eps))
    own_ok = real0 & (owner0[jc0] == row_gid)
    keep = own_ok & (vsel0 >= v1_ub - eps0)
    stay_sunk = (acol0 == _SINK) & (sink >= v1_ub - eps0)
    rel = own_ok & ~keep
    owner = owner0.at[jnp.where(rel, acol0, C)].set(-1, mode="drop")
    owner = comm.pmin(owner)
    acol = jnp.where(keep, acol0, jnp.where(stay_sunk, _SINK, -1))
    # Prices deflated for bidding (drift + penalty shift); a price is only
    # meaningful while an owner supports it.
    p = jnp.where(owner >= 0, jnp.maximum(p_mid - dpen, 0.0), 0.0)
    p_bid0 = p

    # --- Jacobi bidding sweeps with epsilon escalation ---
    # A compact sweep costs O(cap/S) of a full one, so rounds where the
    # open set fits the compact block get extra runway beyond the
    # full-sweep budget: mass releases (conservative keep tests in the
    # warm fast path) then re-converge through cheap sweeps instead of
    # falling en masse to greedy completion (which is not one-to-one and
    # dilutes the estimator with duplicate columns).
    budget = jnp.int32(max_sweeps)
    extend = bool(can_compact and compact_extra_sweeps)
    budget_ext = (jnp.maximum(budget, jnp.int32(compact_extra_sweeps))
                  if extend else budget)
    # Epsilon escalation follows the BASE budget's schedule and freezes
    # beyond it: the extended compact rounds are ~free, so they war at
    # fine epsilon instead of hammer-escalating.  (Escalating through the
    # extension poisons the next warm start: eps_used feeds price_unc,
    # and 2^12 x eps dwarfed the benefit spread — measured keep=0 forever
    # with dpre growing 2 -> 1203 -> 1417 across iterations.)
    esc_after = jnp.maximum(budget // 4, 1)
    # ``esc_period``: sweeps per epsilon doubling past esc_after.  The
    # default 1 is tuned for the per-iteration production budgets (2-16
    # sweeps) where escalation is a terminal war-breaker; long-budget
    # callers (the final one-to-one resolve, budget ~3000) pass
    # ~budget//16 so the sink endgame escalates like the GS kernel's
    # schedule instead of exploding within 20 sweeps.
    esc_per = jnp.maximum(jnp.int32(esc_period), 1)

    def esc_eps(r):
        return eps * jnp.exp2(jnp.maximum(
            jnp.minimum(r, budget) - esc_after, 0).astype(jnp.float32)
            / esc_per.astype(jnp.float32))

    neg_s = jnp.full((S,), _NEG, jnp.float32)

    def open_top2(rows_open, p, acol):
        """Top-2 for the open rows: compacted when they fit in ``cap``,
        else a full sweep.  Returns full-[S] (v1, j1, v2) with _NEG at
        untouched rows (only open rows' values are consumed) plus the
        freshly-observed v1 scatter for the carry."""
        def full(_):
            sw = sweep_fn(p, acol)
            return sw.v1, sw.j1, sw.v2, sw.v1, mask_s

        if not can_compact:
            return full(None)

        def compact(_):
            # Stable compaction without a sort: each open row scatters to
            # its rank (cumsum), preserving original order.  Unfilled
            # slots gather row 0 with sub_mask off; scatters back use an
            # out-of-bounds sentinel so they drop instead of clobbering.
            rank = jnp.cumsum(rows_open.astype(jnp.int32)) - 1
            pos = jnp.where(rows_open & (rank < cap), rank, cap)
            rows = jnp.arange(S, dtype=jnp.int32)
            idx = jnp.zeros((cap,), jnp.int32).at[pos].set(
                rows, mode="drop")
            filled = jnp.zeros((cap,), bool).at[pos].set(
                rows_open, mode="drop")
            sub_mask = filled & mask_s[idx]
            sw = sub_sweep(idx, sub_mask, p, acol[idx])
            idx_sc = jnp.where(sub_mask, idx, S)
            v1 = neg_s.at[idx_sc].set(sw.v1, mode="drop")
            j1 = jnp.zeros((S,), jnp.int32).at[idx_sc].set(
                sw.j1, mode="drop")
            v2 = neg_s.at[idx_sc].set(sw.v2, mode="drop")
            obs = jnp.zeros((S,), bool).at[idx_sc].set(
                sub_mask, mode="drop")
            return v1, j1, v2, v1, obs

        n_open = jnp.sum(rows_open.astype(jnp.int32))
        if uniform_compact:
            # The sub sweep carries collectives: every device must take
            # the same branch.
            n_open = comm.pmax(n_open)
        return jax.lax.cond(n_open <= cap, compact, full, None)

    def cond(c):
        owner, acol, p, r, v1_obs, j1_obs, obs = c
        open_local = jnp.sum((acol == -1).astype(jnp.int32))
        open_rows = comm.psum(open_local)
        in_budget = r < budget
        if extend:
            # Extra rounds only while EVERY shard's open set fits its
            # compact block (pmax keeps the loop trip count uniform across
            # shards — collectives in the body must stay in lockstep).
            in_budget = in_budget | ((comm.pmax(open_local) <= cap)
                                     & (r < budget_ext))
        return (open_rows > 0) & in_budget

    # Cold solves (no carried assignment: every p_mid and bidding-start
    # price is zero) can reuse sweep-0's top-2 for the FIRST bidding
    # round — (b - p) is unchanged, so the round-0 full sweep is free.
    cold0 = ~jnp.any(owner0 >= 0)

    def body(c):
        owner, acol, p, r, v1_obs, j1_obs, obs = c
        rows_open = acol == -1
        reuse = (r == 0) & cold0 & swept0
        v1, j1, v2, v1_new, touched = jax.lax.cond(
            reuse,
            lambda _: (v1_base, sw0_j1, sw0_v2, v1_base, mask_s),
            lambda _: open_top2(rows_open, p, acol), None)
        # Carry tracking: overwrite with the freshest measurement (prices
        # only rise, so later observations are the tighter upper bounds).
        v1_obs = jnp.where(touched, v1_new, v1_obs)
        j1_obs = jnp.where(touched, j1, j1_obs)
        obs = obs | touched
        eps_r = esc_eps(r + 1)
        owner, acol, p = _resolve_round(v1, j1, v2, eps_r, sink,
                                        (owner, acol, p), row_gid, comm, C)
        return owner, acol, p, r + 1, v1_obs, j1_obs, obs

    owner, acol, p, rounds, v1_obs, j1_obs, obs = jax.lax.while_loop(
        cond, body, (owner, acol, p, jnp.int32(0), neg_s,
                     jnp.zeros((S,), jnp.int32),
                     jnp.zeros((S,), bool)))

    # --- greedy completion at final prices (budget exhaustion) ---
    # The completion sweep's fresh per-row observations feed the carry too
    # (v1_obs/obs): completed rows would otherwise re-enter the next keep
    # test with the inflated bound and be released again immediately.
    # When EVERY leftover row was observed by a bidding sweep AND the
    # leftover set is too large for the compact block (i.e. completion
    # would cost a FULL O(S*C) sweep), completion reuses the last
    # observation (v1/j1 at that round's pre-resolve prices) — greedy
    # completion allows duplicate columns anyway, and the stale v1 only
    # overestimates (prices rose since), so the sink rule errs toward
    # keeping a penalty-gated match rather than dropping one.  Release-
    # heavy solves (identity-start early phase) save a full pass per
    # iteration; small leftovers route through the cheap compact sweep
    # and stay exact (the stale rule measurably inflates the matched-RMSE
    # verdict at sparse keypoint counts).
    leftover = acol == -1
    n_left = comm.psum(jnp.sum(leftover.astype(jnp.int32)))
    any_left = n_left > 0
    all_obs = comm.psum(jnp.sum(
        (leftover & ~obs).astype(jnp.int32))) == 0
    if can_compact:
        all_obs = all_obs & (n_left > cap)
    else:
        all_obs = jnp.bool_(False)

    def complete(c):
        acol, v1_obs, j1_obs, obs = c

        def stale(_):
            return v1_obs, j1_obs, v1_obs, obs

        def fresh(_):
            v1, j1, _, v1_new, touched = open_top2(leftover, p, acol)
            return v1, j1, jnp.where(touched, v1_new, v1_obs), obs | touched

        v1, j1, v1_obs, obs = jax.lax.cond(all_obs, stale, fresh, None)
        acol = jnp.where(leftover,
                         jnp.where(v1 > sink, j1, _SINK), acol)
        return acol, v1_obs, j1_obs, obs

    acol, v1_obs, j1_obs, obs = jax.lax.cond(
        any_left, complete, lambda c: c, (acol, v1_obs, j1_obs, obs))

    # --- selection, gate, energy (matrix-free gathers) ---
    matched = (acol >= 0) & (acol < C)
    jc = jnp.where(matched, acol, 0)
    if select_fn is not None:
        cd_sel, ed_sel, fd_sel = select_fn(jc)
    else:
        cd_sel, ed_sel, fd_sel = stream_selected(kp_s, kp_t, feats, jc,
                                                 wed, wfd, scale,
                                                 mult_blend=mult_blend,
                                                 no_features=no_features)
    real = mask_s & matched & mask_t[jc] & (cd_sel < penalty)
    w = real.astype(jnp.float32)
    cor = comm.psum(jnp.sum(w))
    matched_cd = comm.psum(jnp.sum(jnp.where(real, cd_sel, 0.0)))
    n_sq = jnp.float32(max(rows_total, C))
    energy = matched_cd + penalty * (n_sq - cor)
    match = MatchResult(tgt_idx=jc.astype(jnp.int32), w=w,
                        n_matches=cor.astype(jnp.int32))
    eps_used = esc_eps(rounds)
    # Next-solve carry: fresh observations where a bidding/completion sweep
    # touched the row (measured at in-solve prices, which only rise), the
    # inflated keep-test bound elsewhere.
    v1_next = jnp.where(obs, v1_obs, v1_ub)
    # Per-column re-certification (StreamSolveResult.punc): won columns
    # carry the (escalated) bid overshoot, unchanged columns only the
    # keep-test slack they were certified at.
    punc = jnp.where(p != p_bid0, 2.0 * eps_used, eps0)
    return StreamSolveResult(match=match, prices=p, energy=energy,
                             rounds=rounds, eps_used=eps_used, acol=acol,
                             cd_sel=cd_sel, fd_sel=fd_sel, penalty=penalty,
                             cd_mean=cd_mean, cd_std=cd_std, ed_max=ed_max,
                             v1_next=v1_next, b_max_next=b_max,
                             fd_max=fd_max, punc=punc)
