"""Auction algorithm: massively-parallel global-optimal bipartite matching.

TPU-native replacement for the serial Kuhn-Munkres solver (reference
``src/km.cpp:13-126`` — a recursive augmenting-path DFS, the single hottest
and least parallel piece of GH-ICP, SURVEY.md §3.3).  The KM semantics are:

* square problem of size n = max(n_s, n_t); every entry is ``-penalty``
  except valid pairs with CD < penalty, which get ``-CD``
  (ghicp_reg.cpp:348-365);
* perfect max-weight matching; a pair is a *real* correspondence iff its
  weight is not ``-penalty`` (km.cpp:162);
* the epsilon tolerance ``KM_eps`` (ghicp_reg.h:38, km.cpp:22).

Bertsekas' auction computes the same matching to within n*eps of optimal,
but every step is a dense parallel reduction — exactly what the TPU wants:

  each unassigned row bids for its best column: value v = b[i, :] - p,
  bid = p[j*] + v1 - v2 + eps (row-wise top-2, VPU);
  every contested column goes to the highest bidder (scatter-max);
  prices rise monotonically; epsilon-scaling phases reuse prices.

Shape/padding design: the benefit matrix is [rows, cols] with
cols = max(S_total, T) >= rows.  Adding all-(-penalty) dummy rows/columns
never changes the optimal *real*-match set (any matching's total is
sum(real benefits) - penalty * (#dummy edges), so maximizing is equivalent
to maximizing sum over real matches of (penalty - CD) regardless of padding)
— that lets the solver run at static shapes and with an arbitrary device
row-sharding.

SPMD: with a :class:`~ghicp_tpu.core.comm.Comm` bound to a mesh axis, rows
are sharded; each device computes bids for its rows, column price/winner
resolution is one ``pmax`` pair over ICI, and eviction bookkeeping uses
global row ids.  Same code path runs single-chip with the LOCAL comm.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ghicp_tpu.core.comm import LOCAL, Comm
from ghicp_tpu.matching.matchers import MatchResult

Array = jax.Array

_NEG = jnp.float32(-3.0e38)


class AuctionResult(NamedTuple):
    match: MatchResult
    prices: Array      # [cols] final dual prices
    energy: Array      # scalar: sum matched CD + penalty * n_unmatched
    rounds: Array      # total bidding rounds executed
    eps_used: Array    # effective final epsilon (after the rel_eps floor)
    acol: Array        # [rows] raw assignment: col id, _SINK, or -1 —
                       # feed back as ``acol0`` to warm-start the next solve
    cd_sel: Array      # [rows] f32 matched-pair cost (CD at the assigned
                       # column; callers reuse it instead of re-gathering
                       # the [rows, cols] matrix — row gathers cost ~0.14ms
                       # at 8k rows on this backend)
    punc: Array        # [cols] per-column price uncertainty at return:
                       # the deflation depth the NEXT warm start needs for
                       # each column (won columns carry the eps overshoot,
                       # keep-test-certified columns only the keep slack).
                       # Feed back (plus the inter-solve benefit-drift
                       # bound) as ``price_uncertainty``


_SINK = jnp.int32(2**30)  # "unmatched" pseudo-column (infinite capacity)

# Test hook: force the whole-phase Pallas kernel path in interpret mode on
# non-TPU backends, so the phase scheduling / budget threading / CS-repair
# glue is exercised by the CPU test mesh.
_KERNEL_INTERPRET = False


def _gs_ts(C: int) -> int:
    """Row-tile height for the GS kernels: ts=256 fits C=8192 in the raised
    scoped-VMEM budget; each doubling of C halves ts (see the VMEM note at
    the kernel dispatch site)."""
    ts = 256
    while ts > 16 and ts * C > 256 * 8192:
        ts //= 2
    return ts


def _bidding_round(b: Array, eps: Array, sink_value: Array,
                   sink_slack: Array, row_gid: Array, state, comm: Comm):
    """One synchronous bidding round with an outside option.

    b: [R, C] local benefit rows (real columns only; ungated pairs carry
    -inf); ``sink_value``: the reservation profit (-penalty) — an
    infinite-capacity pseudo-column at permanent price 0, absorbing rows
    whose best real surplus falls below it.  This replaces KM's explicit
    dummy rows/columns (ghicp_reg.cpp:348-365): thousands of *identical*
    dummy rows otherwise serialize the auction (every tied row bids the same
    column each round, one winner per round).

    state = (owner [C] global row id or -1, acol [R]: real col, _SINK, or
    -1 unassigned, p [C]).
    """
    owner, acol, p = state
    R, C = b.shape
    unassigned = acol < 0
    # Row-wise top-2 of (b - p): fused single-sweep Pallas kernel on TPU
    # (ghicp_tpu/ops/top2.py), argmax + masked re-max elsewhere (lax.top_k
    # lowers to a full sort on CPU and is much slower).
    from ghicp_tpu.ops.top2 import top2_rows
    use_pallas = jax.default_backend() == "tpu"
    v1, j1, v2 = top2_rows(b, p, use_pallas=use_pallas)
    # Rows whose best real surplus is below the outside option exit to the
    # sink once and for all (prices start at 0 and only rise, so v1 only
    # falls — with fresh prices the decision is final-safe).
    to_sink = unassigned & (v1 <= sink_value - sink_slack)
    acol = jnp.where(to_sink, _SINK, acol)
    bidding = unassigned & ~to_sink
    # Second-best includes the ever-available sink.
    v2 = jnp.maximum(v2, sink_value)
    bid = p[j1] + v1 - v2 + eps
    bid = jnp.where(bidding, bid, _NEG)
    # Local per-column best bid, then global resolution over the mesh axis.
    win_bid = jnp.full((C,), _NEG, jnp.float32).at[j1].max(bid)
    win_bid = comm.pmax(win_bid)
    is_best = bidding & (bid == win_bid[j1]) & (win_bid[j1] > _NEG)
    winner = jnp.full((C,), -1, jnp.int32).at[j1].max(
        jnp.where(is_best, row_gid, -1))
    winner = comm.pmax(winner)
    has_winner = winner >= 0
    # Previous owners of re-auctioned columns become unassigned; all ids are
    # global — each device updates only its local rows via offset mapping.
    offset = row_gid[0]
    evicted_local = jnp.where(has_winner & (owner >= 0), owner - offset, R)
    evicted_local = jnp.where((evicted_local >= 0) & (evicted_local < R),
                              evicted_local, R)
    acol = acol.at[evicted_local].set(-1, mode="drop")
    taken_local = jnp.where(has_winner, winner - offset, R)
    taken_local = jnp.where((taken_local >= 0) & (taken_local < R),
                            taken_local, R)
    acol = acol.at[taken_local].set(jnp.arange(C, dtype=jnp.int32),
                                    mode="drop")
    owner = jnp.where(has_winner, winner, owner)
    p = jnp.where(has_winner, win_bid, p)
    return owner, acol, p


def _run_phase(b: Array, eps: Array, sink_value: Array, state,
               row_gid: Array, rounds_start, max_rounds, comm: Comm):
    """Bid until every row is assigned (to a column or the sink).

    ``rounds_start``/``max_rounds`` implement a TOTAL rounds budget across
    all epsilon phases — one registration iteration is then bounded by
    ``max_rounds`` full-matrix sweeps no matter how degenerate the cost
    matrix gets (rows still unassigned at the cap are reported unmatched,
    which downstream treats like KM's dummy matches).  Epsilon ESCALATES
    geometrically past a quarter of the remaining budget, mirroring the
    GS kernel's schedule (ops/auction_rounds.py::sweep_eps): sink-eviction
    endgames otherwise need price mass ~spread at fixed eps — thousands
    of rounds — and everything falls to greedy completion (duplicate
    columns) at the cap.  Returns the terminal escalated epsilon so
    callers bound the price overshoot correctly."""
    remaining = jnp.maximum(max_rounds - rounds_start, 1)
    esc_after = jnp.maximum(remaining // 4, 1)
    esc_period = jnp.maximum(remaining // 16, 1)

    def esc_eps(r):
        return eps * jnp.exp2(
            jnp.maximum(r - rounds_start - esc_after, 0).astype(jnp.float32)
            / esc_period.astype(jnp.float32))

    def cond(c):
        (_, acol, _), r = c
        any_unassigned = comm.psum(jnp.sum((acol < 0).astype(jnp.int32)))
        return (any_unassigned > 0) & (r < max_rounds)

    def body(c):
        st, r = c
        st = _bidding_round(b, esc_eps(r + 1), sink_value, jnp.float32(0.0),
                            row_gid, st, comm)
        return st, r + 1

    (owner, acol, p), r = jax.lax.while_loop(
        cond, body, (state, rounds_start))
    return owner, acol, p, r, esc_eps(r)


def auction_assign(b: Array, sink_value, eps, max_rounds,
                   comm: Comm = LOCAL, row_offset=None,
                   eps_scaling: float = 5.0, rel_eps: float = 0.0,
                   p0: Optional[Array] = None, price_uncertainty=None,
                   use_round_kernel: bool = False, n_phases: int = 4,
                   b_max: Optional[Array] = None,
                   acol0: Optional[Array] = None,
                   hint_v1: Optional[Array] = None,
                   hint_vsel: Optional[Array] = None,
                   keep_slack_extra=None):
    """Assignment on a benefit matrix b [R, C] (maximization) with an
    outside option at ``sink_value`` per row, via epsilon scaling with
    *kept assignments*.

    A fixed small epsilon makes price wars crawl (rounds ~ spread/eps, tens
    of thousands at TLS scale), while classic scaling-with-reset is unsound
    against a fixed-price outside option (inherited overshoot falsely sinks
    rows).  The sound middle road: between phases keep (owner, acol, p) and
    unassign only the rows whose epsilon-complementary-slackness is violated
    at the new epsilon — prices stay monotone, the sink decision is always
    made against live competition, and the final phase enforces eps-CS at
    ``eps`` globally, giving the usual n*eps optimality bound (observed
    exact vs Hungarian in the test matrices).

    ``p0``/``price_uncertainty`` warm-start the dual: ``p0`` is a price
    vector from a *similar* problem (GH-ICP: the previous engine iteration,
    whose keypoints moved by millimeters late in the run) and
    ``price_uncertainty`` D bounds the per-entry benefit drift since.  The
    start prices are ``max(p0 - D, 0)`` — under-pricing only costs extra
    bidding rounds, while over-priced columns would wrongly push rows to
    the fixed-price sink, so the deflation must dominate the drift.  The
    epsilon schedule then starts at ~D instead of spread/8: with
    near-equilibrium prices the expensive tie-resolving price wars of
    earlier solves are already encoded in ``p0`` and do not repeat.  Cold
    start = p0 zeros with infinite uncertainty (the default).

    ``hint_v1``/``hint_vsel`` [R] (optional, with ``acol0``): precomputed
    warm-start CS quantities — v1 an UPPER bound on max_j(b_j - p_init_j)
    and vsel a LOWER bound on the kept column's (b - p_init) — typically
    emitted by the fused benefit kernel in the same sweep that builds ``b``
    (ops/cost_kernel.py), saving the keep test's full-matrix pass here.
    Conservative bounds only release extra rows (they re-bid normally), so
    the n*eps optimality bound is preserved.

    ``rel_eps`` (when > 0) floors the final epsilon at
    ``rel_eps * spread``: the assignment is then within ``n * rel_eps *
    spread`` of optimal — a *relative* tolerance that is what actually
    matters for cost matrices whose value quantum scales with their spread.
    The crucial case is GH-ICP's first iterations, where the cost is
    (almost) pure Hamming feature distance — integer-valued with massive
    ties, spread O(100).  An absolute eps of 0.01 there buys no matching
    quality (ties are ties) but makes every tie cluster fight a
    ~(quantum/eps)-round price war; a spread-relative eps collapses those
    wars to a handful of rounds.  As ED takes over and the spread shrinks
    toward convergence, the floor automatically tightens below ``eps``.

    Returns (acol [R]: assigned column, _SINK for unmatched, or -1 at round
    cap; prices [C]; rounds).

    """
    R, C = b.shape
    if row_offset is None:
        row_offset = comm.axis_index() * R
    row_gid = row_offset + jnp.arange(R, dtype=jnp.int32)
    if b_max is None:
        # One full-matrix pass; callers with fused cost stats pass b_max in.
        b_max = comm.pmax(jnp.max(jnp.where(jnp.isfinite(b), b, _NEG)))
    finite_max = jnp.asarray(b_max, jnp.float32)
    spread = jnp.maximum(finite_max - jnp.float32(sink_value), 0.0)
    eps_final = jnp.maximum(jnp.float32(eps), jnp.float32(rel_eps) * spread)
    if n_phases <= 1:
        # single-phase: bid at the final epsilon directly
        cold_eps0 = eps_final
    else:
        cold_eps0 = jnp.maximum(spread / 8.0, eps_final)
    if p0 is None:
        eps0 = cold_eps0
        p_init = jnp.zeros((C,), jnp.float32)
    else:
        # price_uncertainty may be a PER-COLUMN vector [C] (the engine's
        # re-certification scheme: columns won last solve carry the eps
        # overshoot, untouched-but-certified columns only the keep slack)
        # or a scalar (legacy).  The bidding-start epsilon heuristic uses
        # its max.
        d = jnp.asarray(price_uncertainty, jnp.float32)
        eps0 = jnp.clip(jnp.max(d), eps_final, cold_eps0)
        p_init = jnp.maximum(p0 - d, 0.0)

    rows = jnp.arange(R)
    if acol0 is None:
        owner_init = jnp.full((C,), -1, jnp.int32)
        acol_init = jnp.full((R,), -1, jnp.int32)
    else:
        # --- Assignment warm start -------------------------------------
        # The dominant per-solve cost is the first bidding sweep: EVERY row
        # computes a full top-2 (~12 VPU passes over [R, C]).  But across
        # GH-ICP iterations the matching barely changes late in the run —
        # so keep the previous assignment wherever epsilon-complementary-
        # slackness still holds under the NEW benefits and the deflated
        # prices (one max-pass + gathers), and let the auction re-bid only
        # the violators.  Kept rows satisfy eps0-CS by the test; re-bid
        # rows by the auction invariant — the combined assignment carries
        # the same n*eps optimality bound as a cold solve.
        real0 = (acol0 >= 0) & (acol0 < C)
        jc0 = jnp.where(real0, acol0, 0)
        # Rebuild column owners (greedy-completed rows may duplicate a
        # column: max-scatter keeps one, the loser reopens).
        owner_init = jnp.full((C,), -1, jnp.int32).at[
            jnp.where(real0, acol0, C)].max(
                jnp.where(real0, row_gid, -1), mode="drop")
        owner_init = comm.pmax(owner_init)
        # Reverse-auction zeroing: a price is only meaningful while an
        # owner supports it; stale prices on unowned columns would push
        # bidders to the fixed-price sink.
        p_init = jnp.where(owner_init >= 0, p_init, 0.0)
        if hint_v1 is not None:
            v1 = hint_v1
            vsel = hint_vsel
        else:
            v1 = jnp.max(b.astype(jnp.float32) - p_init[None, :], axis=1)
            vsel = b[rows, jc0].astype(jnp.float32) - p_init[jc0]
        # Keep slack: the CS certification tolerance.  When the caller
        # supplies ``keep_slack_extra`` (the penalty drift dpen), the
        # slack is the stream-lane form dpen + 2*eps_final, upper-bounded
        # by spread/8 — NOT by cold_eps0, which equals eps_final in
        # single-phase mode and silently collapsed the slack BELOW the
        # solve's own escalated terminal epsilon (~2*eps_final at a
        # 2-sweep budget): assignments the previous solve certified at
        # 2*eps were then re-tested against a 1*eps slack and ~20-30% of
        # all rows mass-released every iteration by construction.  The
        # re-certification scheme records this (small) value as the kept
        # columns' price uncertainty instead of the drift-sized eps0,
        # which would spiral.  Legacy callers (None) keep the eps0 slack.
        if keep_slack_extra is not None:
            eps_keep = jnp.clip(jnp.asarray(keep_slack_extra, jnp.float32)
                                + 2.0 * eps_final, eps_final,
                                jnp.maximum(spread / 8.0, eps_final))
        else:
            eps_keep = eps0
        own_ok = real0 & (owner_init[jc0] == row_gid)
        keep = own_ok & (vsel >= v1 - eps_keep)
        stay_sunk = ((acol0 == _SINK)
                     & (jnp.float32(sink_value) >= v1 - eps_keep))
        # CS violators release their columns (prices stay — they were bid-
        # supported a moment ago and are deflated by the drift bound).
        rel = own_ok & ~keep
        owner_init = owner_init.at[jnp.where(rel, acol0, C)].set(
            -1, mode="drop")
        owner_init = comm.pmin(owner_init)
        acol_init = jnp.where(keep, acol0,
                              jnp.where(stay_sunk, _SINK, -1))

    def reopen_violators(st, eps_prev, eps_now):
        """Deflate the systematic +eps bid overshoot, then unassign rows
        violating eps-CS at the tightened epsilon.

        Every winning bid prices its column eps above the margin-supported
        dual; against a *fixed-price* outside option that overshoot
        systematically favors the sink once epsilon tightens.  Rolling all
        prices back by the epsilon delta cancels it (relative column order
        is unchanged; under-pricing only causes extra bidding next phase).
        """
        owner, acol, p = st
        p = jnp.maximum(p - (eps_prev - eps_now), 0.0)
        rows = jnp.arange(R)

        def cs_ok(p_now):
            # v1 as a pure reduce over (b - p): XLA fuses the subtract into
            # the reduction.  The assigned value comes from GATHERS on b and
            # p — indexing the fused expression would force the full [R, C]
            # f32 matrix to materialize in HBM (~256MB at 8k^2, measured
            # 1.8ms per pass).
            v1 = jnp.max(jnp.maximum(b.astype(jnp.float32) - p_now[None, :],
                                     jnp.float32(sink_value)), axis=1)
            cur = jnp.where((acol >= 0) & (acol < C), acol, 0)
            assigned_val = jnp.where(
                acol == _SINK, jnp.float32(sink_value),
                b[rows, cur].astype(jnp.float32) - p_now[cur])
            return (acol < 0) | (assigned_val >= v1 - eps_now)

        # Fixed point: find CS violators, unassign them AND free their
        # columns, zero unowned prices (a price is only meaningful while an
        # owner supports it — the reverse-auction role), and re-check: the
        # zeroed columns may create new violators.  Each sweep only frees
        # more, so this is monotone; 4 sweeps cover the cascades seen in
        # practice and correctness never depends on convergence (the next
        # bidding phase re-establishes CS for whatever remains open).
        # (A data-dependent early-exit while_loop here nests 4 deep inside
        # the engine loop and stalls the XLA:TPU compiler for minutes —
        # keep this a bounded fori_loop.)  Sweep 1 runs unconditionally;
        # the cascade sweeps 2-4 (each a full-matrix cs_ok pass, ~1ms at
        # TLS scale) run under a cond only when sweep 1 reopened rows —
        # near convergence nothing violates and the repair costs one pass.
        def sweep(_, st2):
            owner, acol, p = st2
            ok = cs_ok(p)
            reopened_col = jnp.where(~ok & (acol >= 0) & (acol < C),
                                     acol, C)
            owner = owner.at[reopened_col].set(-1, mode="drop")
            owner = comm.pmin(owner)
            acol = jnp.where(ok, acol, -1)
            p = jnp.where(owner < 0, 0.0, p)
            return owner, acol, p

        st1 = sweep(0, (owner, acol, p))
        any_reopened = comm.psum(jnp.sum(
            ((st1[1] == -1) & (acol != -1)).astype(jnp.int32))) > 0
        owner, acol, p = jax.lax.cond(
            any_reopened,
            lambda s: jax.lax.fori_loop(1, 4, sweep, s),
            lambda s: s, st1)
        return owner, acol, p

    def _punc(p_final, eps_bound):
        """Per-column price uncertainty at return (re-certification): a
        price CHANGED this solve was auction-set (CS-supported + at most
        the escalated-eps overshoot -> 2*eps_bound, keeping the legacy
        safety factor); an unchanged price was either re-certified by this
        solve's keep test (its slack) or is zero/unowned.  Returned so the
        caller can deflate each column by ITS OWN staleness next time —
        the scalar scheme deflated every column by the worst case every
        iteration, monotonically leaking prices toward zero on warm
        streaks (kept columns never re-bid, so nothing restored them) and
        the warm-start keep test then never engaged."""
        cert = eps_keep if acol0 is not None else jnp.float32(0.0)
        return jnp.where(p_final != p_init, 2.0 * eps_bound, cert)

    # Row-tile height: the kernel's VMEM footprint is ~5 x ts x C x 4B
    # (double-buffered benefit stripe + the [ts, C] f32 round intermediates)
    # against the raised scoped-VMEM budget — shrink ts as columns grow.
    # ts=256 fits C=8192 (~56MB of 128MB physical); each doubling of C
    # halves ts.  Fewer, taller tiles matter because the per-tile-visit
    # scalar overhead (active-list build, DMA bookkeeping) dominates late
    # sweeps, not the VPU passes.
    ts = _gs_ts(C)
    if (use_round_kernel and comm.distributed
            and (jax.default_backend() == "tpu" or _KERNEL_INTERPRET)
            and R % ts == 0 and R % 128 == 0 and C % 128 == 0
            and ts * C <= 256 * 8192 and n_phases == 1):
        # --- sharded GS: per-device whole-sweep kernels, mesh-boundary
        # price/winner reconciliation (VERDICT r3 task 2a) -------------
        # Each device runs ONE Gauss-Seidel sweep of the GS kernel over
        # its LOCAL benefit rows (in-VMEM bid/resolve batches see fresh
        # LOCAL prices), then the devices reconcile: every column goes to
        # the globally highest price (pmax), losers of cross-device
        # conflicts reopen and re-bid next sweep.  Prices only rise and
        # winners pay their own bids, so this is the asynchronous auction
        # with delayed cross-device price information — same eps-CS
        # terminal guarantee, only the trajectory differs from the
        # single-device kernel.  Epsilon escalates across sweeps in XLA
        # (the in-kernel escalator is per-launch).
        from ghicp_tpu.ops.auction_rounds import auction_phase_gs_pallas
        SENT = jnp.int32(R)            # foreign-owner sentinel (>= R local)
        offset = row_gid[0]
        col_ids = jnp.arange(C, dtype=jnp.int32)
        esc_after_d = jnp.maximum(jnp.asarray(max_rounds, jnp.int32) // 4,
                                  1)
        esc_period_d = jnp.maximum(jnp.asarray(max_rounds, jnp.int32) // 16,
                                   1)

        def _esc_d(r):
            return eps_final * jnp.exp2(
                jnp.maximum(r - esc_after_d, 0).astype(jnp.float32)
                / esc_period_d.astype(jnp.float32))

        def cond_d(c):
            owner_g, acol, p, r = c
            n_open = comm.psum(jnp.sum((acol == -1).astype(jnp.int32)))
            return (n_open > 0) & (r < max_rounds)

        def body_d(c):
            owner_g, acol, p, r = c
            mine = ((owner_g >= offset) & (owner_g < offset + R))
            owner_l = jnp.where(mine, owner_g - offset,
                                jnp.where(owner_g >= 0, SENT, -1))
            sunk_l = (acol == _SINK).astype(jnp.int32)
            open_l = (acol == -1).astype(jnp.int32)
            p2, owner_o, sunk_o, _rk, _g = auction_phase_gs_pallas(
                b, p, owner_l, sunk_l, open_l, _esc_d(r + 1),
                jnp.float32(sink_value), jnp.int32(1), ts=ts, inner_cap=1,
                esc_after=jnp.int32(0), esc_period=jnp.int32(1),
                complete_open=0, interpret=_KERNEL_INTERPRET)
            # Local winners -> global candidates; reconcile on price.
            won_l = (owner_o >= 0) & (owner_o < R)
            cand_gid = jnp.where(won_l & (p2 > p), owner_o + offset, -1)
            win_p = comm.pmax(p2)
            winner = comm.pmax(jnp.where((p2 >= win_p) & (cand_gid >= 0),
                                         cand_gid, -1))
            changed = (win_p > p) & (winner >= 0)
            owner_g = jnp.where(changed, winner, owner_g)
            p_new = jnp.where(changed, win_p, p)
            # Rebuild local assignments from the reconciled owners; local
            # sink decisions are conflict-free (rows are device-local).
            acol_n = jnp.full((R,), -1, jnp.int32).at[
                jnp.where((owner_g >= offset) & (owner_g < offset + R),
                          owner_g - offset, R)].set(col_ids, mode="drop")
            acol_n = jnp.where((acol == _SINK) | (sunk_o == 1), _SINK,
                               acol_n)
            return owner_g, acol_n, p_new, r + 1

        owner_g0 = owner_init
        acol0_d = acol_init
        owner_g, acol_d, p_d, r_d = jax.lax.while_loop(
            cond_d, body_d, (owner_g0, acol0_d, p_init, jnp.int32(0)))
        return (acol_d, p_d, r_d, _esc_d(r_d),
                _punc(p_d, _esc_d(r_d)))
    if (use_round_kernel and not comm.distributed
            and (jax.default_backend() == "tpu" or _KERNEL_INTERPRET)
            and R % ts == 0 and R % 128 == 0 and C % 128 == 0
            and ts * C <= 256 * 8192):
        # Whole-phase Pallas kernel: every bidding round's state transition
        # happens in VMEM scratch, one launch per epsilon phase (see
        # ghicp_tpu/ops/auction_rounds.py), with an exact in-kernel
        # convergence test — a converged phase stops streaming the benefit
        # matrix immediately.  The TOTAL rounds budget is a runtime scalar
        # threaded through the phases: each phase may spend whatever the
        # earlier ones left (matching the XLA while-loop path's semantics,
        # not the old static even split).  Between phases the same CS
        # repair runs in XLA on the derived (owner, acol, p) state.
        from ghicp_tpu.ops.auction_rounds import auction_phase_gs_pallas
        col_ids = jnp.arange(C, dtype=jnp.int32)

        def derive_acol(owner, sunk):
            acol = jnp.full((R,), -1, jnp.int32)
            acol = acol.at[jnp.where(owner >= 0, owner, R)].set(
                col_ids, mode="drop")
            return jnp.where((sunk == 1) & (acol < 0), _SINK, acol)

        def _run_gs_phases(owner, acol_in, p):
            sunk = (acol_in == _SINK).astype(jnp.int32)
            open_ = (acol_in == -1).astype(jnp.int32)
            eps_now = eps0
            remaining = jnp.int32(max_rounds)
            spent = jnp.int32(0)
            esc_after = esc_period = jnp.int32(1)
            r = jnp.int32(0)
            # Geometric epsilon ladder from eps0 down to EXACTLY eps_final
            # in n_phases rungs.  (The XLA path's fixed /eps_scaling ladder
            # iterates until it reaches eps_final; a python-unrolled loop
            # must land there by construction, or the final assignment
            # carries a much looser epsilon bound than requested.)
            if n_phases > 1:
                ratio = jnp.minimum(
                    (eps_final / jnp.maximum(eps0, 1e-30))
                    ** (1.0 / (n_phases - 1)), 1.0)
            for k in range(n_phases):
                eps_now = (eps_final if k == n_phases - 1
                           else jnp.maximum(eps0 * ratio**k, eps_final))
                # Epsilon escalation from a quarter of this phase's budget:
                # cross-tile price wars otherwise burn the whole budget at
                # eps_final and the tail rows fall to flat greedy completion
                # at half-baked prices (measured: identity-start
                # trajectories then flip basins on a knife edge).
                # Escalating early/fast enough that the phase CONVERGES
                # within its budget keeps the price structure — late
                # assignments degrade geometrically instead.
                esc_after = jnp.maximum(remaining // 4, 1)
                esc_period = jnp.maximum(remaining // 16, 1)
                # inner_cap=1: tile-local quiescence OFF.  Measured on the
                # bench matrices: tie-heavy FD wars need ~1e5 bid exchanges
                # (~10us each) to true eps-CS convergence; grinding them
                # in-VMEM is 100x slower than the budget truncation +
                # greedy completion, which costs nothing measurable in pose
                # accuracy (NOTES.md).  The final phase greedy-completes
                # leftover open rows in-kernel (streams only still-open
                # tiles, usually none) so the caller's full-matrix
                # `complete` pass is skipped.
                p, owner, sunk, r, gcol = auction_phase_gs_pallas(
                    b, p, owner, sunk, open_, eps_now,
                    jnp.float32(sink_value),
                    remaining, ts=ts, inner_cap=1,
                    esc_after=esc_after, esc_period=esc_period,
                    complete_open=1 if k == n_phases - 1 else 0,
                    interpret=_KERNEL_INTERPRET)
                remaining = remaining - r
                spent = spent + r
                if k < n_phases - 1:
                    eps_next = jnp.maximum(eps0 * ratio**(k + 1), eps_final)
                    acol = derive_acol(owner, sunk)
                    # (An outer cond "skip repair when the ladder is flat"
                    # was measured SLOWER: the penalty drifts every
                    # iteration, so the ladder is almost always active and
                    # the cond only adds [R]-state copies.  The inner
                    # cascade cond in reopen_violators is the one that
                    # pays.)
                    owner, acol, p = reopen_violators((owner, acol, p),
                                                      eps_now, eps_next)
                    sunk = (acol == _SINK).astype(jnp.int32)
                    open_ = (acol == -1).astype(jnp.int32)
            acol = derive_acol(owner, sunk)
            # Merge the final phase's in-kernel greedy completion
            # (duplicates allowed, owners/prices untouched — same semantics
            # as the callers' XLA `complete` pass, which then sees no
            # leftovers and skips).
            acol = jnp.where((acol == -1) & (gcol >= 0),
                             jnp.where(gcol < C, gcol, _SINK), acol)
            # Price-overshoot bound for warm starts: a column won at sweep
            # r of the final phase carries up to the escalated epsilon of
            # that sweep.
            eps_bound = eps_final * jnp.exp2(
                jnp.maximum(r - esc_after, 0).astype(jnp.float32)
                / esc_period.astype(jnp.float32))
            return acol, p, spent, eps_bound

        acol_k, p_k, spent_k, epsb_k = _run_gs_phases(
            owner_init, acol_init, p_init)
        return acol_k, p_k, spent_k, epsb_k, _punc(p_k, epsb_k)

    def cond(c):
        return ~c[0]

    def body(c):
        done, eps_now, st, rounds, _ = c
        owner, acol, p, r, eps_term = _run_phase(
            b, eps_now, jnp.float32(sink_value), st, row_gid, rounds,
            max_rounds, comm)
        done = (eps_now <= eps_final * 1.0001) | (r >= max_rounds)
        eps_next = jnp.maximum(eps_now / eps_scaling, eps_final)
        # Reopen CS violators only when another phase will actually run —
        # the final phase's assignment must be returned intact (and the
        # repair's full-matrix sweeps skipped, via cond).
        st = jax.lax.cond(
            done, lambda s: s,
            lambda s: reopen_violators(s, eps_now, eps_next),
            (owner, acol, p))
        return done, eps_next, st, r, eps_term

    st0 = (owner_init, acol_init, p_init)
    _, _, (owner, acol, p), rounds, eps_term = jax.lax.while_loop(
        cond, body, (jnp.bool_(False), eps0, st0, jnp.int32(0), eps_final))
    # eps_term: the last phase's terminal (possibly escalated) epsilon —
    # the price-overshoot bound warm starts must deflate by.
    return acol, p, rounds, eps_term, _punc(p, eps_term)


@functools.partial(jax.jit, static_argnames=("eps_final",
                                             "comm", "total_rows", "rel_eps",
                                             "use_round_kernel", "n_phases"))
def auction_match_benefits(b: Array, penalty: Array,
                           mask_s: Array,
                           mask_t: Array, eps_final: float = 0.01,
                           max_rounds=8000, comm: Comm = LOCAL,
                           total_rows: int = None, rel_eps: float = 0.0,
                           p0: Optional[Array] = None,
                           price_uncertainty=None,
                           use_round_kernel: bool = False,
                           n_phases: int = 2,
                           b_max: Optional[Array] = None,
                           acol0: Optional[Array] = None,
                           hint_v1: Optional[Array] = None,
                           hint_vsel: Optional[Array] = None,
                           keep_slack_extra=None) -> AuctionResult:
    """Auction on a PREBUILT benefit matrix (e.g. from the fused cost
    kernel, ops/cost_kernel.py) — or MATRIX-FREE from ``factors``.

    ``b`` [S, T] (bf16 or f32): -CD at candidate pairs, very negative at
    masked pairs.  The penalty gate needs no mask tensor — KM's "pair is
    real iff CD < penalty" is exactly ``b > -penalty``, which the sink rule
    applies to every bid (a row bids j1 only while v1 > sink, and prices
    are nonnegative, so any bid target is gated) and the greedy completion
    to every leftover row.  Semantics otherwise identical to
    :func:`auction_match`.
    """
    S, T = b.shape
    rows_total = total_rows if total_rows is not None else S
    acol, p, rounds, eps_used, punc = auction_assign(
        b, -penalty, eps_final, max_rounds, comm, rel_eps=rel_eps,
        p0=p0, price_uncertainty=price_uncertainty,
        use_round_kernel=use_round_kernel, n_phases=n_phases, b_max=b_max,
        acol0=acol0, hint_v1=hint_v1, hint_vsel=hint_vsel,
        keep_slack_extra=keep_slack_extra)
    # Greedy completion at budget exhaustion (see auction_match) — under a
    # cond: when the auction converged (no -1 rows, the common case with
    # in-kernel epsilon escalation) the full-matrix top-1 pass is skipped.
    leftover = acol == -1

    def complete(acol):
        # argmax-then-gather: a max+argmax pair over the same (b - p)
        # expression makes XLA materialize the full f32 matrix; a single
        # argmax reduce fuses, and the max value comes from gathers.
        j1 = jnp.argmax(b.astype(jnp.float32) - p[None, :],
                        axis=1).astype(jnp.int32)
        v1 = b[jnp.arange(S), j1].astype(jnp.float32) - p[j1]
        return jnp.where(leftover, jnp.where(v1 > -penalty, j1, _SINK), acol)

    acol = jax.lax.cond(jnp.any(leftover), complete, lambda a: a, acol)
    matched = (acol >= 0) & (acol < T)
    jc = jnp.where(matched, acol, 0)
    rows = jnp.arange(S)
    bsel = b[rows, jc].astype(jnp.float32)
    real = mask_s & matched & (bsel > -penalty)
    w = real.astype(jnp.float32)
    cor = comm.psum(jnp.sum(w))
    matched_cd = comm.psum(jnp.sum(jnp.where(real, -bsel, 0.0)))
    n_sq = jnp.float32(max(rows_total, T))
    energy = matched_cd + penalty * (n_sq - cor)
    match = MatchResult(tgt_idx=jc.astype(jnp.int32), w=w,
                        n_matches=cor.astype(jnp.int32))
    return AuctionResult(match=match, prices=p, energy=energy, rounds=rounds,
                         eps_used=eps_used, acol=acol, cd_sel=-bsel,
                         punc=punc)


@functools.partial(jax.jit, static_argnames=("eps_final",
                                             "comm", "total_rows", "rel_eps",
                                             "quantize_bf16",
                                             "use_round_kernel", "n_phases"))
def auction_match(cd: Array, penalty: Array, mask_s: Array, mask_t: Array,
                  eps_final: float = 0.01, max_rounds=8000,
                  comm: Comm = LOCAL, total_rows: int = None,
                  rel_eps: float = 0.0, p0: Optional[Array] = None,
                  price_uncertainty=None,
                  quantize_bf16: bool = False,
                  use_round_kernel: bool = False,
                  n_phases: int = 4,
                  acol0: Optional[Array] = None,
                  keep_slack_extra=None) -> AuctionResult:
    """Global-optimal correspondence via auction (KM equivalent).

    cd: [S, T] blended cost (+inf at invalid pairs); S may be a local row
    shard when ``comm`` is distributed.  KM's dummy padding
    (ghicp_reg.cpp:348-365: every non-gated pair worth exactly -penalty,
    a pair is real iff its weight beats that) is equivalent to matching
    with an *outside option*: maximize sum of matched (penalty - CD) over
    gated pairs, rows free to stay unmatched.  The auction therefore runs
    on the real [S, T] benefits with a -penalty reservation sink — same
    optimal real-match set as the reference's square problem, none of its
    dummy-row thrash.  Returned matches are the *real* pairs
    (km.cpp:144-233 output semantics).
    """
    S, T = cd.shape
    rows_total = total_rows if total_rows is not None else S
    gate = jnp.isfinite(cd) & (cd < penalty)
    b = jnp.where(gate, -cd, _NEG)
    if quantize_bf16:
        # Halve the per-round HBM sweep: store benefits bf16, compute f32.
        # The ~2^-8 relative quantization is far below the rel_eps floor
        # (spread/64) and the costs' own quantum (integer Hamming early,
        # keypoint-spacing ED margins late), so it perturbs the epsilon-
        # optimal matching by less than the epsilon already tolerated.
        b = b.astype(jnp.bfloat16)

    acol, p, rounds, eps_used, punc = auction_assign(
        b, -penalty, eps_final, max_rounds, comm, rel_eps=rel_eps,
        p0=p0, price_uncertainty=price_uncertainty,
        use_round_kernel=use_round_kernel, n_phases=n_phases, acol0=acol0,
        keep_slack_extra=keep_slack_extra)
    # Greedy completion at budget exhaustion: rows still unassigned when the
    # TOTAL rounds budget binds (acol == -1) take their best column at the
    # current prices (duplicates allowed), or the sink if the sink rule says
    # so.  Without this, budget exhaustion silently drops thousands of rows
    # from the correspondence set, the SVD step is estimated from a sparse
    # biased subset, the pose jumps, and the next iteration's warm-started
    # prices are cold again — a feedback loop that makes the whole engine
    # trajectory chaotic (observed: cor oscillating 5700 <-> 200 at 6k
    # keypoints with every late iteration hitting the budget).  One extra
    # top-1 sweep; exact one-to-one still holds for every row the auction
    # itself assigned.
    leftover = acol == -1

    def complete(acol):
        j1 = jnp.argmax(jnp.where(gate, b.astype(jnp.float32) - p[None, :],
                                  _NEG), axis=1).astype(jnp.int32)
        rr = jnp.arange(S)
        v1 = jnp.where(gate[rr, j1],
                       b[rr, j1].astype(jnp.float32) - p[j1], _NEG)
        return jnp.where(leftover, jnp.where(v1 > -penalty, j1, _SINK), acol)

    acol = jax.lax.cond(jnp.any(leftover), complete, lambda a: a, acol)
    matched = (acol >= 0) & (acol < T)
    jc = jnp.where(matched, acol, 0)
    cd_sel = cd[jnp.arange(S), jc]
    real = mask_s & matched & gate[jnp.arange(S), jc]
    w = real.astype(jnp.float32)
    cor = comm.psum(jnp.sum(w))
    matched_cd = comm.psum(jnp.sum(jnp.where(real, cd_sel, 0.0)))
    # Energy bookkeeping on the reference's square problem of size
    # n = max(total_rows, T) (km.cpp:128-141).
    n_sq = jnp.float32(max(rows_total, T))
    energy = matched_cd + penalty * (n_sq - cor)
    match = MatchResult(tgt_idx=jc.astype(jnp.int32), w=w,
                        n_matches=cor.astype(jnp.int32))
    return AuctionResult(match=match, prices=p, energy=energy, rounds=rounds,
                         eps_used=eps_used, acol=acol, cd_sel=cd_sel,
                         punc=punc)
