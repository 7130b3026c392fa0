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


_SINK = jnp.int32(2**30)  # "unmatched" pseudo-column (infinite capacity)


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


def _run_phase(b: Array, eps: Array, sink_value: Array, sink_slack: Array,
               p: Array, row_gid: Array, max_rounds: int, comm: Comm):
    R, C = b.shape
    owner = jnp.full((C,), -1, jnp.int32)
    acol = jnp.full((R,), -1, jnp.int32)

    def cond(c):
        _, acol, _, r = c
        any_unassigned = comm.psum(jnp.sum((acol < 0).astype(jnp.int32)))
        return (any_unassigned > 0) & (r < max_rounds)

    def body(c):
        owner, acol, p, r = c
        owner, acol, p = _bidding_round(b, eps, sink_value, sink_slack,
                                        row_gid, (owner, acol, p), comm)
        return owner, acol, p, r + 1

    owner, acol, p, r = jax.lax.while_loop(
        cond, body, (owner, acol, p, jnp.int32(0)))
    return owner, acol, p, r


def auction_assign(b: Array, sink_value, eps, max_rounds: int,
                   comm: Comm = LOCAL, row_offset=None):
    """Core assignment on a benefit matrix b [R, C] (maximization) with an
    outside option at ``sink_value`` per row.

    Single-phase forward auction from zero prices.  With a fixed-price
    outside option, epsilon-scaling phase resets are unsound (inherited
    price overshoot pushes rows into the sink prematurely), and with real-
    valued costs the bid margins — not eps — dominate convergence, so a
    single phase at the final epsilon is both exact-at-eps and fast.

    Returns (acol [R]: assigned column, _SINK for unmatched, or -1 at round
    cap; prices [C]; rounds).
    """
    R, C = b.shape
    if row_offset is None:
        row_offset = comm.axis_index() * R
    row_gid = row_offset + jnp.arange(R, dtype=jnp.int32)
    p0 = jnp.zeros((C,), jnp.float32)
    _, acol, p, rounds = _run_phase(
        b, jnp.float32(eps), jnp.float32(sink_value), jnp.float32(0.0),
        p0, row_gid, max_rounds, comm)
    return acol, p, rounds


@functools.partial(jax.jit, static_argnames=("eps_final", "max_rounds",
                                             "comm", "total_rows"))
def auction_match(cd: Array, penalty: Array, mask_s: Array, mask_t: Array,
                  eps_final: float = 0.01, max_rounds: int = 8000,
                  comm: Comm = LOCAL,
                  total_rows: int = None) -> AuctionResult:
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

    acol, p, rounds = auction_assign(b, -penalty, eps_final, max_rounds,
                                     comm)
    matched = (acol >= 0) & (acol < T)
    jc = jnp.where(matched, acol, 0)
    real = mask_s & matched & gate[jnp.arange(S), jc]
    w = real.astype(jnp.float32)
    cor = comm.psum(jnp.sum(w))
    matched_cd = comm.psum(
        jnp.sum(jnp.where(real, cd[jnp.arange(S), jc], 0.0)))
    # Energy bookkeeping on the reference's square problem of size
    # n = max(total_rows, T) (km.cpp:128-141).
    n_sq = jnp.float32(max(rows_total, T))
    energy = matched_cd + penalty * (n_sq - cor)
    match = MatchResult(tgt_idx=jc.astype(jnp.int32), w=w,
                        n_matches=cor.astype(jnp.int32))
    return AuctionResult(match=match, prices=p, energy=energy, rounds=rounds)
