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
from typing import NamedTuple

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


def _bidding_round(b: Array, eps: Array, row_gid: Array, state, comm: Comm):
    """One synchronous bidding round.

    b: [R, C] local benefit rows; row_gid: [R] global row ids; state =
    (owner [C] global row id or -1, acol [R] assigned col or -1, p [C]).
    """
    owner, acol, p = state
    R, C = b.shape
    unassigned = acol < 0
    v = b - p[None, :]
    # Row top-2 via argmax + masked re-max (lax.top_k lowers to a full sort
    # on CPU and is much slower).
    j1 = jnp.argmax(v, axis=1).astype(jnp.int32)
    v1 = jnp.take_along_axis(v, j1[:, None], axis=1)[:, 0]
    cols = jnp.arange(C, dtype=jnp.int32)
    v2 = jnp.max(jnp.where(cols[None, :] == j1[:, None], _NEG, v), axis=1)
    bid = p[j1] + v1 - v2 + eps
    bid = jnp.where(unassigned, bid, _NEG)
    # Local per-column best bid, then global resolution over the mesh axis.
    win_bid = jnp.full((C,), _NEG, jnp.float32).at[j1].max(bid)
    win_bid = comm.pmax(win_bid)
    is_best = unassigned & (bid == win_bid[j1]) & (win_bid[j1] > _NEG)
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


def _run_phase(b: Array, eps: Array, p: Array, row_gid: Array,
               max_rounds: int, comm: Comm):
    R, C = b.shape
    owner = jnp.full((C,), -1, jnp.int32)
    acol = jnp.full((R,), -1, jnp.int32)

    def cond(c):
        _, acol, _, r = c
        any_unassigned = comm.psum(jnp.sum((acol < 0).astype(jnp.int32)))
        return (any_unassigned > 0) & (r < max_rounds)

    def body(c):
        owner, acol, p, r = c
        owner, acol, p = _bidding_round(b, eps, row_gid,
                                        (owner, acol, p), comm)
        return owner, acol, p, r + 1

    owner, acol, p, r = jax.lax.while_loop(
        cond, body, (owner, acol, p, jnp.int32(0)))
    return owner, acol, p, r


def auction_assign(b: Array, eps_final, eps_scaling: float, max_rounds: int,
                   comm: Comm = LOCAL, row_offset=None):
    """Core assignment on a benefit matrix b [R, C] (maximization).

    Returns (acol [R] assigned column per row (-1 if unassigned at round
    cap), prices [C], rounds).  Requires global rows <= C.
    """
    R, C = b.shape
    if row_offset is None:
        row_offset = comm.axis_index() * R
    row_gid = row_offset + jnp.arange(R, dtype=jnp.int32)

    eps_final_arr = jnp.float32(eps_final)
    spread = comm.pmax(jnp.maximum(jnp.max(b) - jnp.min(b), 0.0))
    eps0 = jnp.maximum(spread * 0.5, eps_final_arr)

    def cond(c):
        return ~c[0]

    def body(c):
        done, eps, p, acol, rounds = c
        _, acol, p, r = _run_phase(b, eps, p, row_gid, max_rounds, comm)
        done = eps <= eps_final_arr * 1.0001
        eps = jnp.maximum(eps / eps_scaling, eps_final_arr)
        return done, eps, p, acol, rounds + r

    p0 = jnp.zeros((C,), jnp.float32)
    ac0 = jnp.full((R,), -1, jnp.int32)
    _, _, p, acol, rounds = jax.lax.while_loop(
        cond, body, (jnp.bool_(False), eps0, p0, ac0, jnp.int32(0)))
    return acol, p, rounds


@functools.partial(jax.jit, static_argnames=("eps_final", "eps_scaling",
                                             "max_rounds", "comm",
                                             "total_rows"))
def auction_match(cd: Array, penalty: Array, mask_s: Array, mask_t: Array,
                  eps_final: float = 0.01, eps_scaling: float = 4.0,
                  max_rounds: int = 4000, comm: Comm = LOCAL,
                  total_rows: int = None) -> AuctionResult:
    """Global-optimal correspondence via auction (KM equivalent).

    cd: [S, T] blended cost (+inf at invalid pairs); S may be a local row
    shard when ``comm`` is distributed.  Matching is over the padded
    *square* problem (dummy rows/columns at -penalty, km.cpp padding
    semantics): forward auction's epsilon-optimality guarantee needs
    rows == columns, and extra all-dummy rows/columns never change the
    optimal real-match set.  Returned matches are the *real* pairs
    (CD < penalty), KM's output semantics (km.cpp:144-233).
    """
    S, T = cd.shape
    rows_total = total_rows if total_rows is not None else S
    n_dev = max(rows_total // S, 1)
    # Square up: every device hosts an equal slice of the dummy rows.
    extra = max(T - rows_total, 0)
    pad_local = -(-extra // n_dev)
    R = S + pad_local
    C = max(rows_total + pad_local * n_dev, T)
    gate = jnp.isfinite(cd) & (cd < penalty)
    b = jnp.full((R, C), 0.0, jnp.float32) - penalty
    b = b.at[:S, :T].set(jnp.where(gate, -cd, -penalty))

    acol, p, rounds = auction_assign(b, eps_final, eps_scaling, max_rounds,
                                     comm)
    acol = acol[:S]
    jc = jnp.clip(acol, 0, T - 1)
    real = (mask_s & (acol >= 0) & (acol < T)
            & gate[jnp.arange(S), jc])
    w = real.astype(jnp.float32)
    cor = comm.psum(jnp.sum(w))
    matched_cd = comm.psum(
        jnp.sum(jnp.where(real, cd[jnp.arange(S), jc], 0.0)))
    energy = matched_cd + penalty * (C - cor)
    match = MatchResult(tgt_idx=jc.astype(jnp.int32), w=w,
                        n_matches=cor.astype(jnp.int32))
    return AuctionResult(match=match, prices=p, energy=energy, rounds=rounds)
