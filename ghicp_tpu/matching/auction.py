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

Bertsekas' auction algorithm computes the same matching to within n*eps of
optimal, but every step is a dense parallel reduction — exactly what the TPU
wants:

  each unassigned row bids for its best column: value v = b[i, :] - p,
  bid = p[j*] + v1 - v2 + eps (top-2 row reduction, VPU);
  every contested column goes to the highest bidder (scatter-max);
  prices rise monotonically; epsilon-scaling phases reuse prices.

Padding note: KM pads to n = max(n_s, n_t) with ``-penalty`` rows/columns.
Adding *extra* all-(-penalty) rows and columns (to our static capacities)
leaves the optimal real-match set unchanged: any perfect matching's total is
sum(real benefits) - penalty * (n - cor), so maximizing is equivalent to
maximizing sum(CD < penalty matches of benefit + penalty) independent of how
much dummy padding exists.  That lets the solver run at fixed shape.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ghicp_tpu.matching.matchers import MatchResult

Array = jax.Array

_NEG = jnp.float32(-3.0e38)


class AuctionResult(NamedTuple):
    match: MatchResult
    prices: Array      # [N] final dual prices
    energy: Array      # scalar: sum of matched CD + penalty * n_unmatched
    rounds: Array      # total bidding rounds executed


def _bidding_round(b: Array, eps: Array, state):
    owner, acol, p = state
    n = b.shape[0]
    unassigned = acol < 0
    v = b - p[None, :]
    # Row top-2 via argmax + masked re-max: much faster than lax.top_k with
    # retained indices (XLA CPU lowers top_k to a full variadic sort).
    j1 = jnp.argmax(v, axis=1).astype(jnp.int32)
    v1 = jnp.take_along_axis(v, j1[:, None], axis=1)[:, 0]
    cols = jnp.arange(n, dtype=jnp.int32)
    v2 = jnp.max(jnp.where(cols[None, :] == j1[:, None], _NEG, v), axis=1)
    bid = p[j1] + v1 - v2 + eps
    bid = jnp.where(unassigned, bid, _NEG)
    # Column-wise highest bid (scatter-max), then the winning row.
    win_bid = jnp.full((n,), _NEG, jnp.float32).at[j1].max(bid)
    rows = jnp.arange(n, dtype=jnp.int32)
    is_best = unassigned & (bid == win_bid[j1]) & (win_bid[j1] > _NEG)
    winner = jnp.full((n,), -1, jnp.int32).at[j1].max(
        jnp.where(is_best, rows, -1))
    has_winner = winner >= 0
    # Previous owners of re-auctioned columns become unassigned.
    evicted = jnp.where(has_winner & (owner >= 0), owner, n)
    acol = acol.at[evicted].set(-1, mode="drop")
    taken = jnp.where(has_winner, winner, n)
    acol = acol.at[taken].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    owner = jnp.where(has_winner, winner, owner)
    p = jnp.where(has_winner, win_bid, p)
    return owner, acol, p


def _run_phase(b: Array, eps: Array, p: Array, max_rounds: int):
    n = b.shape[0]
    owner = jnp.full((n,), -1, jnp.int32)
    acol = jnp.full((n,), -1, jnp.int32)

    def cond(c):
        owner, acol, p, r = c
        return jnp.any(acol < 0) & (r < max_rounds)

    def body(c):
        owner, acol, p, r = c
        owner, acol, p = _bidding_round(b, eps, (owner, acol, p))
        return owner, acol, p, r + 1

    owner, acol, p, r = jax.lax.while_loop(
        cond, body, (owner, acol, p, jnp.int32(0)))
    return owner, acol, p, r


@functools.partial(jax.jit, static_argnames=("eps_scaling", "max_rounds",
                                             "use_scaling"))
def auction_match(cd: Array, penalty: Array, mask_s: Array, mask_t: Array,
                  eps_final: float = 0.01, eps_scaling: float = 4.0,
                  max_rounds: int = 4000,
                  use_scaling: bool = True) -> AuctionResult:
    """Global-optimal correspondence via auction (KM equivalent).

    cd: [S, T] blended cost with +inf at invalid pairs.  Returns matches for
    the square problem of size N = max(S, T), restricted to real pairs
    (CD < penalty), exactly KM's output semantics (km.cpp:144-233).
    """
    S, T = cd.shape
    N = max(S, T)
    gate = jnp.isfinite(cd) & (cd < penalty)
    b = jnp.full((N, N), 0.0, jnp.float32) - penalty
    b = b.at[:S, :T].set(jnp.where(gate, -cd, -penalty))

    eps_final_arr = jnp.float32(eps_final)
    if use_scaling:
        # Start eps at half the benefit spread (standard epsilon scaling).
        spread = jnp.maximum(penalty - jnp.min(jnp.where(gate, cd, penalty)),
                             eps_final_arr)
        eps0 = jnp.maximum(spread * 0.5, eps_final_arr)
    else:
        eps0 = eps_final_arr

    def cond(c):
        return ~c[0]

    def body(c):
        done, eps, p, owner, acol, rounds = c
        owner, acol, p, r = _run_phase(b, eps, p, max_rounds)
        done = eps <= eps_final_arr * 1.0001
        eps = jnp.maximum(eps / eps_scaling, eps_final_arr)
        return done, eps, p, owner, acol, rounds + r

    p0 = jnp.zeros((N,), jnp.float32)
    own0 = jnp.full((N,), -1, jnp.int32)
    ac0 = jnp.full((N,), -1, jnp.int32)
    _, _, p, owner, acol, rounds = jax.lax.while_loop(
        cond, body, (jnp.bool_(False), eps0, p0, own0, ac0, jnp.int32(0)))

    j = acol[:S]
    jc = jnp.clip(j, 0, T - 1)
    real = (mask_s & (j >= 0) & (j < T)
            & gate[jnp.arange(S), jc])
    w = real.astype(jnp.float32)
    cor = jnp.sum(w)
    matched_cd = jnp.sum(jnp.where(real, cd[jnp.arange(S), jc], 0.0))
    energy = matched_cd + penalty * (N - cor)
    match = MatchResult(tgt_idx=jc.astype(jnp.int32), w=w,
                        n_matches=cor.astype(jnp.int32))
    return AuctionResult(match=match, prices=p, energy=energy, rounds=rounds)
