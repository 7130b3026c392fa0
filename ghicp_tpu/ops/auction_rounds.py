"""Whole-phase auction kernel: N bidding rounds in ONE Pallas launch.

The XLA formulation of a bidding round (ghicp_tpu/matching/auction.py)
chains ~15 small device ops around the top-2 sweep; at TLS scale the sweep
is ~0.2ms but the op chain costs ~0.6ms of fixed overhead — and a solve
runs hundreds of rounds.  This kernel keeps the entire auction state
(prices, column owners, sunk rows — ~100KB) in VMEM scratch across a
sequential grid of (round, row-tile) programs, so a whole epsilon phase is
one launch whose only HBM traffic is re-streaming the benefit matrix once
per round.

State representation: column ``owner`` pointers are authoritative — a row
is assigned iff some column points at it — which makes eviction *free*
(the winner overwrite disconnects the previous owner; it simply finds
itself unassigned on its next tile pass).  ``sunk`` marks rows that took
the outside option (permanent for the phase, like the XLA path).

Semantics per round (bit-compatible with ``auction._bidding_round`` for a
LOCAL comm, including the max-row-id tie break):
  unassigned rows compute (v1, j1, v2) over b - p;
  rows with v1 <= sink exit to the sink;
  the rest bid p[j1] + v1 - max(v2, sink) + eps on column j1;
  each column goes to the highest (bid, row-id) bidder; its price becomes
  the winning bid.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG = -3.0e38


def _kernel(eps_ref, sink_ref, b_ref, p0_ref, owner0_ref, sunk0_ref,
            p_out, owner_out, sunk_out,
            s_p, s_owner, s_sunk, s_winbid, s_wingid, *, ts: int):
    r = pl.program_id(0)
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    n_rounds = pl.num_programs(0)
    eps = eps_ref[0]
    sink = sink_ref[0]

    @pl.when((r == 0) & (i == 0))
    def _init():
        s_p[:] = p0_ref[0, :]
        s_owner[:] = owner0_ref[0, :]
        s_sunk[:, :] = sunk0_ref[:, :]

    @pl.when(i == 0)
    def _round_reset():
        s_winbid[:] = jnp.full_like(s_winbid[:], _NEG)
        s_wingid[:] = jnp.full_like(s_wingid[:], -1)

    C = b_ref.shape[1]
    gid = i * ts + jax.lax.broadcasted_iota(jnp.int32, (ts, 1), 0)[:, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (ts, C), 1)

    sunk_tile = s_sunk[i, :]
    owner = s_owner[:]
    owned = jnp.any(owner[None, :] == gid[:, None], axis=1)
    unassigned = (~owned) & (sunk_tile == 0)

    p = s_p[:]
    v = b_ref[:, :].astype(jnp.float32) - p[None, :]
    v1 = jnp.max(v, axis=1)
    j1 = jnp.argmax(v, axis=1).astype(jnp.int32)
    onehot = cols == j1[:, None]
    v2 = jnp.max(jnp.where(onehot, _NEG, v), axis=1)

    to_sink = unassigned & (v1 <= sink)
    s_sunk[i, :] = jnp.where(to_sink, jnp.int32(1), sunk_tile)
    bidding = unassigned & ~to_sink

    p_j1 = jnp.sum(jnp.where(onehot, p[None, :], 0.0), axis=1)
    bid = p_j1 + v1 - jnp.maximum(v2, sink) + eps
    contrib = jnp.where(onehot & bidding[:, None], bid[:, None],
                        jnp.float32(_NEG))                       # [ts, C]
    tile_max = jnp.max(contrib, axis=0)                          # [C]
    at_max = (contrib == tile_max[None, :]) & (contrib > _NEG / 2)
    tile_gid = jnp.max(jnp.where(at_max, gid[:, None], -1), axis=0)

    wb, wg = s_winbid[:], s_wingid[:]
    s_wingid[:] = jnp.where(tile_max > wb, tile_gid,
                            jnp.where(tile_max == wb,
                                      jnp.maximum(wg, tile_gid), wg))
    s_winbid[:] = jnp.maximum(wb, tile_max)

    @pl.when(i == n_tiles - 1)
    def _resolve():
        has = s_winbid[:] > _NEG / 2
        s_owner[:] = jnp.where(has, s_wingid[:], s_owner[:])
        s_p[:] = jnp.where(has, s_winbid[:], s_p[:])

        @pl.when(r == n_rounds - 1)
        def _emit():
            p_out[0, :] = s_p[:]
            owner_out[0, :] = s_owner[:]
            sunk_out[:, :] = s_sunk[:, :]


@functools.partial(jax.jit, static_argnames=("n_rounds", "ts", "interpret"))
def auction_rounds_pallas(b: Array, p0: Array, owner0: Array, sunk0: Array,
                          eps, sink_value, n_rounds: int, ts: int = 128,
                          interpret: bool = False):
    """Run ``n_rounds`` synchronous bidding rounds on-device.

    b: [S, C] benefits (f32 or bf16; -inf/very-negative = ungated pair),
    p0: [C] start prices, owner0: [C] global row id or -1,
    sunk0: [S] int32 (1 = row took the outside option).
    Returns (p [C], owner [C], sunk [S]).  S % ts == 0; C % 128 == 0.
    ts=128 keeps the [ts, C] f32 intermediates inside the 16MB VMEM stack
    at C=8192 (ts=256 OOMs).
    """
    S, C = b.shape
    grid = (n_rounds, S // ts)
    out = pl.pallas_call(
        functools.partial(_kernel, ts=ts),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # eps [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),    # sink [1]
            pl.BlockSpec((ts, C), lambda r, i: (i, 0),
                         memory_space=pltpu.VMEM),    # b row stripe
            pl.BlockSpec((1, C), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM),    # p0
            pl.BlockSpec((1, C), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM),    # owner0
            pl.BlockSpec((S // ts, ts), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM),    # sunk0 [tiles, ts]
        ],
        out_specs=(
            pl.BlockSpec((1, C), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S // ts, ts), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.int32),
            jax.ShapeDtypeStruct((S // ts, ts), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((C,), jnp.float32),         # prices
            pltpu.VMEM((C,), jnp.int32),           # owners
            pltpu.VMEM((S // ts, ts), jnp.int32),  # sunk, tile-major
            pltpu.VMEM((C,), jnp.float32),         # round win bid
            pltpu.VMEM((C,), jnp.int32),           # round win gid
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(jnp.asarray(eps, jnp.float32).reshape(1),
      jnp.asarray(sink_value, jnp.float32).reshape(1),
      b, p0.reshape(1, C), owner0.reshape(1, C),
      sunk0.reshape(S // ts, ts))
    return out[0][0], out[1][0], out[2].reshape(S)


def _phase_kernel(eps_ref, sink_ref, maxr_ref, b_ref, p0_ref, owner0_ref,
                  sunk0_ref, p_out, owner_out, sunk_out, rounds_out,
                  s_p, s_owner, s_sunk, s_tile, sems, *, ts: int):
    """Early-exit phase: while-loop over rounds inside ONE kernel program.

    The grid-based kernel above executes its full static round budget —
    converged rounds still stream the benefit matrix and run the bidding
    math.  Here the round loop is scalar-core control flow with an *exact*
    termination test (every row owned or sunk: owner pointers are unique,
    a row only bids while unassigned, so #assigned == #owned columns), and
    ``b`` stays in HBM with manual double-buffered stripe DMA — a converged
    solve costs zero streams.  ``max_rounds`` is a runtime scalar: phase
    budgets shrink as earlier phases spend rounds, with no recompiles.
    """
    n_tiles = s_sunk.shape[0]
    S = n_tiles * ts
    C = s_p.shape[0]
    eps = eps_ref[0]
    sink = sink_ref[0]
    max_rounds = maxr_ref[0]

    s_p[:] = p0_ref[0, :]
    s_owner[:] = owner0_ref[0, :]
    s_sunk[:, :] = sunk0_ref[:, :]

    def stripe_dma(i, slot):
        return pltpu.make_async_copy(
            b_ref.at[pl.ds(i * ts, ts), :], s_tile.at[slot], sems.at[slot])

    def unassigned_count():
        n_owned = jnp.sum((s_owner[:] >= 0).astype(jnp.int32))
        n_sunk = jnp.sum(s_sunk[:, :])
        return S - n_owned - n_sunk

    def tile_body(i, carry):
        winbid, wingid = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_tiles)
        def _prefetch():
            stripe_dma(i + 1, jax.lax.rem(i + 1, 2)).start()

        stripe_dma(i, slot).wait()

        gid = i * ts + jax.lax.broadcasted_iota(jnp.int32, (ts, 1), 0)[:, 0]
        cols = jax.lax.broadcasted_iota(jnp.int32, (ts, C), 1)
        sunk_tile = s_sunk[i, :]
        owner = s_owner[:]
        owned = jnp.any(owner[None, :] == gid[:, None], axis=1)
        unassigned = (~owned) & (sunk_tile == 0)

        p = s_p[:]
        v = s_tile[slot].astype(jnp.float32) - p[None, :]
        v1 = jnp.max(v, axis=1)
        j1 = jnp.argmax(v, axis=1).astype(jnp.int32)
        onehot = cols == j1[:, None]
        v2 = jnp.max(jnp.where(onehot, _NEG, v), axis=1)

        to_sink = unassigned & (v1 <= sink)
        s_sunk[i, :] = jnp.where(to_sink, jnp.int32(1), sunk_tile)
        bidding = unassigned & ~to_sink

        p_j1 = jnp.sum(jnp.where(onehot, p[None, :], 0.0), axis=1)
        bid = p_j1 + v1 - jnp.maximum(v2, sink) + eps
        contrib = jnp.where(onehot & bidding[:, None], bid[:, None],
                            jnp.float32(_NEG))
        tile_max = jnp.max(contrib, axis=0)
        at_max = (contrib == tile_max[None, :]) & (contrib > _NEG / 2)
        tile_gid = jnp.max(jnp.where(at_max, gid[:, None], -1), axis=0)

        new_gid = jnp.where(tile_max > winbid, tile_gid,
                            jnp.where(tile_max == winbid,
                                      jnp.maximum(wingid, tile_gid), wingid))
        return jnp.maximum(winbid, tile_max), new_gid

    def round_cond(carry):
        r, n_open = carry
        return (n_open > 0) & (r < max_rounds)

    def round_body(carry):
        r, _ = carry
        stripe_dma(0, 0).start()
        winbid0 = jnp.full((C,), _NEG, jnp.float32)
        wingid0 = jnp.full((C,), -1, jnp.int32)
        winbid, wingid = jax.lax.fori_loop(0, n_tiles, tile_body,
                                           (winbid0, wingid0))
        has = winbid > _NEG / 2
        s_owner[:] = jnp.where(has, wingid, s_owner[:])
        s_p[:] = jnp.where(has, winbid, s_p[:])
        return r + 1, unassigned_count()

    r, _ = jax.lax.while_loop(round_cond, round_body,
                              (jnp.int32(0), unassigned_count()))
    p_out[0, :] = s_p[:]
    owner_out[0, :] = s_owner[:]
    sunk_out[:, :] = s_sunk[:, :]
    rounds_out[0] = r


@functools.partial(jax.jit, static_argnames=("ts", "interpret"))
def auction_phase_pallas(b: Array, p0: Array, owner0: Array, sunk0: Array,
                         eps, sink_value, max_rounds, ts: int = 128,
                         interpret: bool = False):
    """Early-exit bidding phase: rounds until all rows assigned/sunk or the
    (runtime-scalar) ``max_rounds`` budget is spent.

    Same per-round semantics as :func:`auction_rounds_pallas`; returns
    (p [C], owner [C], sunk [S], rounds_executed []).  S % ts == 0;
    C % 128 == 0.  b may be bf16 (DMA'd as stored, computed in f32).
    """
    S, C = b.shape
    n_tiles = S // ts
    out = pl.pallas_call(
        functools.partial(_phase_kernel, ts=ts),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # eps [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),    # sink [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),    # max_rounds [1]
            pl.BlockSpec(memory_space=pl.ANY),        # b (HBM; manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # p0 [1, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # owner0 [1, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # sunk0 [tiles, ts]
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, ts), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((C,), jnp.float32),           # prices
            pltpu.VMEM((C,), jnp.int32),             # owners
            pltpu.VMEM((n_tiles, ts), jnp.int32),    # sunk, tile-major
            pltpu.VMEM((2, ts, C), b.dtype),         # stripe double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.asarray(eps, jnp.float32).reshape(1),
      jnp.asarray(sink_value, jnp.float32).reshape(1),
      jnp.asarray(max_rounds, jnp.int32).reshape(1),
      b, p0.reshape(1, C), owner0.reshape(1, C),
      sunk0.reshape(n_tiles, ts))
    return out[0][0], out[1][0], out[2].reshape(S), out[3][0]


def _gs_kernel(eps_ref, sink_ref, maxr_ref, esc_ref, comp_ref, b_ref, p0_ref,
               owner0_ref, sunk0_ref, open0_ref,
               p_out, owner_out, sunk_out, rounds_out, gcol_out,
               s_p, s_owner, s_sunk, s_open, s_tile, s_list, sems,
               *, ts: int, inner_cap: int):
    """Gauss-Seidel phase with tile-local quiescence.

    Differences from ``_phase_kernel`` (Jacobi):

    * prices/owners resolve after EVERY bid batch, so later bidders in the
      same sweep see fresh prices — asynchronous Gauss-Seidel auction; the
      eps-CS invariant per winning bid is order-independent (Bertsekas),
      only the trajectory changes, not the terminal guarantee;
    * **tile-local quiescence**: once a benefit stripe is DMA'd into VMEM,
      the tile's open rows bid/resolve REPEATEDLY (up to ``inner_cap``) until
      none remain open — intra-tile price wars run entirely in VMEM at
      microseconds per round instead of costing one full HBM sweep each.
      Cross-tile eviction chains advance every sweep;
    * an exact per-row ``open`` bitmap (unassigned & not sunk) is maintained
      by vector ops — winners/sunk close their own tile's lanes, eviction
      victims re-open via one small one-hot MXU matmul — so each sweep
      DMA-streams ONLY tiles that still have open rows (compacted into an
      SMEM list at sweep start).  Late sweeps (a handful of contested rows)
      cost a couple of stripe streams instead of S/ts.

    ``max_rounds`` caps and counts SWEEPS (same budget unit as the Jacobi
    kernel's full-matrix rounds; one sweep streams at most the whole
    matrix).  State invariant: open[i] == (no column's owner pointer
    targets i) and not sunk[i].  A row bids only while open; a winning bid
    closes the winner and re-opens the evicted previous owner (never itself
    a winner of the same resolve, since owners don't bid).
    """
    n_tiles = s_list.shape[0]
    C = s_p.shape[0]
    eps0 = eps_ref[0]
    sink = sink_ref[0]
    max_rounds = maxr_ref[0]
    esc_after = esc_ref[0]
    esc_period = esc_ref[1]

    s_p[:] = p0_ref[0, :]
    s_owner[:] = owner0_ref[0, :]
    s_sunk[:, :] = sunk0_ref[:, :]
    s_open[:, :] = open0_ref[:, :]

    def stripe_dma(t, slot):
        return pltpu.make_async_copy(
            b_ref.at[pl.ds(t * ts, ts), :], s_tile.at[slot], sems.at[slot])

    def sweep_eps(r):
        """Escalating epsilon: eps * 2^((r - esc_after)/esc_period) once the
        sweep index passes ``esc_after``.  Contested tail rows (the only
        ones still bidding late) then resolve with geometrically coarser
        margins — a graceful degradation toward greedy that terminates the
        cross-tile price wars, strictly better than hitting the budget cap
        and greedy-completing (the auction keeps resolving structure).
        esc_after = 0 disables (eps stays put)."""
        boost = jnp.where(
            esc_after > 0,
            jnp.exp2(jnp.maximum(r - esc_after, 0).astype(jnp.float32)
                     / jnp.maximum(esc_period, 1).astype(jnp.float32)),
            1.0)
        return eps0 * boost

    def build_active_list():
        def body(t, cnt):
            open_t = jnp.sum(s_open[t, :])

            @pl.when(open_t > 0)
            def _():
                s_list[cnt] = t
            return cnt + (open_t > 0).astype(jnp.int32)

        return jax.lax.fori_loop(0, n_tiles, body, jnp.int32(0))

    def bid_resolve(t, slot, eps):
        """One bid/resolve batch for tile t's open rows (stripe in VMEM)."""
        gid = t * ts + jax.lax.broadcasted_iota(jnp.int32, (ts, 1), 0)[:, 0]
        cols = jax.lax.broadcasted_iota(jnp.int32, (ts, C), 1)
        unassigned = s_open[t, :] > 0

        p = s_p[:]
        owner_prev = s_owner[:]
        v = s_tile[slot].astype(jnp.float32) - p[None, :]
        v1 = jnp.max(v, axis=1)
        j1 = jnp.argmax(v, axis=1).astype(jnp.int32)
        v2 = jnp.max(jnp.where(cols == j1[:, None], _NEG, v), axis=1)

        to_sink = unassigned & (v1 <= sink)
        bidding = unassigned & ~to_sink
        s_sunk[t, :] = jnp.where(to_sink, jnp.int32(1), s_sunk[t, :])
        s_open[t, :] = jnp.where(to_sink, jnp.int32(0), s_open[t, :])

        @pl.when(jnp.sum(bidding) > 0)
        def _resolve():
            # (onehot rebuilt here so no [ts, C] mask stays live across the
            # conditional — the 16MB scoped-VMEM stack is tight at C=8192.)
            onehot = cols == j1[:, None]
            # bid = p[j1] + delta; within a column all bidders share p[c],
            # so bids compare as deltas and the winning price is
            # p[c] + max delta.
            delta = v1 - jnp.maximum(v2, sink) + eps
            # (i1 vectors can't grow a minor dim in Mosaic — via int32.)
            bidding2d = bidding.astype(jnp.int32)[:, None] > 0
            contrib = jnp.where(onehot & bidding2d, delta[:, None],
                                jnp.float32(_NEG))                # [ts, C]
            dmax = jnp.max(contrib, axis=0)                       # [C]
            has = dmax > _NEG / 2
            # Winner per column: argmax over the tile axis (first max ==
            # LOWEST lane == lowest gid tie-break; the GS jnp reference
            # mirrors this).
            wlane = jnp.argmax(contrib, axis=0).astype(jnp.int32)  # [C]
            wingid = jnp.where(has, t * ts + wlane, -1)
            # One gather pass serves both the won test and the victim id:
            # pack (wingid+1, owner_prev+1) into one int32 per column.
            pw = (wingid + 1) * jnp.int32(1 << 14) + (owner_prev + 1)
            g = jnp.max(jnp.where(onehot, pw[None, :],
                                  jnp.int32(-1)), axis=1)         # [ts]
            won = bidding & ((g >> 14) - 1 == gid)
            vic = jnp.where(won, jax.lax.rem(g, jnp.int32(1 << 14)) - 1, -1)

            s_owner[:] = jnp.where(has, wingid, owner_prev)
            s_p[:] = p + jnp.where(has, dmax, 0.0)

            # Re-open eviction victims.  hit[u, l] = any_k(vic_k == u*ts+l),
            # computed as ONE small MXU matmul of the victim tile/lane
            # one-hots (a per-tile scan would be n_tiles sequential vector
            # ops).  Victims are never winners of this resolve (owners
            # don't bid), so update order is free.
            @pl.when(jnp.max(vic) >= 0)
            def _reopen():
                u_iota = jax.lax.broadcasted_iota(jnp.int32, (ts, n_tiles), 1)
                l_iota = jax.lax.broadcasted_iota(jnp.int32, (ts, ts), 1)
                valid = (vic >= 0).astype(jnp.int32)[:, None]
                vt = jnp.where(vic >= 0, vic // ts, n_tiles)
                tiles_oh = ((u_iota == vt[:, None]) & (valid > 0))
                lanes_oh = (l_iota == (vic - vt * ts)[:, None])
                cnt = jax.lax.dot_general(
                    tiles_oh.astype(jnp.float32),
                    lanes_oh.astype(jnp.float32),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [n_tiles, ts]
                s_open[:, :] = jnp.where(cnt > 0.5, jnp.int32(1),
                                         s_open[:, :])
            # Close winners (sunk rows were closed above).
            s_open[t, :] = jnp.where(won, jnp.int32(0), s_open[t, :])

    def round_cond(carry):
        r, n_open = carry
        return (n_open > 0) & (r < max_rounds)

    def round_body(carry):
        r, _ = carry
        eps = sweep_eps(r)

        def tile_body(j, n_active):
            t = s_list[j]
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < n_active)
            def _prefetch():
                stripe_dma(s_list[j + 1], jax.lax.rem(j + 1, 2)).start()

            stripe_dma(t, slot).wait()

            def icond(k):
                return (jnp.sum(s_open[t, :]) > 0) & (k < inner_cap)

            def ibody(k):
                bid_resolve(t, slot, eps)
                return k + 1

            jax.lax.while_loop(icond, ibody, jnp.int32(0))
            return n_active

        n_active = build_active_list()

        @pl.when(n_active > 0)
        def _seed():
            stripe_dma(s_list[0], 0).start()

        jax.lax.fori_loop(0, n_active, tile_body, n_active)
        return r + 1, jnp.sum(s_open[:, :])

    r, _ = jax.lax.while_loop(round_cond, round_body,
                              (jnp.int32(0), jnp.sum(s_open[:, :])))

    # In-kernel greedy completion (``comp_ref`` flag; final phase only):
    # rows still open when the sweep budget binds take their best column at
    # the final prices (duplicates allowed — owners/prices untouched) or the
    # sink, exactly the caller's XLA `complete` pass — but streaming ONLY
    # tiles that still have open rows (usually none once the escalation has
    # converged the phase), instead of a full [S, C] argmax pass.
    # Encoding: -1 = row was not open, C = sink, else the column id.
    gcol_out[:, :] = jnp.full_like(gcol_out, -1)

    @pl.when(comp_ref[0] > 0)
    def _complete():
        C_ = s_p.shape[0]
        n_active = build_active_list()

        @pl.when(n_active > 0)
        def _seed():
            stripe_dma(s_list[0], 0).start()

        def comp_body(j, _):
            t = s_list[j]
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < n_active)
            def _prefetch():
                stripe_dma(s_list[j + 1], jax.lax.rem(j + 1, 2)).start()

            stripe_dma(t, slot).wait()
            open_t = s_open[t, :] > 0
            v = s_tile[slot].astype(jnp.float32) - s_p[:][None, :]
            v1 = jnp.max(v, axis=1)
            j1 = jnp.argmax(v, axis=1).astype(jnp.int32)
            gcol_out[t, :] = jnp.where(
                open_t, jnp.where(v1 > sink, j1, jnp.int32(C_)),
                jnp.int32(-1))
            return 0

        jax.lax.fori_loop(0, n_active, comp_body, 0)

    p_out[0, :] = s_p[:]
    owner_out[0, :] = s_owner[:]
    sunk_out[:, :] = s_sunk[:, :]
    rounds_out[0] = r


@functools.partial(jax.jit, static_argnames=("ts", "inner_cap", "interpret"))
def auction_phase_gs_pallas(b: Array, p0: Array, owner0: Array, sunk0: Array,
                            open0: Array, eps, sink_value, max_rounds,
                            ts: int = 128, inner_cap: int = 128,
                            esc_after=0, esc_period=1, complete_open=0,
                            interpret: bool = False):
    """Gauss-Seidel bidding phase with active-tile skipping and tile-local
    quiescence (up to ``inner_cap`` in-VMEM bid rounds per tile visit).

    Same phase contract as :func:`auction_phase_pallas` (returns
    (p [C], owner [C], sunk [S], rounds, gcol [S])) plus an explicit
    ``open0`` [S] int32 mask of rows that may still bid (unassigned, not
    sunk).  Rounds count full sweeps over the active tiles.
    ``esc_after``/``esc_period`` (runtime scalars) switch on epsilon
    escalation: from sweep ``esc_after`` the working epsilon doubles every
    ``esc_period`` sweeps, terminating cross-tile price wars gracefully
    (0 = fixed epsilon).  ``complete_open`` (runtime scalar): when > 0,
    rows still open after the budget take a greedy assignment at the final
    prices, returned in ``gcol`` (-1 = was not open, C = sink, else col).
    S % ts == 0; C % 128 == 0.
    """
    S, C = b.shape
    n_tiles = S // ts
    esc = jnp.stack([jnp.asarray(esc_after, jnp.int32),
                     jnp.asarray(esc_period, jnp.int32)])
    out = pl.pallas_call(
        functools.partial(_gs_kernel, ts=ts, inner_cap=inner_cap),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # eps [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),    # sink [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),    # max_rounds [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),    # esc [2]
            pl.BlockSpec(memory_space=pltpu.SMEM),    # complete flag [1]
            pl.BlockSpec(memory_space=pl.ANY),        # b (HBM; manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # p0 [1, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # owner0 [1, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # sunk0 [tiles, ts]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # open0 [tiles, ts]
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, ts), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, ts), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((C,), jnp.float32),           # prices
            pltpu.VMEM((C,), jnp.int32),             # owners
            pltpu.VMEM((n_tiles, ts), jnp.int32),    # sunk, tile-major
            pltpu.VMEM((n_tiles, ts), jnp.int32),    # open, tile-major
            pltpu.VMEM((2, ts, C), b.dtype),         # stripe double buffer
            pltpu.SMEM((n_tiles,), jnp.int32),       # active-tile list
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # The resolve's live set (stripe double buffer + two [ts, C]
            # f32 temporaries + masks) peaks ~33MB at ts=256, C=8192 —
            # well past the 16MB default scoped-VMEM soft limit.  Physical
            # VMEM is 128MB; raise the cap instead of dropping the
            # prefetch double buffer or shrinking the tile.
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(eps, jnp.float32).reshape(1),
      jnp.asarray(sink_value, jnp.float32).reshape(1),
      jnp.asarray(max_rounds, jnp.int32).reshape(1),
      esc,
      jnp.asarray(complete_open, jnp.int32).reshape(1),
      b, p0.reshape(1, C), owner0.reshape(1, C),
      sunk0.reshape(n_tiles, ts), open0.reshape(n_tiles, ts))
    return (out[0][0], out[1][0], out[2].reshape(S), out[3][0],
            out[4].reshape(S))


def _warm_fused_kernel(scal_ref, maxr_ref, esc_ref, fd_ref, kps_ref, kpt_ref,
                       ms_ref, mt_ref, p0_ref, owner0_ref, acol0_ref,
                       sunk0_ref, ownok_ref,
                       p_out, owner_out, sunk_out, rounds_out, gcol_out,
                       stat_out,
                       s_p, s_owner, s_sunk, s_open, s_tile, s_bt, s_list,
                       s_v1, s_j1, s_v2, s_vsel, s_winbid, s_wingid,
                       sems, *, ts: int, inner_cap: int, mult_blend: bool,
                       quantize: bool, probe_stage: int = 0):
    """ONE-LAUNCH warm iteration solve (GHICPConfig.warm_fused_kernel).

    For a stats-free engine iteration with an assignment warm start, this
    kernel fuses what were two launches plus an XLA keep test:

      1. **sweep 0** (all tiles, one FD stream): benefit tiles recomputed
         from coordinate factors + FD stripes (never stored); per-row
         v1/j1/v2, the benefit at j1, and the kept column's value vsel are
         measured EXACTLY at the bidding-start prices and parked in VMEM
         scratch ([n_tiles, ts] each, ~200KB); b_max/ed_max accumulate;
      2. **keep phase + bidding round 0** (no HBM traffic): the epsilon
         and keep slack derive from the measured spread; rows failing the
         eps-CS keep test release their columns and bid Jacobi-style from
         the parked hints ((b - p) is unchanged since sweep 0 — the same
         reuse the streaming lane's cold round 0 exploits); winners close,
         evicted owners re-open via the one-hot MXU matmul trick;
      3. **streamed sweeps** (active tiles only): the Gauss-Seidel
         Gauss-Seidel streaming machinery for whatever round 0 left open;
      4. **greedy completion** (no HBM traffic): leftover rows take their
         sweep-0 argmax column re-priced at the final prices (exact value
         for that column via one one-hot pass; the sink rule then matches
         the dense completion's semantics for it) or the sink.

    Unlike the (deleted) round-4 factor-GS split — a hint launch plus a
    factor-streaming GS launch, 286 vs 421 it/s because scattered open
    rows forced a second full benefit construction — nothing here is
    computed twice: sweep 0's construction IS the hint pass, and rounds
    0 + completion reuse its parked reductions without touching HBM.

    scal layout (SMEM f32 [8]): wed, wfd, scale, sink, eps_abs, rel_eps,
    dpen, unused.  ``stat_out`` (SMEM f32 [4]): b_max, ed_max, eps,
    eps_keep.  ``maxr`` counts round 0 + streamed sweeps (same budget unit
    as the engine's auction_max_rounds).  Reference anchors: km.cpp:40
    (solve semantics), ghicp_reg.cpp:114-341 (the fused passes).
    """
    n_tiles = s_list.shape[0]
    C = s_p.shape[0]
    wed = scal_ref[0]
    wfd = scal_ref[1]
    scale = scal_ref[2]
    sink = scal_ref[3]
    eps_abs = scal_ref[4]
    rel_eps = scal_ref[5]
    dpen = scal_ref[6]
    max_rounds = maxr_ref[0]
    esc_after = esc_ref[0]
    esc_period = esc_ref[1]

    s_p[:] = p0_ref[0, :]
    s_owner[:] = owner0_ref[0, :]

    def stripe_dma(t, slot):
        return pltpu.make_async_copy(
            fd_ref.at[pl.ds(t * ts, ts), :], s_tile.at[slot], sems.at[slot])

    def compute_bt(t, slot):
        """Benefit tile + ED from factors (ops/cost_kernel.py arithmetic)."""
        s = kps_ref[t]                                   # [ts, 8]
        tt = kpt_ref[:, :]                               # [C, 8]
        d = jax.lax.dot_general(s, tt, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        s2 = jnp.sum(s * s, axis=1)
        t2 = jnp.sum(tt * tt, axis=1)
        d2 = jnp.maximum(s2[:, None] + t2[None, :] - 2.0 * d, 0.0)
        ed = scale * jnp.sqrt(d2)
        fdv = s_tile[slot].astype(jnp.float32)
        if mult_blend:
            cd = ed * jnp.exp(-wfd * jnp.log(jnp.maximum(fdv, 1e-6)))
        else:
            cd = wed * ed + wfd * fdv
        m = (ms_ref[t, :][:, None] > 0) & (mt_ref[0, :][None, :] > 0)
        bt = jnp.where(m, -cd, _NEG)
        if quantize:
            bt = bt.astype(jnp.bfloat16).astype(jnp.float32)
        return bt, ed, m

    # ---- sweep 0: hints + stats at the (fixed) start prices --------------
    # Pass economy: every [ts, C] op costs ~0.05-0.1 ms over the full
    # matrix, so sweep 0 computes ONLY what later stages cannot derive —
    # v1/j1/v2 (bidding), vsel (keep test), b_max (epsilon spread).  The
    # benefit at j1 is NOT stored: round 0's bid folds p[j1] into its
    # one-hot pass as a broadcast add, and the completion re-derives the
    # value from v1 + a (p_start - p_final) one-hot delta.  ed_max is NOT
    # measured: the engine bounds it from coordinate norms in XLA.
    def sweep0_tile(t, bmax):
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < n_tiles)
        def _prefetch():
            stripe_dma(t + 1, jax.lax.rem(t + 1, 2)).start()

        stripe_dma(t, slot).wait()
        bt, ed, m = compute_bt(t, slot)
        cols = jax.lax.broadcasted_iota(jnp.int32, (ts, C), 1)
        p = s_p[:]
        v = bt - p[None, :]
        v1 = jnp.max(v, axis=1)
        j1 = jnp.argmax(v, axis=1).astype(jnp.int32)
        onehot = cols == j1[:, None]
        v2 = jnp.max(jnp.where(onehot, _NEG, v), axis=1)
        acv = acol0_ref[t, :]
        realc = (acv >= 0) & (acv < C)
        keep_oh = cols == jnp.where(realc, acv, -1)[:, None]
        vsel = jnp.max(jnp.where(keep_oh, v, _NEG), axis=1)
        s_v1[t, :] = v1
        s_j1[t, :] = j1
        s_v2[t, :] = v2
        s_vsel[t, :] = vsel
        return jnp.maximum(bmax, jnp.max(bt))

    stripe_dma(0, 0).start()
    bmax = jax.lax.fori_loop(0, n_tiles, sweep0_tile, jnp.float32(_NEG))
    if probe_stage == 1:
        # Timing probe: sweep-0 only (outputs incomplete — perf use only).
        p_out[0, :] = s_p[:]
        owner_out[0, :] = s_owner[:]
        s_sunk[:, :] = jnp.zeros_like(s_sunk)
        s_open[:, :] = jnp.zeros_like(s_open)
        sunk_out[:, :] = s_sunk[:, :]
        gcol_out[:, :] = jnp.full_like(gcol_out, -1)
        rounds_out[0] = jnp.int32(0)
        stat_out[0] = bmax
        stat_out[1] = jnp.float32(0.0)
        stat_out[2] = jnp.float32(0.0)
        stat_out[3] = jnp.float32(0.0)
        return

    # ---- keep test + bidding round 0 (no HBM traffic) --------------------
    spread = jnp.maximum(bmax - sink, 0.0)
    eps = jnp.maximum(eps_abs, rel_eps * spread)
    eps_keep = jnp.clip(dpen + 2.0 * eps, eps,
                        jnp.maximum(spread / 8.0, eps))
    s_winbid[:] = jnp.full_like(s_winbid[:], _NEG)
    s_wingid[:] = jnp.full_like(s_wingid[:], -1)
    CH = C // 128

    def keep_tile(t, relacc):
        # Keep/sink decisions: pure [ts]-vector math over the parked hints.
        v1 = s_v1[t, :]
        valid = ms_ref[t, :] > 0
        ownok = ownok_ref[t, :] > 0
        keep = ownok & (s_vsel[t, :] >= v1 - eps_keep)
        stay_sunk = (sunk0_ref[t, :] > 0) & (sink >= v1 - eps_keep)
        open_t = valid & ~(keep | stay_sunk)
        to_sink = open_t & (v1 <= sink)
        s_sunk[t, :] = ((stay_sunk | to_sink) | ~valid).astype(jnp.int32)
        bidding = open_t & ~to_sink
        s_open[t, :] = bidding.astype(jnp.int32)
        # Column release (CS violators free their columns; prices stay,
        # auction.py warm-start docs) via SPLIT one-hots + one small MXU
        # matmul accumulate ([ts, C/128]^T @ [ts, 128]) instead of a
        # [ts, C] compare pass per tile.
        rel = ownok & ~keep
        acv = acol0_ref[t, :]
        relc = jnp.where(rel, acv, -1)
        hi = jax.lax.broadcasted_iota(jnp.int32, (ts, CH), 1)
        lo = jax.lax.broadcasted_iota(jnp.int32, (ts, 128), 1)
        # (i1 vectors can't grow a minor dim in Mosaic — via int32.)
        A = ((hi == (relc // 128)[:, None])
             & ((relc >= 0).astype(jnp.int32)[:, None] > 0))
        B = lo == (relc & 127)[:, None]
        relacc = relacc + jax.lax.dot_general(
            A.astype(jnp.float32), B.astype(jnp.float32),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

        # Round-0 bids from the parked hints ((b - p) unchanged since
        # sweep 0): the bid value p[j1] + v1 - max(v2, sink) + eps folds
        # p[j1] into the one-hot pass as a broadcast add.  Only tiles
        # with bidders pay the [ts, C] passes.
        @pl.when(jnp.sum(bidding.astype(jnp.int32)) > 0)
        def _bid():
            cols = jax.lax.broadcasted_iota(jnp.int32, (ts, C), 1)
            delta = v1 - jnp.maximum(s_v2[t, :], sink) + eps
            onehot = cols == s_j1[t, :][:, None]
            bidding2d = bidding.astype(jnp.int32)[:, None] > 0
            contrib = jnp.where(onehot & bidding2d,
                                delta[:, None] + s_p[:][None, :],
                                jnp.float32(_NEG))
            tile_max = jnp.max(contrib, axis=0)
            wlane = jnp.argmax(contrib, axis=0).astype(jnp.int32)
            hasw = tile_max > _NEG / 2
            tile_gid = jnp.where(hasw, t * ts + wlane, -1)
            wb = s_winbid[:]
            better = tile_max > wb
            s_wingid[:] = jnp.where(better, tile_gid, s_wingid[:])
            s_winbid[:] = jnp.maximum(wb, tile_max)
        return relacc

    relacc = jax.lax.fori_loop(
        0, n_tiles, keep_tile, jnp.zeros((CH, 128), jnp.float32))
    s_owner[:] = jnp.where(relacc.reshape(C) > 0.5, -1, s_owner[:])

    def _hit_mask(ids):
        """[n_tiles, ts] one-hot membership of the [C] row-id vector
        (negative = absent) via one small MXU matmul."""
        u_iota = jax.lax.broadcasted_iota(jnp.int32, (C, n_tiles), 1)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (C, ts), 1)
        valid = (ids >= 0).astype(jnp.int32)[:, None]
        it_ = jnp.where(ids >= 0, ids // ts, n_tiles)
        tiles_oh = ((u_iota == it_[:, None]) & (valid > 0))
        lanes_oh = (l_iota == (ids - it_ * ts)[:, None])
        return jax.lax.dot_general(
            tiles_oh.astype(jnp.float32), lanes_oh.astype(jnp.float32),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [n_tiles, ts]

    # Jacobi resolution of round 0: winners take columns at their bids,
    # previous owners re-open (released columns already have owner -1, so
    # their bids evict nobody).
    wb = s_winbid[:]
    has = wb > _NEG / 2
    owner_prev = s_owner[:]
    vic = jnp.where(has, owner_prev, -1)
    s_owner[:] = jnp.where(has, s_wingid[:], owner_prev)
    s_p[:] = jnp.where(has, wb, s_p[:])
    won_ids = jnp.where(has, s_wingid[:], -1)
    won_hit = _hit_mask(won_ids)
    s_open[:, :] = jnp.where(won_hit > 0.5, jnp.int32(0), s_open[:, :])
    vic_hit = _hit_mask(vic)
    s_open[:, :] = jnp.where(vic_hit > 0.5, jnp.int32(1), s_open[:, :])

    # ---- streamed Gauss-Seidel sweeps over active tiles ------------------
    def sweep_eps(r):
        boost = jnp.where(
            esc_after > 0,
            jnp.exp2(jnp.maximum(r - esc_after, 0).astype(jnp.float32)
                     / jnp.maximum(esc_period, 1).astype(jnp.float32)),
            1.0)
        return eps * boost

    def build_active_list():
        def body(t, cnt):
            open_t = jnp.sum(s_open[t, :])

            @pl.when(open_t > 0)
            def _():
                s_list[cnt] = t
            return cnt + (open_t > 0).astype(jnp.int32)

        return jax.lax.fori_loop(0, n_tiles, body, jnp.int32(0))

    def bid_resolve(t, eps_r):
        """One Gauss-Seidel bid/resolve batch for tile t's open rows
        (benefit tile in s_bt; same semantics as _gs_kernel's)."""
        gid = t * ts + jax.lax.broadcasted_iota(jnp.int32, (ts, 1), 0)[:, 0]
        cols = jax.lax.broadcasted_iota(jnp.int32, (ts, C), 1)
        unassigned = s_open[t, :] > 0

        p = s_p[:]
        owner_prev = s_owner[:]
        v = s_bt[:, :] - p[None, :]
        v1 = jnp.max(v, axis=1)
        j1 = jnp.argmax(v, axis=1).astype(jnp.int32)
        v2 = jnp.max(jnp.where(cols == j1[:, None], _NEG, v), axis=1)

        to_sink = unassigned & (v1 <= sink)
        bidding = unassigned & ~to_sink
        s_sunk[t, :] = jnp.where(to_sink, jnp.int32(1), s_sunk[t, :])
        s_open[t, :] = jnp.where(to_sink, jnp.int32(0), s_open[t, :])

        @pl.when(jnp.sum(bidding) > 0)
        def _resolve():
            onehot = cols == j1[:, None]
            delta = v1 - jnp.maximum(v2, sink) + eps_r
            bidding2d = bidding.astype(jnp.int32)[:, None] > 0
            contrib = jnp.where(onehot & bidding2d, delta[:, None],
                                jnp.float32(_NEG))
            dmax = jnp.max(contrib, axis=0)
            hasw = dmax > _NEG / 2
            wlane = jnp.argmax(contrib, axis=0).astype(jnp.int32)
            wingid = jnp.where(hasw, t * ts + wlane, -1)
            pw = (wingid + 1) * jnp.int32(1 << 14) + (owner_prev + 1)
            g = jnp.max(jnp.where(onehot, pw[None, :],
                                  jnp.int32(-1)), axis=1)
            won = bidding & ((g >> 14) - 1 == gid)
            vic2 = jnp.where(won, jax.lax.rem(g, jnp.int32(1 << 14)) - 1, -1)

            s_owner[:] = jnp.where(hasw, wingid, owner_prev)
            s_p[:] = p + jnp.where(hasw, dmax, 0.0)

            @pl.when(jnp.max(vic2) >= 0)
            def _reopen():
                u_iota = jax.lax.broadcasted_iota(jnp.int32, (ts, n_tiles), 1)
                l_iota = jax.lax.broadcasted_iota(jnp.int32, (ts, ts), 1)
                valid2 = (vic2 >= 0).astype(jnp.int32)[:, None]
                vt = jnp.where(vic2 >= 0, vic2 // ts, n_tiles)
                tiles_oh = ((u_iota == vt[:, None]) & (valid2 > 0))
                lanes_oh = (l_iota == (vic2 - vt * ts)[:, None])
                cnt = jax.lax.dot_general(
                    tiles_oh.astype(jnp.float32),
                    lanes_oh.astype(jnp.float32),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s_open[:, :] = jnp.where(cnt > 0.5, jnp.int32(1),
                                         s_open[:, :])
            s_open[t, :] = jnp.where(won, jnp.int32(0), s_open[t, :])

    def round_cond(carry):
        r, n_open = carry
        return (n_open > 0) & (r < max_rounds)

    def round_body(carry):
        r, _ = carry
        eps_r = sweep_eps(r)

        def tile_body(j, n_active):
            t = s_list[j]
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < n_active)
            def _prefetch():
                stripe_dma(s_list[j + 1], jax.lax.rem(j + 1, 2)).start()

            stripe_dma(t, slot).wait()
            bt, _, _ = compute_bt(t, slot)
            s_bt[:, :] = bt

            def icond(k):
                return (jnp.sum(s_open[t, :]) > 0) & (k < inner_cap)

            def ibody(k):
                bid_resolve(t, eps_r)
                return k + 1

            jax.lax.while_loop(icond, ibody, jnp.int32(0))
            return n_active

        n_active = build_active_list()

        @pl.when(n_active > 0)
        def _seed():
            stripe_dma(s_list[0], 0).start()

        jax.lax.fori_loop(0, n_active, tile_body, n_active)
        return r + 1, jnp.sum(s_open[:, :])

    if probe_stage == 2:
        r = jnp.int32(1)   # timing probe: skip streamed sweeps + completion
    else:
        r, _ = jax.lax.while_loop(round_cond, round_body,
                                  (jnp.int32(1), jnp.sum(s_open[:, :])))

    # ---- greedy completion from the parked hints (no HBM traffic) --------
    # Leftover rows take their sweep-0 argmax column, re-priced exactly at
    # the final prices (stale j1 may no longer be the argmax — greedy
    # completion allows that like every other completion path — but its
    # VALUE and hence the sink decision are exact for that column).  Only
    # tiles that still have open rows pay the re-pricing pass.
    gcol_out[:, :] = jnp.full_like(gcol_out, -1)

    @pl.when(jnp.sum(s_open[:, :]) > 0)
    def _complete():
        def comp_tile(t, _):
            @pl.when(jnp.sum(s_open[t, :]) > 0)
            def _tile():
                cols = jax.lax.broadcasted_iota(jnp.int32, (ts, C), 1)
                open_t = s_open[t, :] > 0
                j1 = s_j1[t, :]
                onehot = cols == j1[:, None]
                # value at j1 now = v1(at p_start) + (p_start - p_now)[j1]
                pd = (p0_ref[0, :] - s_p[:])[None, :]
                dsel = jnp.sum(jnp.where(onehot, pd, 0.0), axis=1)
                v1n = s_v1[t, :] + dsel
                gcol_out[t, :] = jnp.where(
                    open_t, jnp.where(v1n > sink, j1, jnp.int32(C)),
                    jnp.int32(-1))
            return 0

        jax.lax.fori_loop(0, n_tiles, comp_tile, 0)

    p_out[0, :] = s_p[:]
    owner_out[0, :] = s_owner[:]
    sunk_out[:, :] = s_sunk[:, :]
    rounds_out[0] = r
    stat_out[0] = bmax
    stat_out[1] = jnp.float32(0.0)   # ed_max: engine bounds it in XLA
    stat_out[2] = eps
    stat_out[3] = eps_keep


@functools.partial(jax.jit, static_argnames=("ts", "inner_cap", "mult_blend",
                                             "quantize", "interpret",
                                             "probe_stage"))
def auction_warm_fused_pallas(kp_s: Array, kp_t: Array, fd: Array,
                              mask_s: Array, mask_t: Array,
                              wed, wfd, scale,
                              p0: Array, owner0: Array, acol0: Array,
                              sunk0: Array, own_ok: Array,
                              sink_value, eps_abs, rel_eps, dpen, max_rounds,
                              ts: int = 128, inner_cap: int = 1,
                              esc_after=1, esc_period=1,
                              mult_blend: bool = False,
                              quantize: bool = True,
                              interpret: bool = False,
                              probe_stage: int = 0):
    """Single-launch warm GH-ICP iteration solve (see ``_warm_fused_kernel``).

    ``p0`` [C]: fully-deflated bidding-start prices (owner-zeroed);
    ``owner0`` [C] global row id or -1; ``acol0`` [S] previous real column
    or -1; ``sunk0`` [S] int32 (1 = row previously took the sink);
    ``own_ok`` [S] bool (row still owns its acol0 column — an O(S) gather
    the caller does in XLA).  ``dpen`` = |penalty - penalty_prev| feeds the
    keep slack; epsilon = max(eps_abs, rel_eps * measured spread).

    Returns (p [C], owner [C], sunk [S], rounds, gcol [S],
    stats [b_max, ed_max, eps, eps_keep]).  S % ts == 0; C % 128 == 0.
    """
    S, C = fd.shape
    n_tiles = S // ts
    kps8 = jnp.pad(kp_s.astype(jnp.float32), ((0, 0), (0, 5))).reshape(
        n_tiles, ts, 8)
    kpt8 = jnp.pad(kp_t.astype(jnp.float32), ((0, 0), (0, 5)))
    scal = jnp.stack([jnp.asarray(wed, jnp.float32),
                      jnp.asarray(wfd, jnp.float32),
                      jnp.asarray(scale, jnp.float32),
                      jnp.asarray(sink_value, jnp.float32),
                      jnp.asarray(eps_abs, jnp.float32),
                      jnp.asarray(rel_eps, jnp.float32),
                      jnp.asarray(dpen, jnp.float32),
                      jnp.float32(0.0)])
    esc = jnp.stack([jnp.asarray(esc_after, jnp.int32),
                     jnp.asarray(esc_period, jnp.int32)])
    out = pl.pallas_call(
        functools.partial(_warm_fused_kernel, ts=ts, inner_cap=inner_cap,
                          mult_blend=mult_blend, quantize=quantize,
                          probe_stage=probe_stage),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # scal [8]
            pl.BlockSpec(memory_space=pltpu.SMEM),    # max_rounds [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),    # esc [2]
            pl.BlockSpec(memory_space=pl.ANY),        # fd (HBM; manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # kps8 [tiles, ts, 8]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # kpt8 [C, 8]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # mask_s [tiles, ts]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # mask_t [1, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # p0 [1, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # owner0 [1, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # acol0 [tiles, ts]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # sunk0 [tiles, ts]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # own_ok [tiles, ts]
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, ts), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, ts), jnp.int32),
            jax.ShapeDtypeStruct((4,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((C,), jnp.float32),           # prices
            pltpu.VMEM((C,), jnp.int32),             # owners
            pltpu.VMEM((n_tiles, ts), jnp.int32),    # sunk
            pltpu.VMEM((n_tiles, ts), jnp.int32),    # open
            pltpu.VMEM((2, ts, C), fd.dtype),        # fd stripe double buffer
            pltpu.VMEM((ts, C), jnp.float32),        # computed benefit tile
            pltpu.SMEM((n_tiles,), jnp.int32),       # active-tile list
            pltpu.VMEM((n_tiles, ts), jnp.float32),  # v1 hints
            pltpu.VMEM((n_tiles, ts), jnp.int32),    # j1 hints
            pltpu.VMEM((n_tiles, ts), jnp.float32),  # v2 hints
            pltpu.VMEM((n_tiles, ts), jnp.float32),  # vsel hints
            pltpu.VMEM((C,), jnp.float32),           # round-0 win bid
            pltpu.VMEM((C,), jnp.int32),             # round-0 win gid
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scal,
      jnp.asarray(max_rounds, jnp.int32).reshape(1),
      esc,
      fd, kps8, kpt8,
      mask_s.astype(jnp.int32).reshape(n_tiles, ts),
      mask_t.astype(jnp.int32).reshape(1, C),
      p0.reshape(1, C), owner0.reshape(1, C),
      acol0.astype(jnp.int32).reshape(n_tiles, ts),
      sunk0.astype(jnp.int32).reshape(n_tiles, ts),
      own_ok.astype(jnp.int32).reshape(n_tiles, ts))
    return (out[0][0], out[1][0], out[2].reshape(S), out[3][0],
            out[4].reshape(S), out[5])


def auction_rounds_gs_ref(b: Array, p0: Array, owner0: Array, sunk0: Array,
                          open0: Array, eps, sink_value, n_rounds: int,
                          ts: int = 128, inner_cap: int = 128,
                          esc_after: int = 0, esc_period: int = 1):
    """jnp reference of the Gauss-Seidel sweep semantics (parity tests).

    Processes row tiles of height ``ts`` sequentially with immediate price/
    owner resolution and per-tile quiescence (up to ``inner_cap`` bid rounds
    while the tile has open rows), mirroring ``_gs_kernel`` exactly
    (including the max-gid tie break and the epsilon-escalation schedule)."""
    S, C = b.shape
    n_tiles = S // ts
    cols = jnp.arange(C, dtype=jnp.int32)

    def sweep_eps(r):
        boost = jnp.where(
            esc_after > 0,
            jnp.exp2(jnp.maximum(r - esc_after, 0).astype(jnp.float32)
                     / jnp.maximum(esc_period, 1)),
            1.0)
        return jnp.float32(eps) * boost

    def bid_resolve(carry, t, eps):
        p, owner, sunk, open_ = carry
        sl = t * ts
        gid = sl + jnp.arange(ts, dtype=jnp.int32)
        open_t = jax.lax.dynamic_slice_in_dim(open_, sl, ts)
        bt = jax.lax.dynamic_slice_in_dim(b, sl, ts).astype(jnp.float32)
        v = bt - p[None, :]
        v1 = jnp.max(v, axis=1)
        j1 = jnp.argmax(v, axis=1).astype(jnp.int32)
        onehot = cols[None, :] == j1[:, None]
        v2 = jnp.max(jnp.where(onehot, _NEG, v), axis=1)
        unassigned = open_t > 0
        to_sink = unassigned & (v1 <= sink_value)
        bidding = unassigned & ~to_sink
        delta = v1 - jnp.maximum(v2, sink_value) + eps
        contrib = jnp.where(onehot & bidding[:, None], delta[:, None], _NEG)
        dmax = jnp.max(contrib, axis=0)
        has = dmax > _NEG / 2
        # First max == lowest lane == lowest gid tie-break (kernel parity).
        wlane = jnp.argmax(contrib, axis=0).astype(jnp.int32)
        wingid = jnp.where(has, sl + wlane, -1)
        won = bidding & (jnp.max(jnp.where(onehot, wingid[None, :], -1),
                                 axis=1) == gid)
        vic = jnp.where(won, jnp.max(jnp.where(onehot, owner[None, :], -1),
                                     axis=1), -1)
        owner = jnp.where(has, wingid, owner)
        p = p + jnp.where(has, dmax, 0.0)
        sunk = jax.lax.dynamic_update_slice_in_dim(
            sunk, jnp.where(to_sink, 1, jax.lax.dynamic_slice_in_dim(
                sunk, sl, ts)), sl, axis=0)
        hit = jnp.any(vic[:, None] == jnp.arange(S)[None, :], axis=0)
        open_ = jnp.where(hit, 1, open_)
        open_t2 = jax.lax.dynamic_slice_in_dim(open_, sl, ts)
        open_ = jax.lax.dynamic_update_slice_in_dim(
            open_, jnp.where(won | to_sink, 0, open_t2), sl, axis=0)
        return p, owner, sunk, open_

    def round_(carry, r):
        # The kernel freezes its active-tile list at sweep start: a tile
        # re-activated mid-sweep (evictions from a later tile) waits for the
        # next sweep.  Mirror that by gating on the sweep-start open mask.
        open_start = carry[3]
        eps_r = sweep_eps(r)

        def tile(carry, t):
            active0 = jnp.sum(jax.lax.dynamic_slice_in_dim(
                open_start, t * ts, ts)) > 0

            def icond(c):
                k, (p, owner, sunk, open_) = c
                open_t = jax.lax.dynamic_slice_in_dim(open_, t * ts, ts)
                return active0 & (jnp.sum(open_t) > 0) & (k < inner_cap)

            def ibody(c):
                k, st = c
                return k + 1, bid_resolve(st, t, eps_r)

            _, carry = jax.lax.while_loop(icond, ibody,
                                          (jnp.int32(0), carry))
            return carry, None

        (carry), _ = jax.lax.scan(tile, carry,
                                  jnp.arange(n_tiles, dtype=jnp.int32))
        return carry, None

    (p, owner, sunk, open_), _ = jax.lax.scan(
        round_, (p0, owner0, sunk0, open0),
        jnp.arange(n_rounds, dtype=jnp.int32))
    return p, owner, sunk, open_


def auction_rounds_ref(b: Array, p0: Array, owner0: Array, sunk0: Array,
                       eps, sink_value, n_rounds: int):
    """jnp reference of the same fixed-round semantics (for parity tests)."""
    S, C = b.shape
    gid = jnp.arange(S, dtype=jnp.int32)
    cols = jnp.arange(C, dtype=jnp.int32)

    def round_(carry, _):
        p, owner, sunk = carry
        # a row is assigned iff some column's owner pointer targets it
        owned = jnp.any(owner[None, :] == gid[:, None], axis=1)
        unassigned = ~owned & (sunk == 0)
        v = b.astype(jnp.float32) - p[None, :]
        v1 = jnp.max(v, axis=1)
        j1 = jnp.argmax(v, axis=1).astype(jnp.int32)
        v2 = jnp.max(jnp.where(cols[None, :] == j1[:, None], _NEG, v), axis=1)
        to_sink = unassigned & (v1 <= sink_value)
        sunk = jnp.where(to_sink, 1, sunk)
        bidding = unassigned & ~to_sink
        bid = p[j1] + v1 - jnp.maximum(v2, sink_value) + eps
        bid = jnp.where(bidding, bid, _NEG)
        win_bid = jnp.full((C,), _NEG, jnp.float32).at[j1].max(bid)
        is_best = bidding & (bid == win_bid[j1]) & (win_bid[j1] > _NEG / 2)
        winner = jnp.full((C,), -1, jnp.int32).at[j1].max(
            jnp.where(is_best, gid, -1))
        has = winner >= 0
        owner = jnp.where(has, winner, owner)
        p = jnp.where(has, win_bid, p)
        return (p, owner, sunk), None

    (p, owner, sunk), _ = jax.lax.scan(round_, (p0, owner0, sunk0),
                                       None, length=n_rounds)
    return p, owner, sunk
