"""The GH-ICP registration engine: a jit-compiled fixed-point iteration.

TPU-native re-design of ``GHRegistration::ghicp_reg`` (reference
``src/ghicp_reg.cpp:24-112`` and the call stack of SURVEY.md §3.2).  The
reference's host loop — recompute ED, blend CD, solve correspondence, SVD,
convergence test, weight adjustment — becomes a single ``lax.while_loop``
carrying the moving source keypoints, the accumulated transform, the penalty
parameters and a fixed-size per-iteration metrics buffer.  One compilation,
zero host round-trips per iteration.

Semantics preserved (each with its reference anchor):
  * FD computed once before the loop (ghicp_reg.cpp:33-44);
  * ED = scale * pairwise distance each iteration (:114-139);
  * CD blending + penalty schedule per feature type (:216-341);
  * correspondence via auction (== KM, :343-604) / NN (:700) / NNR (:605);
  * per-iteration RMSE over matched pairs, FDM/FDstd bookkeeping (:546-567);
  * converge if cor < min_cor (:796); IoU = cor/(ns+nt-cor) (:799);
  * SVD (Umeyama) transform; convergence when all |t| < converge_t and all
    Euler angles < converge_r degrees (:839-914);
  * RMS-after, success verdict RMSE_after < 1.5 * non_max_radius (:918-924);
  * IoU-driven penalty weight adjustment (:771-789);
  * Rt accumulation Rt = Rt_temp @ Rt (:93).

Deliberate upgrades over the reference:
  * ``reg_dof=4`` uses a *true* closed-form yaw-only estimator — the
    reference always solves 6-DoF SVD even in 4-DoF mode (SURVEY.md §2
    quirks; common_reg.cpp:622 is its unused 4-DoF solver);
  * metrics are returned as arrays (energy/rmse/rmse_after/cor/iou/penalty
    per iteration) instead of cout logs + side-effect files.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ghicp_tpu.core import transform as tf
from ghicp_tpu.core.comm import LOCAL, Comm
from ghicp_tpu.core.config import CorrespondenceType, FeatureType, GHICPConfig
from ghicp_tpu.matching import (auction_match, blend_bsc, blend_fpfh,
                                blend_none, euclidean_matrix, nn_match,
                                nnr_match)
from ghicp_tpu.matching.auction import auction_match_benefits
from ghicp_tpu.matching.stream_auction import (_SINK, StreamCarry,
                                               carry_init)
from ghicp_tpu.registration.estimator import estimate

Array = jax.Array

# Test hook: run the fused cost kernel in interpret mode on non-TPU
# backends so the fused-path plumbing is exercised by the CPU test mesh.
_FUSED_INTERPRET = False

# Test hook: same for the matrix-free streaming sweep kernel.
_STREAM_INTERPRET = False


class IterationMetrics(NamedTuple):
    """Per-iteration history (reference vectors energy/rmse/..,
    ghicp_reg.h:147-148), padded to max_iterations."""

    energy: Array      # [I] assignment energy (KM path; 0 for NN/NNR)
    rmse: Array        # [I] correspondence RMSE before transform
    rmse_after: Array  # [I] after applying this iteration's transform
    cor: Array         # [I] int32 number of correspondences
    iou: Array         # [I]
    penalty: Array     # [I]
    rounds: Array      # [I] int32 auction bidding rounds (0 for NN/NNR)


class GHICPResult(NamedTuple):
    transform: Array        # [4,4] final source -> target
    iterations: Array       # scalar int32
    converged: Array        # bool
    success: Array          # bool: RMSE_after < 1.5 * non_max_radius
    final_rmse: Array       # scalar
    metrics: IterationMetrics
    matches: Array          # [S] int32 final target index per source (-1 none)


class _State(NamedTuple):
    kps: Array        # [S,3] current source keypoints
    rt: Array         # [4,4]
    it: Array         # int32
    converged: Array  # bool
    rms: Array        # running RMSE (init 99999, ghicp_reg.h:96)
    fdm: Array
    fdstd: Array
    para1: Array
    para2: Array
    metrics: IterationMetrics
    matches: Array    # [S] int32
    rmse_after: Array
    prices: Array     # [T] auction dual prices carried across iterations
    acol: Array       # [S] raw auction assignment (col/_SINK/-1) carried
                      # across iterations: warm-starts the next solve so
                      # only eps-CS violators re-bid (the full first-sweep
                      # top-2 over [S,T] was the dominant engine cost)
    price_unc: Array  # [T] PER-COLUMN deflation depth for the next warm
                      # start: each column's price staleness (bid overshoot
                      # for won columns, keep-certification slack for
                      # untouched ones) + the scalar benefit-drift bound.
                      # A scalar worst case here leaked every price toward
                      # zero across warm streaks (kept columns never
                      # re-bid, so nothing restored them) and the warm keep
                      # tests never engaged
    pen_prev: Array   # previous iteration's penalty (drift component)
    it_shift: Array   # f32 schedule offset: W_FD decays from
                      # exp(-it_shift/rate).  Nonzero when a trusted coarse
                      # init (RANSAC) replaces the feature-driven early
                      # phase — iteration 0's pure-FD matching would throw
                      # a verified pose away (W_ED = 0 at it 0)
    scarry: tuple     # StreamCarry (ok, v1_ub [S], b_max, ed_max,
                      # fd_max, v1_drift, fd_term, decay_ratio): the
                      # streaming lane's warm fast-path hint carry — lets
                      # stats-free iterations skip sweep-0 entirely
                      # (matching/stream_auction.py).  Zeros + ok=False on
                      # the non-streaming paths


def _masked_median_log(x, m, comm: Comm):
    """Layout-exact robust scale: median of ``x`` over mask ``m`` via a
    128-bin log10 histogram (1e-4..1e3).

    Integer bin counts psum EXACTLY across any row sharding (unlike a
    mean, whose f32 accumulation order shifts with the layout), so the
    robust estimator below stays within the suite's sharded-vs-local pose
    tolerances.  Resolution is one bin (~13%) — ample for a trim scale."""
    lo, hi, nb = -4.0, 3.0, 128
    lx = jnp.log10(jnp.maximum(x, 1e-6))
    bi = jnp.clip(((lx - lo) / (hi - lo) * nb).astype(jnp.int32), 0, nb - 1)
    bi = jnp.where(m, bi, -1)
    # One-hot compare + reduce instead of a scatter-add: [S] int scatters
    # serialize on TPU (measured ~0.2 ms per call — 0.4 ms/iteration over
    # two IRLS rounds); the [S, nb] compare-sum is a fused vector pass.
    hist = jnp.sum((bi[:, None] == jnp.arange(nb, dtype=jnp.int32)[None, :]
                    ).astype(jnp.int32), axis=0)
    hist = comm.psum(hist)
    csum = jnp.cumsum(hist)
    n = csum[-1]
    med_bin = jnp.argmax(csum >= (n + 1) // 2)
    return jnp.float32(10.0) ** (lo + (med_bin.astype(jnp.float32) + 0.5)
                                 * (hi - lo) / nb)


def _matched_stats(src_pts, tgt_pts, fsel, tgt_idx, w, comm: Comm):
    """RMSE / FDM / FDstd over matched pairs (ghicp_reg.cpp:546-567).
    ``fsel`` [S]: the per-row feature distance at the matched column
    (a dense-row gather on the materialized paths, a factor gather on the
    streaming path)."""
    t = tgt_pts[tgt_idx]
    n = jnp.maximum(comm.psum(jnp.sum(w)), 1.0)
    se = comm.psum(jnp.sum(w * jnp.sum((src_pts - t) ** 2, axis=-1)))
    rmse = jnp.sqrt(se / n)
    s1 = comm.psum(jnp.sum(w * fsel))
    s2 = comm.psum(jnp.sum(w * fsel * fsel))
    fdm = s1 / n
    fdstd = jnp.sqrt(jnp.maximum(s2 / n - fdm * fdm, 0.0))
    return rmse, fdm, fdstd


def _initial_state(kp_s: Array, n_target: int, config: GHICPConfig,
                   init_transform: Optional[Array] = None,
                   it_shift: float = 0.0) -> _State:
    """Loop state at iteration 0 (optionally warm-started — the reference
    always restarts from identity, ghicp_reg.h:95)."""
    S = kp_s.shape[0]
    I = config.max_iterations
    if init_transform is None:
        rt0 = tf.identity()
        kps0 = kp_s
    else:
        rt0 = init_transform
        kps0 = tf.apply(init_transform, kp_s)
    zero_i = jnp.zeros((I,), jnp.float32)
    metrics0 = IterationMetrics(energy=zero_i, rmse=zero_i, rmse_after=zero_i,
                                cor=jnp.zeros((I,), jnp.int32), iou=zero_i,
                                penalty=zero_i,
                                rounds=jnp.zeros((I,), jnp.int32))
    return _State(
        kps=kps0, rt=rt0, it=jnp.int32(0),
        converged=jnp.bool_(False), rms=jnp.float32(99999.0),
        fdm=jnp.float32(0.0), fdstd=jnp.float32(0.0),
        para1=jnp.float32(config.para1_penalty),
        para2=jnp.float32(config.para2_penalty),
        metrics=metrics0, matches=jnp.full((S,), -1, jnp.int32),
        rmse_after=jnp.float32(jnp.inf),
        prices=jnp.zeros((n_target,), jnp.float32),
        acol=jnp.full((S,), -1, jnp.int32),
        price_unc=jnp.full((n_target,), 3.0e38, jnp.float32),
        pen_prev=jnp.float32(0.0),
        it_shift=jnp.float32(it_shift), scarry=carry_init(S))


def _make_body(kp_t: Array, mask_s: Array, mask_t: Array, fd: Optional[Array],
               bbx_magnitude: Array, config: GHICPConfig, comm: Comm,
               total_rows: int, stream=None):
    """One GH-ICP iteration as a while_loop body closure.

    ``stream`` (a :class:`ghicp_tpu.ops.stream_kernel.StreamFeatures`, with
    ``fd=None``) selects the matrix-free lane: the benefit field is
    recomputed from the coordinate/feature factors inside each auction
    sweep, no [S, T] tensor ever materializes (the reference's scaling
    wall, ghicp_reg.h:26-30, removed rather than moved).  KM only.
    """
    import jax as _jax
    scale = config.scale_factor * bbx_magnitude
    ns = comm.psum(jnp.sum(mask_s.astype(jnp.float32)))
    nt = jnp.sum(mask_t.astype(jnp.float32))
    S = mask_s.shape[0]
    T = kp_t.shape[0]
    use_stream = stream is not None
    if use_stream and config.correspondence != CorrespondenceType.KM:
        from ghicp_tpu.ops.stream_kernel import RingFeatures as _RF
        if isinstance(stream, _RF):
            raise ValueError("ring streaming supports KM only")
    # The fused benefit kernel shards cleanly: it runs per device on the
    # local row shard and its statistics are psum'd below (the GS round
    # kernel stays single-device — auction_assign's internal gate falls
    # back to the XLA bidding rounds with per-round pmax resolution).
    use_fused = (not use_stream
                 and config.fused_cost_kernel
                 and config.correspondence == CorrespondenceType.KM
                 and (_jax.default_backend() == "tpu" or _FUSED_INTERPRET)
                 and S % 128 == 0 and T % 128 == 0)
    mult_blend = config.feature in (FeatureType.FPFH, FeatureType.ROPS)
    if use_stream:
        # Common centering offset for f32 norm-expansion accuracy (same
        # rationale as the fused kernel path below).
        mid = 0.5 * (jnp.min(jnp.where(mask_t[:, None], kp_t, 3e38), axis=0)
                     + jnp.max(jnp.where(mask_t[:, None], kp_t, -3e38),
                               axis=0))
        mid = comm.pmax(mid)   # replicate identical offset across shards
        kp_t_c = jnp.where(mask_t[:, None], kp_t - mid[None, :], 0.0)
    if use_fused:
        # All computed once, before the while_loop traces the body: center
        # both keypoint sets by a common offset so the kernels'/closures'
        # norm-expansion ED stays f32-accurate at 100m-scale coordinates.
        mid = 0.5 * (jnp.min(jnp.where(mask_t[:, None], kp_t, 3e38), axis=0)
                     + jnp.max(jnp.where(mask_t[:, None], kp_t, -3e38),
                               axis=0))
        kp_t_c = jnp.where(mask_t[:, None], kp_t - mid[None, :], 0.0)
    if use_fused:
        # Benefit-store precision follows auction_bf16 (same knob as the
        # unfused path's quantize_bf16); f32 keeps full ED resolution at
        # double the sweep traffic.
        b_dtype = jnp.bfloat16 if config.auction_bf16 else jnp.float32
        fd_b = fd.astype(jnp.bfloat16) if config.auction_bf16 else fd
    # Matched-pair FD stats gather from the bf16 copy when the fused path
    # carries one: the f32 [S,T] matrix then stays out of the loop carry
    # entirely, and the per-iteration row gather reads half the bytes.
    # (FDM/FDstd feed the penalty schedule scaled by the decaying W_FD;
    # bf16's ~2^-9 relative rounding of integer Hamming distances is far
    # below the schedule's own sensitivity.)
    fd_stats = fd_b if (use_fused and config.auction_bf16) else fd
    # Multiplicative-blend (FPFH/RoPS) warm-start drift bound input: the
    # min similarity over valid pairs, measured ONCE (features are fixed).
    # cd = ed * fd^(-k) with k = 1/(it_eff+1) DECREASING: the exponent
    # change only lowers costs (fd <= 1 -> fd^{dk} <= 1), i.e. benefits
    # rise — the safe direction needing no price deflation.  Costs RISE
    # only through ED motion, amplified by at most fd_min^(-k_next) —
    # finite, so these lanes now warm-start like BSC instead of paying a
    # cold auction every iteration (VERDICT r4 task 5; the reference
    # treats all feature lanes uniformly, ghicp_reg.cpp:216-341).
    fd_min_static = None
    if (mult_blend and fd is not None
            and config.correspondence == CorrespondenceType.KM):
        fd_min_static = jnp.maximum(comm.pmin(jnp.min(jnp.where(
            mask_s[:, None] & mask_t[None, :],
            fd.astype(jnp.float32), 1.0))), 1e-6)
    def body(st: _State) -> _State:
        it_eff = st.it.astype(jnp.float32) + st.it_shift
        if config.feature == FeatureType.BSC:
            wfd = jnp.exp(-it_eff / config.weight_changing_rate)
            wed = 1.0 - wfd
        elif mult_blend:
            # the fused kernel's wfd slot carries the multiplicative
            # exponent k = 1/(iter+1) (ghicp_reg.cpp:295-341)
            wfd = 1.0 / (it_eff + 1.0)
            wed = jnp.float32(1.0)
        else:
            wfd = jnp.float32(0.0)
            wed = jnp.float32(1.0)

        budget = jnp.int32(config.auction_max_rounds)
        if (config.auction_warm_rounds > 0 and not use_stream
                and total_rows >= config.auction_warm_min_rows):
            # Warm-phase sweep budget: once the assignment+price warm start
            # carries most of the matching (past the feature-dominant early
            # schedule), fewer full-matrix bidding sweeps per solve suffice
            # — budget is a traced scalar, so this costs no recompile.
            # Dense lanes only: the streaming lane's compact-extension
            # economics differ and budget 1 measurably nudges its matched
            # RMSE at the success threshold.  Gated on the REAL iteration
            # count, not it_eff: a coarse init's it_shift makes it_eff
            # large at iteration 0, where no assignment warm start exists
            # yet and the pose-forming early solves need the full budget
            # (measured at the sparse NMS-1.0 config: immediate budget 1
            # costs 0.12 -> 0.18 deg over the trajectory).  ALSO gated on
            # total_rows >= auction_warm_min_rows (static): sparse
            # identity-start trajectories spend 20-30 pose-forming
            # iterations past warm_after where budget 1 still costs pose
            # (BENCH_r04 verdict-pair drift, VERDICT r4 task 2) and the
            # solve is cheap at those counts anyway.
            budget = jnp.where(st.it > config.auction_warm_after,
                               jnp.int32(config.auction_warm_rounds),
                               budget)
        ed_max_fused = None
        fsel = None
        if use_fused:
            from ghicp_tpu.matching.cost import bsc_penalty
            from ghicp_tpu.matching.matchers import MatchResult
            kps_c = st.kps - mid[None, :]
            real0 = (st.acol >= 0) & (st.acol < T)
            row_gid = comm.axis_index() * S + jnp.arange(S, dtype=jnp.int32)
            owner0 = jnp.full((T,), -1, jnp.int32).at[
                jnp.where(real0, st.acol, T)].max(
                jnp.where(real0, row_gid, -1), mode="drop")
            owner0 = comm.pmax(owner0)
            p_mid = jnp.where(owner0 >= 0,
                              jnp.maximum(st.prices - st.price_unc, 0.0),
                              0.0)
        if use_stream:
            from ghicp_tpu.matching.cost import bsc_penalty
            from ghicp_tpu.matching.stream_auction import stream_solve
            kps_c = st.kps - mid[None, :]
            if config.feature == FeatureType.BSC:
                def penalty_fn(mean, std):
                    return bsc_penalty(mean, std, it_eff, st.rms, st.fdm,
                                       st.fdstd, st.para1, st.para2, scale,
                                       wed, wfd, config.penalty_initial)
            elif mult_blend:
                def penalty_fn(mean, std):
                    pen_late = st.rms * st.para1 * scale * st.para2
                    pen_early = mean / config.penalty_initial
                    return jnp.where(it_eff > 1, pen_late, pen_early)
            else:
                def penalty_fn(mean, std):
                    return jnp.maximum(mean, 1.0)
            if config.correspondence != CorrespondenceType.KM:
                # --- matrix-free NN / reciprocal-NN -----------------------
                # One sweep per iteration: the row-wise top-1 over the
                # never-materialized cost field is the NN matcher
                # (ghicp_reg.cpp:700-769), and with ``col_side`` the same
                # sweep emits the per-column min/argmin the reciprocal
                # test needs (ghicp_reg.cpp:605-698).  Lifts the KM-only
                # restriction of the streaming lane: NN/NNR now run at any
                # keypoint count without re-materializing the dense [S,T]
                # FD the streaming lane exists to avoid.
                from ghicp_tpu.matching.matchers import MatchResult
                from ghicp_tpu.ops.stream_kernel import (stream_selected,
                                                         stream_sweep,
                                                         stream_sweep_ref)
                no_feat = config.feature == FeatureType.NONE
                col = config.correspondence == CorrespondenceType.NNR
                zp = jnp.zeros((T,), jnp.float32)
                zac = jnp.full((S,), -1, jnp.int32)
                use_k = (_jax.default_backend() == "tpu"
                         or _STREAM_INTERPRET)
                tc_nn = next((t for t in (4096, 2048, 1024, 512, 256, 128)
                              if T % t == 0), 0)
                if use_k and S % 256 == 0 and tc_nn:
                    sw = stream_sweep(kps_c, kp_t_c, stream, mask_s,
                                      mask_t, zp, zac, wed, wfd, scale,
                                      tc=tc_nn,
                                      interpret=_STREAM_INTERPRET,
                                      mult_blend=mult_blend,
                                      no_features=no_feat, col_side=col)
                else:
                    sw = stream_sweep_ref(kps_c, kp_t_c, stream, mask_s,
                                          mask_t, zp, zac, wed, wfd,
                                          scale, mult_blend=mult_blend,
                                          no_features=no_feat,
                                          col_side=col)
                n_valid = jnp.maximum(comm.psum(sw.cnt), 1.0)
                mean = comm.psum(sw.cd_sum) / n_valid
                std = jnp.sqrt(jnp.maximum(
                    comm.psum(sw.cd_sumsq) / n_valid - mean * mean, 0.0))
                penalty = penalty_fn(mean, std)
                mincd = -sw.v1            # prices are zero: v1 = -min CD
                valid_row = mask_s & (sw.v1 > jnp.float32(-1.0e38))
                if col:
                    # Reciprocal test with global row ids (the dense
                    # nnr_match semantics, lowest row id on ties).
                    row_gid_nn = (comm.axis_index() * S
                                  + jnp.arange(S, dtype=jnp.int32))
                    cmin_g = comm.pmin(sw.cmin)
                    big = jnp.int32(2**30)
                    crow_gid = jnp.where(sw.crow < big,
                                         sw.crow + comm.axis_index() * S,
                                         big)
                    tv = comm.pmin(jnp.where(sw.cmin <= cmin_g,
                                             crow_gid, big))
                    mutual = tv[sw.j1] == row_gid_nn
                    ok = valid_row & mutual
                else:
                    ok = valid_row & (mincd < penalty)
                w_nn = ok.astype(jnp.float32)
                match = MatchResult(
                    tgt_idx=sw.j1.astype(jnp.int32), w=w_nn,
                    n_matches=comm.psum(jnp.sum(w_nn)).astype(jnp.int32))
                cd_sel = mincd
                _, _, fsel = stream_selected(kps_c, kp_t_c, stream,
                                             sw.j1, wed, wfd, scale,
                                             mult_blend=mult_blend,
                                             no_features=no_feat)
                energy = jnp.float32(0.0)
                rounds = jnp.int32(0)
                prices = st.prices
                eps_used = jnp.float32(0.0)
                acol_new = st.acol
                punc_new = jnp.zeros((T,), jnp.float32)
                ed_max_fused = comm.pmax(sw.ed_max)
            else:
                from ghicp_tpu.ops.stream_kernel import (RingFeatures,
                                                         ring_selected,
                                                         ring_sweep)
                is_ring = isinstance(stream, RingFeatures)
                if is_ring:
                    if mult_blend:
                        raise ValueError("ring streaming supports the BSC "
                                         "(hamming) lane only")

                    ring_kernel = (_jax.default_backend() == "tpu"
                                   or _STREAM_INTERPRET)

                    def sweep_fn(p, ac):
                        return ring_sweep(kps_c, kp_t_c, stream, mask_s,
                                          mask_t, p, ac, wed, wfd, scale,
                                          comm.axis,
                                          use_kernel=ring_kernel,
                                          interpret=_STREAM_INTERPRET)

                    def select_fn(jc):
                        return ring_selected(kps_c, kp_t_c, stream, jc,
                                             wed, wfd, scale)

                    def sweep_sub_fn(idx, sub_mask, p, ac_sub):
                        # Compact ring sweep: the local factor rows gather to
                        # the open subset; target blocks still rotate the
                        # full ring (the ppermute traffic is O(C*F) either
                        # way), but per-step compute is O(cap * C/n).
                        sub = RingFeatures(fs=stream.fs[:, idx],
                                           na=stream.na[:, idx],
                                           ft_blk=stream.ft_blk,
                                           nb=stream.nb,
                                           words_s=stream.words_s,
                                           words_t=stream.words_t)
                        return ring_sweep(kps_c[idx], kp_t_c, sub, sub_mask,
                                          mask_t, p, ac_sub, wed, wfd, scale,
                                          comm.axis,
                                          use_kernel=ring_kernel,
                                          interpret=_STREAM_INTERPRET)
                else:
                    sweep_fn = select_fn = sweep_sub_fn = None
                # The streaming sweep kernel also shards cleanly (it only
                # computes local-row reductions); the ring lane supplies its
                # own sweep_fn instead.
                use_kernel = (_jax.default_backend() == "tpu"
                              or _STREAM_INTERPRET)
                # Warm fast path: BSC's penalty schedule is stats-free past
                # it_eff > 1 (bsc_penalty takes the rms/fdm branch,
                # ghicp_reg.cpp:279-293) and its price drift bound is finite,
                # so the carried hints can replace sweep-0.  FPFH/RoPS drift
                # is unbounded (multiplicative blend) -> carry disabled.
                use_fast = (config.stream_fast_path
                            and config.feature == FeatureType.BSC)
                # Periodic re-anchor: the carried v1/spread bounds inflate by
                # the drift terms every fast solve; a full sweep-0 every
                # stream_refresh_every iterations re-measures them exactly.
                sf = it_eff > 1.0
                if config.stream_refresh_every > 0:
                    sf = sf & (st.it % config.stream_refresh_every != 0)
                sres = stream_solve(
                    kps_c, kp_t_c, None if is_ring else stream, mask_s, mask_t,
                    wed, wfd, scale,
                    penalty_fn, eps_final=config.km_eps,
                    rel_eps=config.auction_rel_eps, max_sweeps=budget,
                    p0=st.prices, price_uncertainty=st.price_unc,
                    acol0=st.acol, pen_prev=st.pen_prev, comm=comm,
                    total_rows=total_rows, interpret=_STREAM_INTERPRET,
                    mult_blend=mult_blend, use_kernel=use_kernel,
                    sweep_fn=sweep_fn, select_fn=select_fn,
                    carry=st.scarry if use_fast else None,
                    stats_free=sf if use_fast else False,
                    open_cap=config.stream_open_cap,
                    compact_extra_sweeps=config.stream_compact_budget,
                    sweep_sub_fn=sweep_sub_fn,
                    no_features=(config.feature == FeatureType.NONE))
                match = sres.match
                energy = sres.energy
                rounds = sres.rounds
                prices = sres.prices
                eps_used = sres.eps_used
                acol_new = sres.acol
                cd_sel = sres.cd_sel
                fsel = sres.fd_sel
                penalty = sres.penalty
                ed_max_fused = sres.ed_max
                punc_new = sres.punc
        elif use_fused:
            from ghicp_tpu.matching import auction as _au
            from ghicp_tpu.ops.cost_kernel import fused_benefit

            def _full_solve(_):
                # Full fused+GS iteration.  Warm-start CS hints come out of
                # the SAME sweep that builds the benefit matrix: deflate the
                # carried prices by the pre-penalty drift bound (the penalty
                # component isn't known until this kernel's stats), zero
                # unowned columns, and let the kernel compute v1/vsel
                # against those mid prices.  The remaining penalty-drift
                # component is added to v1 afterwards — an upper bound, so
                # the keep test stays conservative (sound).
                def _fb(ws):
                    def run(_):
                        return fused_benefit(
                            kps_c, kp_t_c, fd_b, mask_s, mask_t, wed, wfd,
                            scale, ts=128, interpret=_FUSED_INTERPRET,
                            out_dtype=b_dtype, p_defl=p_mid, acol0=st.acol,
                            mult_blend=mult_blend, with_stats=ws)
                    return run

                if config.feature == FeatureType.BSC:
                    # The BSC penalty schedule is stats-free past it 1
                    # (ghicp_reg.cpp:279-293): the lean kernel variant
                    # skips the CD-statistic passes there (~0.2ms/iter of
                    # VPU work on a VPU-bound kernel).  Traced cond —
                    # it_eff is dynamic under coarse-init schedule shifts.
                    (b, cnt, s1, s2, _cm, ed_max_f, b_max, v1_mid,
                     vsel_mid) = jax.lax.cond(
                        it_eff > 1.0, _fb(False), _fb(True), None)
                else:
                    (b, cnt, s1, s2, _cm, ed_max_f, b_max, v1_mid,
                     vsel_mid) = _fb(True)(None)
                b_max = comm.pmax(b_max)
                n_valid = jnp.maximum(comm.psum(cnt), 1.0)
                mean = comm.psum(s1) / n_valid
                std = jnp.sqrt(jnp.maximum(
                    comm.psum(s2) / n_valid - mean * mean, 0.0))
                if config.feature == FeatureType.BSC:
                    penalty = bsc_penalty(mean, std, it_eff, st.rms,
                                          st.fdm, st.fdstd, st.para1,
                                          st.para2, scale, wed, wfd,
                                          config.penalty_initial)
                elif mult_blend:
                    # blend_fpfh penalty schedule (ghicp_reg.cpp:327-335)
                    pen_late = st.rms * st.para1 * scale * st.para2
                    pen_early = mean / config.penalty_initial
                    penalty = jnp.where(it_eff > 1, pen_late, pen_early)
                else:
                    penalty = jnp.maximum(mean, 1.0)  # blend_none semantics
                dpen = jnp.abs(penalty - st.pen_prev)
                drift = st.price_unc + dpen
                ares = auction_match_benefits(
                    b, penalty, mask_s, mask_t,
                    eps_final=config.km_eps,
                    max_rounds=budget,
                    comm=comm, total_rows=total_rows,
                    rel_eps=config.auction_rel_eps,
                    p0=st.prices, price_uncertainty=drift,
                    use_round_kernel=config.auction_round_kernel,
                    n_phases=config.auction_phases, b_max=b_max,
                    acol0=st.acol, hint_v1=v1_mid + dpen,
                    hint_vsel=vsel_mid,
                    keep_slack_extra=dpen)
                v1_carry = v1_mid + dpen
                return (ares.match.tgt_idx, ares.match.w,
                        ares.match.n_matches, ares.energy, ares.rounds,
                        ares.prices, ares.eps_used, ares.acol, ares.cd_sel,
                        penalty, v1_carry, b_max, comm.pmax(ed_max_f),
                        ares.punc)

            # Single-launch warm iteration (GHICPConfig.warm_fused_kernel):
            # once the penalty schedule is stats-free and an assignment
            # warm start exists, benefit construction + exact v1/vsel at
            # the bidding prices + the keep test + GS bidding + greedy
            # completion all run in ONE Pallas launch — HBM traffic is one
            # FD stream instead of (fd read + b write + b read).
            use_warm_kernel = (config.warm_fused_kernel
                               and (config.feature == FeatureType.BSC
                                    or mult_blend)
                               and config.auction_round_kernel
                               and not comm.distributed
                               and config.auction_phases == 1
                               and (_jax.default_backend() == "tpu"
                                    or _au._KERNEL_INTERPRET)
                               and S % _au._gs_ts(T) == 0
                               # small problems don't need the fusion and
                               # Mosaic rejects the split-one-hot release
                               # reshape at tiny column counts (measured:
                               # compile failure at 256x256)
                               and S >= 1024 and T >= 1024
                               and _au._gs_ts(T) * T <= 256 * 8192)

            def _warm_kernel_solve(_):
                from ghicp_tpu.ops.auction_rounds import \
                    auction_warm_fused_pallas
                zero = jnp.float32(0.0)
                # Stats-free penalty (the gate guarantees it_eff > 1: both
                # schedules take their rms branch past iteration 1 —
                # ghicp_reg.cpp:279-293 for BSC, :327-335 for FPFH/RoPS).
                if mult_blend:
                    penalty = st.rms * st.para1 * scale * st.para2
                else:
                    penalty = bsc_penalty(zero, zero, it_eff, st.rms,
                                          st.fdm, st.fdstd, st.para1,
                                          st.para2, scale, wed, wfd,
                                          config.penalty_initial)
                dpen = jnp.abs(penalty - st.pen_prev)
                # Fully-deflated bidding-start prices (owner-zeroed).  No
                # mid stage here: the kernel measures v1/vsel EXACTLY at
                # these prices, so no +dpen hint adjustment is needed.
                p_start = jnp.where(
                    owner0 >= 0,
                    jnp.maximum(st.prices - (st.price_unc + dpen), 0.0),
                    0.0)
                jc0 = jnp.where(real0, st.acol, 0)
                own_ok = real0 & (owner0[jc0] == row_gid)
                acol_real = jnp.where(real0, st.acol, -1)
                sunk0 = (st.acol == _SINK).astype(jnp.int32)
                ts_gs = _au._gs_ts(T)
                esc_after = jnp.maximum(budget // 4, 1)
                esc_period = jnp.maximum(budget // 16, 1)
                p_k, owner_k, sunk_k, r_k, gcol_k, stats_k = \
                    auction_warm_fused_pallas(
                        kps_c, kp_t_c, fd_b, mask_s, mask_t, wed, wfd,
                        scale, p_start, owner0, acol_real, sunk0, own_ok,
                        -penalty, config.km_eps, config.auction_rel_eps,
                        dpen, budget, ts=ts_gs, inner_cap=1,
                        esc_after=esc_after, esc_period=esc_period,
                        mult_blend=mult_blend,
                        # No bf16 roundtrip: nothing is materialized for
                        # this solve to stay bit-parallel WITH — f32
                        # benefits drop a [ts,C] pass per tile visit and
                        # the cross-iteration price mismatch vs cold bf16
                        # solves (~2^-8 relative) sits inside the punc
                        # slack the warm start already deflates by.
                        quantize=False,
                        interpret=_au._KERNEL_INTERPRET)
                b_max_k = stats_k[0]
                eps_k, eps_keep_k = stats_k[2], stats_k[3]
                # ED max BOUND from coordinate norms (the kernel no longer
                # spends a masked [S, T] reduce on the exact value; the
                # consumer is the next warm start's drift bound, where the
                # triangle-inequality bound costs only proportional slack
                # in dwfd * ed_max — tiny once wfd has decayed).
                ed_max_k = scale * (
                    jnp.max(jnp.where(mask_s,
                                      jnp.linalg.norm(kps_c, axis=-1), 0.0))
                    + jnp.max(jnp.where(mask_t,
                                        jnp.linalg.norm(kp_t_c, axis=-1),
                                        0.0)))
                col_ids = jnp.arange(T, dtype=jnp.int32)
                acol_k = jnp.full((S,), -1, jnp.int32).at[
                    jnp.where(owner_k >= 0, owner_k, T)].set(
                    col_ids, mode="drop")
                acol_k = jnp.where((sunk_k == 1) & (acol_k < 0), _SINK,
                                   acol_k)
                acol_k = jnp.where((acol_k == -1) & (gcol_k >= 0),
                                   jnp.where(gcol_k < T, gcol_k, _SINK),
                                   acol_k)
                eps_bound = eps_k * jnp.exp2(
                    jnp.maximum(r_k - esc_after, 0).astype(jnp.float32)
                    / esc_period.astype(jnp.float32))
                punc_k = jnp.where(p_k != p_start, 2.0 * eps_bound,
                                   eps_keep_k)
                # Matched-pair selection via factor gathers.  The
                # elementwise f32 dot can differ from the kernel's MXU
                # HIGHEST dot by ~1 ulp of its bf16 passes; for pairs with
                # CD exactly at the penalty boundary the gate below may
                # therefore disagree with the in-kernel sink decision at
                # the last bit — a tolerance the epsilon bound dwarfs (a
                # [S,1,8]-batched dot_general for exact parity lowers to
                # pathological tiny matmuls on this backend).
                matched = (acol_k >= 0) & (acol_k < T)
                jc = jnp.where(matched, acol_k, 0)
                tsel = kp_t_c[jc]
                dd = jnp.sum(kps_c * tsel, axis=1)
                s2 = jnp.sum(kps_c * kps_c, axis=1)
                t2 = jnp.sum(tsel * tsel, axis=1)
                ed_sel = scale * jnp.sqrt(
                    jnp.maximum(s2 + t2 - 2.0 * dd, 0.0))
                fd_sel = fd_b[jnp.arange(S), jc].astype(jnp.float32)
                if mult_blend:
                    cd_f = ed_sel * jnp.exp(
                        -wfd * jnp.log(jnp.maximum(fd_sel, 1e-6)))
                else:
                    cd_f = wed * ed_sel + wfd * fd_sel
                m_sel = mask_s & mask_t[jc]
                bsel = jnp.where(m_sel, -cd_f, jnp.float32(-3.0e38))
                real_m = mask_s & matched & (bsel > -penalty)
                w_m = real_m.astype(jnp.float32)
                cor_m = comm.psum(jnp.sum(w_m))
                matched_cd = comm.psum(jnp.sum(jnp.where(real_m, -bsel,
                                                         0.0)))
                n_sq = jnp.float32(max(total_rows, T))
                energy_k = matched_cd + penalty * (n_sq - cor_m)
                return (jc.astype(jnp.int32), w_m,
                        cor_m.astype(jnp.int32), energy_k, r_k, p_k,
                        eps_bound, acol_k, -bsel, penalty,
                        jnp.zeros((S,), jnp.float32), b_max_k,
                        ed_max_k, punc_k)

            if use_warm_kernel:
                warm_g = (it_eff > 1.0) & (st.it > 1)
                outs = jax.lax.cond(warm_g, _warm_kernel_solve,
                                    _full_solve, None)
            else:
                outs = _full_solve(None)
            (tgt_i, w_i, nm_i, energy, rounds, prices, eps_used, acol_new,
             cd_sel, penalty, v1_next_c, b_max_c, ed_max_c,
             punc_new) = outs
            match = MatchResult(tgt_idx=tgt_i, w=w_i, n_matches=nm_i)
            ed_max_fused = ed_max_c
        else:
            ed = euclidean_matrix(st.kps, kp_t, scale)
            if config.feature == FeatureType.BSC:
                cost = blend_bsc(ed, fd, mask_s, mask_t, it_eff, st.rms,
                                 st.fdm, st.fdstd, st.para1, st.para2, scale,
                                 config.weight_changing_rate,
                                 config.penalty_initial, comm)
            elif config.feature in (FeatureType.FPFH, FeatureType.ROPS):
                # RoPS returns |corr| similarity like FPFH -> same
                # multiplicative blend (ghicp_reg.cpp:295-341).
                cost = blend_fpfh(ed, fd, mask_s, mask_t, it_eff, st.rms,
                                  st.para1, st.para2, scale,
                                  config.penalty_initial, comm)
            else:
                cost = blend_none(ed, mask_s, mask_t, comm)
            penalty = cost.penalty

            energy = jnp.float32(0.0)
            rounds = jnp.int32(0)
            prices = st.prices
            eps_used = jnp.float32(0.0)
            acol_new = st.acol
            punc_new = jnp.zeros((T,), jnp.float32)
            if config.correspondence == CorrespondenceType.KM:
                # Price warm start: reuse the previous iteration's dual
                # prices, deflated by a bound on how much any benefit entry
                # can have drifted since (keypoint motion + blend-weight
                # decay + penalty shift + the epsilon overshoot baked into
                # final prices).  Late iterations move keypoints by
                # millimeters, so the bound is tiny and the tie-resolving
                # price wars of earlier solves are not repeated.
                dpen_u = jnp.abs(penalty - st.pen_prev)
                drift = st.price_unc + dpen_u
                ares = auction_match(cost.cd, penalty, mask_s, mask_t,
                                     eps_final=config.km_eps,
                                     max_rounds=budget,
                                     comm=comm, total_rows=total_rows,
                                     rel_eps=config.auction_rel_eps,
                                     p0=st.prices, price_uncertainty=drift,
                                     quantize_bf16=config.auction_bf16,
                                     use_round_kernel=(
                                         config.auction_round_kernel),
                                     n_phases=config.auction_phases,
                                     acol0=st.acol,
                                     keep_slack_extra=dpen_u)
                match = ares.match
                energy = ares.energy
                rounds = ares.rounds
                prices = ares.prices
                eps_used = ares.eps_used
                acol_new = ares.acol
                cd_sel = ares.cd_sel
                punc_new = ares.punc
            elif config.correspondence == CorrespondenceType.NNR:
                match = nnr_match(cost.cd, mask_s, mask_t, comm)
                cd_sel = cost.cd[jnp.arange(S), match.tgt_idx]
            else:
                match = nn_match(cost.cd, penalty, mask_s, mask_t, comm)
                cd_sel = cost.cd[jnp.arange(S), match.tgt_idx]

        w = match.w
        cor = comm.psum(jnp.sum(w))
        if fsel is None:
            fsel = fd_stats[jnp.arange(S), match.tgt_idx]
        rmse, fdm, fdstd = _matched_stats(st.kps, kp_t, fsel,
                                          match.tgt_idx, w, comm)

        converged = st.converged | (cor < config.min_cor)
        iou = cor / jnp.maximum(ns + nt - cor, 1.0)

        tgt_pts = kp_t[match.tgt_idx]
        # Robust estimation (config-gated upgrade; reference = plain SVD
        # over all matched pairs).  See GHICPConfig.confidence_weighting.
        # Margin weights need the KM gate semantics (penalty = the
        # rejection threshold the solver actually applied); the NN/NNR
        # matchers don't gate on penalty, so cd > penalty pairs are
        # legitimate there and must not be zeroed.
        w_est = w
        if (config.confidence_weighting
                and config.correspondence == CorrespondenceType.KM):
            margin = jnp.maximum(penalty - cd_sel, 0.0)
            margin = jnp.where(w > 0, margin, 0.0)
            msum = jnp.maximum(comm.psum(jnp.sum(margin)), 1e-12)
            nw = jnp.maximum(comm.psum(jnp.sum(w)), 1.0)
            w_est = margin * (nw / msum)   # mean weight 1 over matched pairs
        rt_step = estimate(st.kps, tgt_pts, w_est, dof=config.reg_dof,
                           comm=comm)
        # IRLS trimming likewise targets the KM path's wide-gate dilution
        # (thousands of matches, many wrong-but-consistent).  On the sparse
        # NN/NNR baselines the high-residual pairs ARE the rotation signal;
        # trimming them stalls convergence (measured: station-graph NNR at
        # 512 keypoints, 0.25deg -> 7.9deg).
        irls_rounds = (config.robust_irls_rounds
                       if config.correspondence == CorrespondenceType.KM
                       else 0)
        for _ in range(irls_rounds):
            resid = jnp.linalg.norm(tf.apply(rt_step, st.kps) - tgt_pts,
                                    axis=-1)
            # Tukey scale from the matched-residual MEDIAN, not the mean:
            # on coverage-asymmetric pairs (per-origin TLS scans) the
            # penalty floor keeps the gate wide and a large fraction of
            # the complete matching is geometric junk at meters — a
            # mean-based c is then outlier-owned and trims nothing
            # (measured: scan-pair translation drifting to 0.47 m with a
            # 0.03 m coarse init), while the median sits at the inlier/
            # boundary scale and locks onto the consensus set.
            rscale = _masked_median_log(resid, w_est > 0, comm)
            c = config.robust_trim_c * rscale + 1e-12
            u = jnp.minimum(resid / c, 1.0)
            wr = w_est * (1.0 - u * u) ** 2   # Tukey biweight
            rt_step = estimate(st.kps, tgt_pts, wr, dof=config.reg_dof,
                               comm=comm)
        R, t = tf.rotation(rt_step), tf.translation(rt_step)
        ang = tf.euler_deg_zyx(R)
        small = (jnp.all(jnp.abs(t) < config.converge_translation)
                 & jnp.all(jnp.abs(ang) < config.converge_rotation))
        converged = converged | small

        kps_new = tf.apply(rt_step, st.kps)
        n_for_after = jnp.maximum(cor, 1.0)
        se_after = comm.psum(
            jnp.sum(w * jnp.sum((kps_new - tgt_pts) ** 2, axis=-1)))
        rmse_after = jnp.sqrt(se_after / n_for_after)

        # IoU-driven penalty adjustment (ghicp_reg.cpp:771-789).
        ratio = config.weight_adjustment_ratio
        est = config.estimated_overlap
        iou_safe = jnp.maximum(iou, 1e-9)
        up = est / iou_safe > ratio
        down = iou_safe / est > ratio
        delta = jnp.where(up, config.weight_adjustment_step,
                          jnp.where(down, -config.weight_adjustment_step, 0.0))

        m = st.metrics
        i = st.it
        metrics = IterationMetrics(
            energy=m.energy.at[i].set(energy),
            rmse=m.rmse.at[i].set(rmse),
            rmse_after=m.rmse_after.at[i].set(rmse_after),
            cor=m.cor.at[i].set(cor.astype(jnp.int32)),
            iou=m.iou.at[i].set(iou),
            penalty=m.penalty.at[i].set(penalty),
            rounds=m.rounds.at[i].set(rounds))

        matches = jnp.where(w > 0, match.tgt_idx, -1)
        # Price-overshoot bound for the next iteration's warm start.  Only
        # over-priced columns are unsafe (they push rows to the sink), and a
        # price is over-supported only where the COST ROSE, so the bound
        # tracks cost increases, not |change|:
        #   BSC:  dcd = dwfd*(ed - fd) + wed*d(ed) <= dwfd*ed_max + d_ed
        #         (the decaying wfd only lowers fd-heavy costs — prices
        #         there rise, and under-priced starts merely rebid);
        #   none: cd = ed -> d_ed;  FPFH: multiplicative blend, no cheap
        #         bound -> infinite uncertainty = cold start.
        max_disp = comm.pmax(jnp.max(jnp.where(
            mask_s, jnp.linalg.norm(kps_new - st.kps, axis=-1), 0.0)))
        d_ed = scale * max_disp
        scarry_new = st.scarry
        if config.feature == FeatureType.BSC:
            r = config.weight_changing_rate
            i_eff = i.astype(jnp.float32) + st.it_shift
            dwfd = jnp.exp(-i_eff / r) - jnp.exp(-(i_eff + 1.0) / r)
            if ed_max_fused is not None:
                ed_max = comm.pmax(ed_max_fused)
            else:
                ed_max = comm.pmax(jnp.max(jnp.where(
                    mask_s[:, None] & mask_t[None, :], ed, 0.0)))
            drift_next = d_ed + dwfd * (ed_max + d_ed)
            if (use_stream and config.stream_fast_path
                    and config.correspondence == CorrespondenceType.KM):
                # Hint carry for the streaming warm fast path: fresh or
                # propagated per-row v1 bounds, spread max, and the ED max
                # inflated by this iteration's keypoint motion (still an
                # upper bound after the move).  Benefit-rise bounds for
                # the i -> i+1 transition: ED can shrink by <= d_ed
                # (additive v1_drift); the wfd-decay rise is carried both
                # as the global dwfd*fd_max term (fd_term; fd_max is the
                # sweep's measured max Hamming FD — exact and permanent)
                # and as the decay ratio r = dwfd/wfd_next for the
                # per-row self-referential bound (StreamCarry docs).
                fd_cap = comm.pmax(sres.fd_max)
                wfd_next = jnp.exp(-(i_eff + 1.0) / r)
                scarry_new = StreamCarry(
                    ok=jnp.bool_(True),
                    v1_ub=sres.v1_next,
                    b_max=sres.b_max_next,
                    ed_max=ed_max + d_ed,
                    fd_max=fd_cap,
                    v1_drift=d_ed,
                    fd_term=dwfd * fd_cap,
                    decay_ratio=dwfd / jnp.maximum(wfd_next, 1e-30))
        elif config.feature in (FeatureType.FPFH, FeatureType.ROPS):
            if fd_min_static is not None:
                # Only the ED rise can over-price a column; the blend
                # amplifies it by at most fd^(-k) <= fd_min^(-k_next).
                i_eff = i.astype(jnp.float32) + st.it_shift
                k_next = 1.0 / (i_eff + 2.0)
                drift_next = d_ed * jnp.exp(
                    k_next * jnp.log(1.0 / fd_min_static))
            else:
                # Streaming mult lane: fd_min unmeasured -> cold start.
                drift_next = jnp.float32(3.0e38)
        else:
            drift_next = d_ed
        return _State(
            kps=kps_new, rt=tf.compose(rt_step, st.rt), it=i + 1,
            converged=converged, rms=rmse, fdm=fdm, fdstd=fdstd,
            para1=st.para1 + delta, para2=st.para2 + delta,
            metrics=metrics, matches=matches, rmse_after=rmse_after,
            prices=prices, acol=acol_new,
            price_unc=punc_new + drift_next,
            pen_prev=penalty, it_shift=st.it_shift, scarry=scarry_new)

    return body


def ghicp_loop(kp_s: Array, mask_s: Array, kp_t: Array, mask_t: Array,
               fd: Optional[Array], bbx_magnitude: Array,
               config: GHICPConfig,
               comm: Comm = LOCAL, total_rows: Optional[int] = None,
               init_transform: Optional[Array] = None,
               it_shift: float = 0.0, stream=None) -> GHICPResult:
    """The GH-ICP fixed-point loop (unjitted body — see ``ghicp_register``
    for the single-device entry and ``ghicp_tpu.shard`` for the SPMD one).

    ``fd``: [S, T] feature distance (Hamming for BSC, |correlation|
    similarity for FPFH, zeros for none), computed once like the reference
    (ghicp_reg.cpp:33-44).  Under a distributed ``comm``, kp_s/mask_s/fd are
    the local row shards and every reduction crosses the mesh axis.

    ``stream`` (StreamFeatures, with ``fd=None``): the matrix-free lane —
    no [S, T] tensor exists anywhere in the loop (ops/stream_kernel.py).
    """
    if total_rows is None:
        total_rows = kp_s.shape[0]
    state0 = _initial_state(kp_s, kp_t.shape[0], config, init_transform,
                            it_shift)
    body = _make_body(kp_t, mask_s, mask_t, fd, bbx_magnitude, config, comm,
                      total_rows, stream=stream)

    def cond(st: _State):
        return (~st.converged) & (st.it < config.max_iterations)

    final = jax.lax.while_loop(cond, body, state0)
    success = final.rmse_after < 1.5 * config.non_max_radius
    return GHICPResult(transform=final.rt, iterations=final.it,
                       converged=final.converged, success=success,
                       final_rmse=final.rmse_after, metrics=final.metrics,
                       matches=final.matches)


@functools.partial(jax.jit, static_argnames=("config",))
def _final_resolve_jit(state: _State, kp_t: Array, mask_s: Array,
                       mask_t: Array, fd: Optional[Array],
                       bbx_magnitude: Array, config: GHICPConfig,
                       stream=None):
    """One full-budget KM re-solve at the FINAL pose: the honest matching.

    The engine's production budgets truncate hard and greedy-complete
    contested rows with duplicate target columns — harmless to the pose
    (margin weights + IRLS discount them) but a violation of KM's
    one-to-one output semantics (km.cpp:144-162) in the exported
    correspondences, and a floor under the matched RMSE the success
    verdict reads (ghicp_reg.cpp:918-924).  This resolve warm-starts from
    the final state's prices+assignment (duplicate losers fail the
    ownership test and re-bid) with a generous sweep budget, so only the
    contested tail re-auctions — one extra solve per registration.

    Runs at the ABSOLUTE ``km_eps`` (rel_eps 0, the exact-parity mode):
    the production rel_eps floor (spread/64) is sized for per-iteration
    solves whose slack the next iteration absorbs — at the FINAL matching
    it is ~an NMS radius of per-pair slack and measurably inflates the
    honest matched RMSE (measured 1.60 vs the 1.23 Hungarian optimum on
    the CLI flagship scene; km_eps lands within a few percent).

    Returns (matches [S], n_matches, rmse) over the clean matching.
    """
    from ghicp_tpu.matching.cost import bsc_penalty  # noqa: F401
    scale = config.scale_factor * bbx_magnitude
    S = state.kps.shape[0]
    T = kp_t.shape[0]
    it_eff = jnp.maximum(state.it.astype(jnp.float32) - 1.0, 0.0) \
        + state.it_shift
    penalty = state.pen_prev      # the gate the last iteration applied
    mult_blend = config.feature in (FeatureType.FPFH, FeatureType.ROPS)
    if config.feature == FeatureType.BSC:
        wfd = jnp.exp(-it_eff / config.weight_changing_rate)
        wed = 1.0 - wfd
    elif mult_blend:
        wfd = 1.0 / (it_eff + 1.0)
        wed = jnp.float32(1.0)
    else:
        wfd = jnp.float32(0.0)
        wed = jnp.float32(1.0)
    budget = jnp.int32(config.final_resolve_rounds)
    if stream is not None:
        # Streaming lane: NO extra solve.  A tight-eps re-solve releases
        # the entire coarse-eps in-loop matching (64 full O(S*T) sweeps,
        # 5.5 s at 48k) and a coarse-eps re-solve degrades it (re-bid
        # rows land ~spread/64 away).  The engine's own final matching,
        # deduplicated by construction below, already carries the lane's
        # certified quality — the one-to-one invariant and the honest
        # RMSE cost nothing.
        tgt_idx = jnp.where((state.acol >= 0) & (state.acol < T),
                            state.acol, 0)
        w = (state.matches >= 0).astype(jnp.float32)
    else:
        ed = euclidean_matrix(state.kps, kp_t, scale)
        if config.feature == FeatureType.BSC:
            cd = jnp.where(mask_s[:, None] & mask_t[None, :],
                           wed * ed + wfd * fd.astype(jnp.float32),
                           jnp.inf)
        elif mult_blend:
            cd = jnp.where(mask_s[:, None] & mask_t[None, :],
                           ed / jnp.power(jnp.maximum(
                               fd.astype(jnp.float32), 1e-6), wfd),
                           jnp.inf)
        else:
            cd = jnp.where(mask_s[:, None] & mask_t[None, :], ed, jnp.inf)
        ares = auction_match(cd, penalty, mask_s, mask_t,
                             eps_final=config.km_eps, max_rounds=budget,
                             rel_eps=0.0,
                             p0=state.prices,
                             price_uncertainty=state.price_unc,
                             quantize_bf16=config.auction_bf16,
                             use_round_kernel=config.auction_round_kernel,
                             n_phases=1, acol0=state.acol,
                             keep_slack_extra=jnp.float32(0.0))
        match, tgt_idx, w = ares.match, ares.match.tgt_idx, ares.match.w
    # One-to-one BY CONSTRUCTION: budget-exhausted greedy completions may
    # duplicate columns; keep one row per column (max row id) and report
    # the losers unmatched — the km.cpp:144-162 output invariant holds at
    # any budget.
    rows = jnp.arange(S, dtype=jnp.int32)
    own = jnp.full((T,), -1, jnp.int32).at[
        jnp.where(w > 0, tgt_idx, T)].max(rows, mode="drop")
    keep1 = (w > 0) & (own[tgt_idx] == rows)
    w1 = keep1.astype(jnp.float32)
    matches = jnp.where(keep1, tgt_idx, -1)
    tgt_pts = kp_t[tgt_idx]
    n = jnp.maximum(jnp.sum(w1), 1.0)
    se = jnp.sum(w1 * jnp.sum((state.kps - tgt_pts) ** 2, axis=-1))
    return matches, jnp.sum(w1).astype(jnp.int32), jnp.sqrt(se / n)


@functools.partial(jax.jit, static_argnames=("config", "limit_step"))
def _ghicp_chunk(state: _State, kp_t: Array, mask_s: Array, mask_t: Array,
                 fd: Optional[Array], bbx_magnitude: Array,
                 config: GHICPConfig, limit_step: int,
                 stream=None) -> _State:
    """Advance the GH-ICP loop by at most ``limit_step`` iterations."""
    body = _make_body(kp_t, mask_s, mask_t, fd, bbx_magnitude, config, LOCAL,
                      mask_s.shape[0], stream=stream)
    limit = jnp.minimum(state.it + limit_step,
                        jnp.int32(config.max_iterations))

    def cond(st: _State):
        return (~st.converged) & (st.it < limit)

    return jax.lax.while_loop(cond, body, state)


def ghicp_register_chunked(kp_s: Array, mask_s: Array, kp_t: Array,
                           mask_t: Array, fd: Optional[Array],
                           bbx_magnitude: Array,
                           config: GHICPConfig, chunk: int = 8,
                           init_transform: Optional[Array] = None,
                           it_shift: float = 0.0,
                           stream=None,
                           iteration_callback=None,
                           overhead_out: Optional[dict] = None
                           ) -> GHICPResult:
    """Host-stepped GH-ICP: the same loop dispatched ``chunk`` iterations at
    a time.

    Functionally identical to :func:`ghicp_register`; used by the pipeline
    for large keypoint sets where one device dispatch would run for minutes
    (remote-TPU transports impose execution deadlines), and doubles as the
    observability hook — the host sees state between chunks.

    ``iteration_callback(it, kps, matches)`` (optional) is invoked at every
    chunk boundary with the iteration count, the CURRENT moving source
    keypoints [S, 3] and the current per-row target matches [S] (all host
    numpy) — the registration-state export surface replacing the
    reference's per-iteration viewer refresh + Corres.txt dumps
    (cloud_viewer.hpp:165-249, km.cpp:148; SURVEY.md §5 substitution).
    Set ``chunk=k`` for an every-k-iterations cadence.
    """
    from ghicp_tpu.core.types import fetch_xyz
    state = _initial_state(kp_s, kp_t.shape[0], config, init_transform,
                           it_shift)
    while True:
        state = _ghicp_chunk(state, kp_t, mask_s, mask_t, fd,
                             jnp.asarray(bbx_magnitude, jnp.float32),
                             config, chunk, stream=stream)
        # One batched fetch as a single [2] array: separate scalar
        # materializations cost a remote-transport round trip EACH
        # (~26ms through the tunnel).
        conv, it = jax.device_get(jnp.stack(
            [state.converged.astype(jnp.int32), state.it]))
        if iteration_callback is not None:
            iteration_callback(int(it), fetch_xyz(state.kps),
                               np.asarray(state.matches))
        if bool(conv) or int(it) >= config.max_iterations:
            break
    if overhead_out is not None:
        # Fixed per-dispatch overhead probe (roofline reporting): dispatch
        # the SAME chunk executable once more — the loop condition is
        # already false (converged or at max_iterations) so zero
        # iterations execute — and time the dispatch + scalar fetch.
        # device_ms_per_iter = (wall - overhead) / iterations.
        import time as _time
        t0 = _time.perf_counter()
        state2 = _ghicp_chunk(state, kp_t, mask_s, mask_t, fd,
                              jnp.asarray(bbx_magnitude, jnp.float32),
                              config, chunk, stream=stream)
        jax.device_get(jnp.stack(
            [state2.converged.astype(jnp.int32), state2.it]))
        overhead_out["dispatch_overhead"] = _time.perf_counter() - t0
    matches = state.matches
    final_rmse = state.rmse_after
    if (config.final_resolve_rounds > 0
            and config.correspondence == CorrespondenceType.KM):
        # Clean one-to-one final matching + the RMSE the success verdict
        # reads (see _final_resolve_jit).  The reference's last-iteration
        # KM matching is one-to-one by construction; ours is only after
        # this resolve.
        matches, _, final_rmse = _final_resolve_jit(
            state, kp_t, mask_s, mask_t, fd,
            jnp.asarray(bbx_magnitude, jnp.float32), config, stream=stream)
    success = final_rmse < 1.5 * config.non_max_radius
    return GHICPResult(transform=state.rt, iterations=state.it,
                       converged=state.converged, success=success,
                       final_rmse=final_rmse, metrics=state.metrics,
                       matches=matches)


@functools.partial(jax.jit, static_argnames=("config", "it_shift"))
def ghicp_register(kp_s: Array, mask_s: Array, kp_t: Array, mask_t: Array,
                   fd: Optional[Array], bbx_magnitude: Array,
                   config: GHICPConfig,
                   init_transform: Optional[Array] = None,
                   it_shift: float = 0.0, stream=None) -> GHICPResult:
    """Single-device jitted entry point for the GH-ICP loop."""
    return ghicp_loop(kp_s, mask_s, kp_t, mask_t, fd, bbx_magnitude,
                      config, LOCAL, init_transform=init_transform,
                      it_shift=it_shift, stream=stream)


@functools.partial(jax.jit, static_argnames=("config", "it_shift"))
def ghicp_register_batched(kp_s: Array, mask_s: Array, kp_t: Array,
                           mask_t: Array, fd: Array, bbx_magnitude: Array,
                           config: GHICPConfig,
                           init_transform: Optional[Array] = None,
                           it_shift: float = 0.0) -> GHICPResult:
    """Batched multi-pair registration: one vmapped engine over a leading
    pair axis (SURVEY.md §2 parallelism item (c)).

    All inputs gain a leading [P] axis (shared keypoint capacities);
    ``init_transform`` is an optional [P, 4, 4] per-pair warm start (coarse
    init), applied with the schedule offset ``it_shift`` like the
    single-pair pipeline.  Under vmap the convergence `while_loop` runs
    until every pair converges; pairs that finish early idle inside masked
    iterations — the batch amortizes kernel launches and keeps the chip
    saturated for station-graph sweeps.

    The single-pair Pallas kernels (fused benefit, GS auction phases) do
    not batch — they are forced off here; the XLA engine paths vmap
    cleanly and are fast at station-graph keypoint capacities.
    """
    import dataclasses as _dc
    cfg = _dc.replace(config, fused_cost_kernel=False,
                      auction_round_kernel=False)
    if init_transform is None:
        fn = jax.vmap(lambda a, b, c, d, e, f: ghicp_loop(
            a, b, c, d, e, f, cfg, LOCAL))
        return fn(kp_s, mask_s, kp_t, mask_t, fd, bbx_magnitude)
    fn = jax.vmap(lambda a, b, c, d, e, f, t0: ghicp_loop(
        a, b, c, d, e, f, cfg, LOCAL, init_transform=t0,
        it_shift=it_shift))
    return fn(kp_s, mask_s, kp_t, mask_t, fd, bbx_magnitude, init_transform)


def ghicp_register_batched_sharded(kp_s: Array, mask_s: Array, kp_t: Array,
                                   mask_t: Array, fd: Array,
                                   bbx_magnitude: Array,
                                   config: GHICPConfig, mesh,
                                   init_transform: Optional[Array] = None,
                                   it_shift: float = 0.0) -> GHICPResult:
    """Batched multi-pair registration with ONE PAIR PER DEVICE, keeping
    the Pallas fast paths.

    ``ghicp_register_batched`` vmaps the engine, which forces the fused
    benefit / GS auction kernels off (Pallas calls don't batch).  Here the
    leading pair axis is SHARDED over the mesh instead: inside the
    ``shard_map`` each device holds exactly one pair and runs the plain
    single-pair engine — kernel gates see a LOCAL comm (no cross-pair
    collectives exist) and stay on.  Use when pairs >= devices and each
    pair is big enough for the kernels to pay (station graphs of
    TLS-sized stations); fall back to the vmapped form for many small
    pairs.  Requires P % n_devices == 0 (pad with dummy pairs).
    """
    import functools as _ft

    from jax.sharding import PartitionSpec as _P

    from ghicp_tpu.shard.spmd import AXIS
    P = kp_s.shape[0]
    n = mesh.devices.size
    if P % n != 0:
        raise ValueError(f"pair count {P} not divisible by mesh size {n}")

    out_specs = GHICPResult(
        transform=_P(AXIS), iterations=_P(AXIS), converged=_P(AXIS),
        success=_P(AXIS), final_rmse=_P(AXIS),
        metrics=IterationMetrics(
            energy=_P(AXIS), rmse=_P(AXIS), rmse_after=_P(AXIS),
            cor=_P(AXIS), iou=_P(AXIS), penalty=_P(AXIS),
            rounds=_P(AXIS)),
        matches=_P(AXIS))
    t_spec = _P(AXIS) if init_transform is not None else _P()

    @jax.jit
    @_ft.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(_P(AXIS), _P(AXIS), _P(AXIS), _P(AXIS), _P(AXIS),
                  _P(AXIS), t_spec),
        out_specs=out_specs, check_vma=False)
    def run(kp_s, mask_s, kp_t, mask_t, fd, bbx, t0):
        # P/n local pairs per device: a python loop over them (usually 1)
        # keeps each solve a plain single-device engine call — kernels on.
        outs = []
        for k in range(P // n):
            t0k = None if init_transform is None else t0[k]
            outs.append(ghicp_loop(kp_s[k], mask_s[k], kp_t[k], mask_t[k],
                                   fd[k], bbx[k], config, LOCAL,
                                   init_transform=t0k,
                                   it_shift=it_shift))
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    t0_in = (jnp.zeros((P, 4, 4), jnp.float32)
             if init_transform is None else init_transform)
    return run(kp_s, mask_s, kp_t, mask_t, fd,
               jnp.asarray(bbx_magnitude, jnp.float32), t0_in)
