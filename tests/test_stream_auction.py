"""Streaming (matrix-free) auction vs the dense solver / Hungarian."""
import numpy as np
import jax.numpy as jnp

from scipy.optimize import linear_sum_assignment

from ghicp_tpu.features.bsc import pack_bits
from ghicp_tpu.features.hamming import min_hamming_fd
from ghicp_tpu.matching.stream_auction import stream_solve
from ghicp_tpu.ops.stream_kernel import make_stream_features

_SINK = 2**30


def _problem(S=192, C=256, V=2, n_bits=441, seed=0, extent=20.0):
    rng = np.random.default_rng(seed)
    kp_s = rng.uniform(-extent / 2, extent / 2, (S, 3)).astype(np.float32)
    kp_t = rng.uniform(-extent / 2, extent / 2, (C, 3)).astype(np.float32)
    bits_s = (rng.random((V, S, n_bits)) < 0.3).astype(np.float32)
    bits_t = (rng.random((1, C, n_bits)) < 0.3).astype(np.float32)
    packed_s = pack_bits(jnp.asarray(bits_s))
    packed_t = pack_bits(jnp.asarray(bits_t))
    feats = make_stream_features(packed_s=packed_s, packed_t=packed_t,
                                 n_bits=n_bits)
    fd = np.asarray(min_hamming_fd(packed_s, packed_t[:1], n_bits))
    return kp_s, kp_t, feats, fd


def _dense_cd(kp_s, kp_t, fd, wed, wfd, scale):
    ed = scale * np.linalg.norm(kp_s[:, None] - kp_t[None], axis=-1)
    return (wed * ed + wfd * fd).astype(np.float32)


def _hungarian_energy(cd, penalty):
    ns, nt = cd.shape
    n = max(ns, nt)
    b = np.full((n, n), -penalty)
    b[:ns, :nt] = np.where(cd < penalty, -cd, -penalty)
    ri, ci = linear_sum_assignment(-b)
    return -b[ri, ci].sum()   # = optimal ENERGY (matched cd + penalties)


def _solve(kp_s, kp_t, feats, wed, wfd, scale, penalty_fn, budget,
           p0=None, unc=3.0e38, acol0=None, pen_prev=0.0, eps=0.01,
           rel_eps=0.0):
    S, C = kp_s.shape[0], kp_t.shape[0]
    return stream_solve(
        jnp.asarray(kp_s), jnp.asarray(kp_t), feats,
        jnp.ones(S, bool), jnp.ones(C, bool), wed, wfd, scale,
        penalty_fn, eps_final=eps, rel_eps=rel_eps, max_sweeps=budget,
        p0=jnp.zeros(C, jnp.float32) if p0 is None else p0,
        price_uncertainty=unc,
        acol0=jnp.full((S,), -1, jnp.int32) if acol0 is None else acol0,
        pen_prev=pen_prev, use_kernel=False, tc=128)


def test_stream_solve_matches_hungarian_generous_budget():
    kp_s, kp_t, feats, fd = _problem()
    wed, wfd, scale = 0.4, 0.6, 0.12

    def penalty_fn(mean, std):
        return mean - 2.0 * std

    res = _solve(kp_s, kp_t, feats, wed, wfd, scale, penalty_fn,
                 budget=4000, eps=0.01)
    cd = _dense_cd(kp_s, kp_t, fd, wed, wfd, scale)
    pen = float(cd.mean() - 2.0 * cd.std())
    np.testing.assert_allclose(float(res.penalty), pen, rtol=1e-3)
    opt = _hungarian_energy(cd, float(res.penalty))
    got = float(res.energy)
    n = max(cd.shape)
    # epsilon-CS bound (escalation may widen the effective epsilon)
    assert got <= opt + n * float(res.eps_used) + 1e-2, (got, opt)
    # every reported match respects the KM gate
    w = np.asarray(res.match.w)
    tj = np.asarray(res.match.tgt_idx)
    for i in np.nonzero(w > 0)[0]:
        assert cd[i, tj[i]] < float(res.penalty)
    # auction-assigned columns are one-to-one
    real = tj[w > 0]
    assert len(real) == len(np.unique(real))


def test_stream_solve_outliers_go_to_sink():
    """Rows with no gated column must be reported unmatched (KM dummy-match
    semantics, km.cpp:162)."""
    kp_s, kp_t, feats, fd = _problem(S=128, C=128, seed=3)
    # Move the last 16 source keypoints far away: their ED exceeds any
    # penalty and the gate rejects all their pairs.
    kp_s = kp_s.copy()
    kp_s[-16:] += 500.0
    wed, wfd, scale = 1.0, 0.0, 0.1

    def penalty_fn(mean, std):
        return jnp.float32(3.0)   # ~30m gate at scale 0.1

    res = _solve(kp_s, kp_t, feats, wed, wfd, scale, penalty_fn, budget=2000)
    w = np.asarray(res.match.w)
    assert (w[-16:] == 0).all()
    acol = np.asarray(res.acol)
    assert (acol[-16:] == _SINK).all()


def test_stream_solve_warm_start_matches_cold():
    """Second solve on slightly-moved keypoints, warm-started with the
    first solve's prices/assignment, reaches the cold solve's energy."""
    kp_s, kp_t, feats, fd = _problem(seed=5)
    wed, wfd, scale = 0.8, 0.2, 0.1

    def penalty_fn(mean, std):
        return mean - 1.0 * std

    res1 = _solve(kp_s, kp_t, feats, wed, wfd, scale, penalty_fn,
                  budget=4000)
    # keypoints move by <= 2mm -> benefit drift <= scale * 0.002
    rng = np.random.default_rng(6)
    kp_s2 = kp_s + rng.uniform(-2e-3, 2e-3, kp_s.shape).astype(np.float32)
    drift = 0.1 * 2e-3 * np.sqrt(3) + 2 * float(res1.eps_used)
    cold = _solve(kp_s2, kp_t, feats, wed, wfd, scale, penalty_fn,
                  budget=4000)
    warm = _solve(kp_s2, kp_t, feats, wed, wfd, scale, penalty_fn,
                  budget=4000, p0=res1.prices, unc=drift, acol0=res1.acol,
                  pen_prev=float(res1.penalty))
    n = max(kp_s.shape[0], kp_t.shape[0])
    bound = n * max(float(cold.eps_used), float(warm.eps_used)) + 1e-2
    assert abs(float(warm.energy) - float(cold.energy)) <= bound, (
        float(warm.energy), float(cold.energy))
    # Warm start should spend far fewer sweeps than the cold solve.
    assert int(warm.rounds) <= int(cold.rounds)


def test_stream_solve_production_budget_quality():
    """Budget-2 streaming solve on a structured pair: energy within 1% of
    Hungarian (the dense production contract carried over)."""
    rng = np.random.default_rng(7)
    S = C = 256
    kp = rng.uniform(0, 25, (S, 3)).astype(np.float32)
    kp_s = kp + rng.normal(0, 0.05, kp.shape).astype(np.float32)
    perm = rng.permutation(S)
    kp_t = (kp + rng.normal(0, 0.05, kp.shape).astype(np.float32))[perm]
    n_bits = 441
    bits = (rng.random((S, n_bits)) < 0.3).astype(np.float32)
    flip = rng.random((S, n_bits)) < 0.08
    bits_t = np.where(flip, 1.0 - bits, bits)[perm].astype(np.float32)
    packed_s = pack_bits(jnp.asarray(bits[None]))
    packed_t = pack_bits(jnp.asarray(bits_t[None]))
    feats = make_stream_features(packed_s=packed_s, packed_t=packed_t,
                                 n_bits=n_bits)
    fd = np.asarray(min_hamming_fd(packed_s, packed_t[:1], n_bits))
    wed, wfd, scale = 0.3, 0.7, 0.005 * 43.0

    def penalty_fn(mean, std):
        return mean - 2.0 * std

    res = _solve(kp_s, kp_t, feats, wed, wfd, scale, penalty_fn, budget=2,
                 rel_eps=1.0 / 64.0)
    cd = _dense_cd(kp_s, kp_t, fd, wed, wfd, scale)
    opt = _hungarian_energy(cd, float(res.penalty))
    got = float(res.energy)
    assert (got - opt) / abs(opt) < 0.01, (got, opt)


def test_stream_solve_compaction_is_exact():
    """open_cap compaction (bidding/completion sweeps over only the open
    rows) is a pure dataflow change: matchings, prices and energy are
    bit-identical to the full-sweep solve, warm or cold."""
    kp_s, kp_t, feats, fd = _problem(seed=11)
    wed, wfd, scale = 0.6, 0.4, 0.1

    def penalty_fn(mean, std):
        return mean - 1.0 * std

    def run(open_cap, **kw):
        S, C = kp_s.shape[0], kp_t.shape[0]
        return stream_solve(
            jnp.asarray(kp_s), jnp.asarray(kp_t), feats,
            jnp.ones(S, bool), jnp.ones(C, bool), wed, wfd, scale,
            penalty_fn, eps_final=0.01, rel_eps=1.0 / 64, max_sweeps=64,
            p0=kw.get("p0", jnp.zeros(C, jnp.float32)),
            price_uncertainty=kw.get("unc", 3.0e38),
            acol0=kw.get("acol0", jnp.full((S,), -1, jnp.int32)),
            pen_prev=kw.get("pen_prev", 0.0), use_kernel=False, tc=128,
            open_cap=open_cap)

    cold_full = run(0)
    cold_cap = run(64)   # 192 rows open at start -> full-sweep fallback,
                         # compact once the open set shrinks below 64
    np.testing.assert_array_equal(np.asarray(cold_full.acol),
                                  np.asarray(cold_cap.acol))
    np.testing.assert_allclose(float(cold_full.energy),
                               float(cold_cap.energy), rtol=1e-6)
    # Warm re-solve on moved keypoints: compaction still exact.
    rng = np.random.default_rng(1)
    kp_s2 = kp_s + rng.uniform(-2e-3, 2e-3, kp_s.shape).astype(np.float32)
    drift = 0.1 * 2e-3 * np.sqrt(3) + 2 * float(cold_full.eps_used)
    warm_kw = dict(p0=cold_full.prices, unc=drift, acol0=cold_full.acol,
                   pen_prev=float(cold_full.penalty))
    kp_s = kp_s2  # noqa: F841  (runs below rebind via closure)
    w_full = stream_solve(
        jnp.asarray(kp_s2), jnp.asarray(kp_t), feats,
        jnp.ones(len(kp_s2), bool), jnp.ones(len(kp_t), bool),
        wed, wfd, scale, penalty_fn, eps_final=0.01, rel_eps=1.0 / 64,
        max_sweeps=64, p0=warm_kw["p0"], price_uncertainty=warm_kw["unc"],
        acol0=warm_kw["acol0"], pen_prev=warm_kw["pen_prev"],
        use_kernel=False, tc=128, open_cap=0)
    w_cap = stream_solve(
        jnp.asarray(kp_s2), jnp.asarray(kp_t), feats,
        jnp.ones(len(kp_s2), bool), jnp.ones(len(kp_t), bool),
        wed, wfd, scale, penalty_fn, eps_final=0.01, rel_eps=1.0 / 64,
        max_sweeps=64, p0=warm_kw["p0"], price_uncertainty=warm_kw["unc"],
        acol0=warm_kw["acol0"], pen_prev=warm_kw["pen_prev"],
        use_kernel=False, tc=128, open_cap=64)
    np.testing.assert_array_equal(np.asarray(w_full.acol),
                                  np.asarray(w_cap.acol))
    np.testing.assert_allclose(np.asarray(w_full.prices),
                               np.asarray(w_cap.prices), atol=1e-6)


def test_stream_solve_carry_fast_path_quality():
    """stats_free + carry (skip sweep-0): the fast-path warm solve reaches
    the cold solve's energy within the epsilon-CS bound and keeps the
    KM gate exact."""
    from ghicp_tpu.matching.stream_auction import StreamCarry
    kp_s, kp_t, feats, fd = _problem(seed=13)
    wed, wfd, scale = 0.7, 0.3, 0.1
    pen_const = 18.0    # stats-free schedule (late-iteration semantics)

    def penalty_fn(mean, std):
        return jnp.float32(pen_const)

    res1 = _solve(kp_s, kp_t, feats, wed, wfd, scale, penalty_fn,
                  budget=2000, eps=0.01)
    rng = np.random.default_rng(2)
    kp_s2 = kp_s + rng.uniform(-2e-3, 2e-3, kp_s.shape).astype(np.float32)
    drift = 0.1 * 2e-3 * np.sqrt(3) + 2 * float(res1.eps_used)
    cold = _solve(kp_s2, kp_t, feats, wed, wfd, scale, penalty_fn,
                  budget=2000, eps=0.01)
    S, C = kp_s.shape[0], kp_t.shape[0]
    # Benefits can RISE by at most the ED shrink bound here (weights are
    # fixed between the solves, so the wfd-decay term is zero).
    carry = StreamCarry(ok=jnp.bool_(True), v1_ub=res1.v1_next,
                        b_max=res1.b_max_next,
                        ed_max=jnp.float32(0.1 * 60.0),
                        fd_max=res1.fd_max,
                        v1_drift=jnp.float32(0.1 * 2e-3 * np.sqrt(3)),
                        fd_term=jnp.float32(0.0),
                        decay_ratio=jnp.float32(0.0))
    fast = stream_solve(
        jnp.asarray(kp_s2), jnp.asarray(kp_t), feats,
        jnp.ones(S, bool), jnp.ones(C, bool), wed, wfd, scale,
        penalty_fn, eps_final=0.01, rel_eps=0.0, max_sweeps=2000,
        p0=res1.prices, price_uncertainty=drift, acol0=res1.acol,
        pen_prev=pen_const, use_kernel=False, tc=128,
        carry=carry, stats_free=True, open_cap=64)
    cd = _dense_cd(kp_s2, kp_t, fd, wed, wfd, scale)
    opt = _hungarian_energy(cd, pen_const)
    n = max(S, C)
    bound = n * max(float(cold.eps_used), float(fast.eps_used)) + 1e-2
    assert float(fast.energy) <= opt + bound, (float(fast.energy), opt)
    # KM gate still exact on the fast path
    w = np.asarray(fast.match.w)
    tj = np.asarray(fast.match.tgt_idx)
    for i in np.nonzero(w > 0)[0]:
        assert cd[i, tj[i]] < pen_const
    real = tj[w > 0]
    assert len(real) == len(np.unique(real))
    # And it spends no more sweeps than the cold solve.
    assert int(fast.rounds) <= int(cold.rounds)


def test_extended_compact_rounds_do_not_escalate_epsilon():
    """Regression guard for the epsilon-poisoning trap: bidding rounds in
    the compact extension beyond the base budget must war at FINE epsilon
    (the escalation schedule freezes at the base budget), because
    eps_used feeds the next warm start's price uncertainty — 2^12 x eps
    once destroyed every subsequent keep test."""
    kp_s, kp_t, feats, fd = _problem(S=192, C=256, seed=31)
    wed, wfd, scale = 0.6, 0.4, 0.1

    def penalty_fn(mean, std):
        return mean - 1.0 * std

    S, C = kp_s.shape[0], kp_t.shape[0]

    def run(extra):
        return stream_solve(
            jnp.asarray(kp_s), jnp.asarray(kp_t), feats,
            jnp.ones(S, bool), jnp.ones(C, bool), wed, wfd, scale,
            penalty_fn, eps_final=0.01, rel_eps=1.0 / 64, max_sweeps=2,
            p0=jnp.zeros(C, jnp.float32), price_uncertainty=3.0e38,
            acol0=jnp.full((S,), -1, jnp.int32), pen_prev=0.0,
            use_kernel=False, tc=128, open_cap=64,
            compact_extra_sweeps=extra)

    base = run(0)
    ext = run(24)
    # The extension runs MORE rounds but never a coarser epsilon than the
    # base schedule's ceiling.
    assert int(ext.rounds) >= int(base.rounds)
    assert float(ext.eps_used) <= float(base.eps_used) * 1.001, (
        float(ext.eps_used), float(base.eps_used))
    # (No energy-monotonicity claim: greedy completion after different
    # price trajectories shuffles ties either way within the eps bound.)
