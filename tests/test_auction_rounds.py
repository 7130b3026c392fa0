"""Whole-phase auction kernel (ops/auction_rounds.py): interpret-mode
parity against the jnp reference, and engine-level equivalence of the
round-kernel dispatch path."""
import numpy as np
import jax.numpy as jnp

from ghicp_tpu.ops.auction_rounds import (auction_phase_pallas,
                                          auction_rounds_pallas,
                                          auction_rounds_ref)


def test_rounds_kernel_matches_ref():
    rng = np.random.default_rng(0)
    S, C = 512, 640
    b = rng.uniform(-4, 0, (S, C)).astype(np.float32)
    b[rng.random((S, C)) < 0.3] = -3e38
    p0 = jnp.zeros(C, jnp.float32)
    o0 = jnp.full((C,), -1, jnp.int32)
    s0 = jnp.zeros(S, jnp.int32)
    for n_rounds in (1, 7, 40):
        a = auction_rounds_pallas(jnp.asarray(b), p0, o0, s0, 0.05, -2.0,
                                  n_rounds, ts=256, interpret=True)
        r = auction_rounds_ref(jnp.asarray(b), p0, o0, s0, 0.05, -2.0,
                               n_rounds)
        for x, y in zip(a, r):
            assert np.array_equal(np.asarray(x), np.asarray(y))


def test_phase_kernel_matches_ref_and_exits_early():
    """The early-exit phase kernel must land on the same fixed point as the
    budgeted reference (post-convergence reference rounds are no-ops), and
    report a rounds count at or below the budget."""
    rng = np.random.default_rng(2)
    S, C = 512, 640
    b = rng.uniform(-4, 0, (S, C)).astype(np.float32)
    b[rng.random((S, C)) < 0.3] = -3e38
    p0 = jnp.zeros(C, jnp.float32)
    o0 = jnp.full((C,), -1, jnp.int32)
    s0 = jnp.zeros(S, jnp.int32)
    budget = 400
    p, o, s, r = auction_phase_pallas(jnp.asarray(b), p0, o0, s0, 0.05, -2.0,
                                      budget, ts=256, interpret=True)
    rp, ro, rs = auction_rounds_ref(jnp.asarray(b), p0, o0, s0, 0.05, -2.0,
                                    budget)
    assert int(r) < budget          # converged before the cap
    # every row accounted for: owned or sunk
    owned = np.zeros(S, bool)
    owned[np.asarray(o)[np.asarray(o) >= 0]] = True
    assert np.all(owned | (np.asarray(s) == 1))
    for x, y in zip((p, o, s), (rp, ro, rs)):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_phase_kernel_budget_cap_matches_ref():
    """With a budget below convergence, the phase kernel must stop at
    exactly ``max_rounds`` with state identical to that many ref rounds."""
    rng = np.random.default_rng(3)
    S, C = 256, 256          # square: every column contested, slow price war
    b = jnp.asarray(rng.uniform(-4, 0, (S, C)).astype(np.float32))
    p0 = jnp.zeros(C, jnp.float32)
    o0 = jnp.full((C,), -1, jnp.int32)
    s0 = jnp.zeros(S, jnp.int32)
    # sanity: this fixture must not converge within the largest budget,
    # otherwise the exact-cap assertion below is vacuous
    _, o_chk, s_chk, _ = auction_phase_pallas(b, p0, o0, s0, 0.01, -10.0,
                                              5, ts=128, interpret=True)
    owned = np.zeros(S, bool)
    owned[np.asarray(o_chk)[np.asarray(o_chk) >= 0]] = True
    assert not np.all(owned | (np.asarray(s_chk) == 1))
    for budget in (1, 5):
        p, o, s, r = auction_phase_pallas(b, p0, o0, s0, 0.01, -10.0,
                                          budget, ts=128, interpret=True)
        rp, ro, rs = auction_rounds_ref(b, p0, o0, s0, 0.01, -10.0, budget)
        assert int(r) == budget
        for x, y in zip((p, o, s), (rp, ro, rs)):
            assert np.array_equal(np.asarray(x), np.asarray(y))


def test_phase_kernel_bf16_benefits():
    """bf16-stored benefits: kernel parity vs the ref run on the same
    bf16 matrix (arithmetic in f32 both sides)."""
    rng = np.random.default_rng(4)
    S, C = 256, 256
    b = jnp.asarray(rng.uniform(-4, 0, (S, C)).astype(np.float32))
    b16 = b.astype(jnp.bfloat16)
    p0 = jnp.zeros(C, jnp.float32)
    o0 = jnp.full((C,), -1, jnp.int32)
    s0 = jnp.zeros(S, jnp.int32)
    p, o, s, _ = auction_phase_pallas(b16, p0, o0, s0, 0.05, -2.0,
                                      500, ts=128, interpret=True)
    rp, ro, rs = auction_rounds_ref(b16, p0, o0, s0, 0.05, -2.0, 500)
    for x, y in zip((p, o, s), (rp, ro, rs)):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_rounds_kernel_warm_state():
    """Carried (p, owner, sunk) state must continue identically."""
    rng = np.random.default_rng(1)
    S, C = 256, 384
    b = jnp.asarray(rng.uniform(-4, 0, (S, C)).astype(np.float32))
    p0 = jnp.zeros(C, jnp.float32)
    o0 = jnp.full((C,), -1, jnp.int32)
    s0 = jnp.zeros(S, jnp.int32)
    # 10 rounds in one call == 2 calls of 5 rounds with carried state.
    a = auction_rounds_ref(b, p0, o0, s0, 0.1, -2.0, 10)
    m = auction_rounds_ref(b, p0, o0, s0, 0.1, -2.0, 5)
    m = auction_rounds_ref(b, *m, 0.1, -2.0, 5)
    for x, y in zip(a, m):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_phase_kernel_small_tile():
    """ts=64 (the auto-shrunk tile used at wide matrices, C > 8192 —
    VMEM footprint ~ ts*C) must match the reference fixed point."""
    rng = np.random.default_rng(6)
    S, C = 256, 384
    b = rng.uniform(-4, 0, (S, C)).astype(np.float32)
    b[rng.random((S, C)) < 0.25] = -3e38
    p0 = jnp.zeros(C, jnp.float32)
    o0 = jnp.full((C,), -1, jnp.int32)
    s0 = jnp.zeros(S, jnp.int32)
    p, o, s, r = auction_phase_pallas(jnp.asarray(b), p0, o0, s0, 0.05, -2.0,
                                      300, ts=64, interpret=True)
    rp, ro, rs = auction_rounds_ref(jnp.asarray(b), p0, o0, s0, 0.05, -2.0,
                                    300)
    for x, y in zip((p, o, s), (rp, ro, rs)):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_gs_phase_matches_gs_ref_and_exits_early():
    """Gauss-Seidel phase kernel: same fixed point as the tile-sequential
    jnp reference, early exit below the budget, every row owned or sunk."""
    from ghicp_tpu.ops.auction_rounds import (auction_phase_gs_pallas,
                                              auction_rounds_gs_ref)
    rng = np.random.default_rng(7)
    S, C = 512, 640
    b = rng.uniform(-4, 0, (S, C)).astype(np.float32)
    b[rng.random((S, C)) < 0.3] = -3e38
    p0 = jnp.zeros(C, jnp.float32)
    o0 = jnp.full((C,), -1, jnp.int32)
    s0 = jnp.zeros(S, jnp.int32)
    op0 = jnp.ones(S, jnp.int32)
    budget = 400
    p, o, s, r, _g = auction_phase_gs_pallas(jnp.asarray(b), p0, o0, s0, op0,
                                         0.05, -2.0, budget, ts=128,
                                         interpret=True)
    rp, ro, rs, _ = auction_rounds_gs_ref(jnp.asarray(b), p0, o0, s0, op0,
                                          0.05, -2.0, int(r), ts=128)
    assert int(r) < budget
    owned = np.zeros(S, bool)
    owned[np.asarray(o)[np.asarray(o) >= 0]] = True
    assert np.all(owned | (np.asarray(s) == 1))
    for x, y in zip((p, o, s), (rp, ro, rs)):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_gs_phase_budget_cap_matches_gs_ref():
    from ghicp_tpu.ops.auction_rounds import (auction_phase_gs_pallas,
                                              auction_rounds_gs_ref)
    rng = np.random.default_rng(8)
    S, C = 256, 256
    b = jnp.asarray(rng.uniform(-4, 0, (S, C)).astype(np.float32))
    p0 = jnp.zeros(C, jnp.float32)
    o0 = jnp.full((C,), -1, jnp.int32)
    s0 = jnp.zeros(S, jnp.int32)
    op0 = jnp.ones(S, jnp.int32)
    for budget in (1, 4):
        p, o, s, r, _g = auction_phase_gs_pallas(b, p0, o0, s0, op0, 0.01, -10.0,
                                             budget, ts=128, interpret=True)
        rp, ro, rs, _ = auction_rounds_gs_ref(b, p0, o0, s0, op0, 0.01,
                                              -10.0, budget, ts=128)
        assert int(r) <= budget
        for x, y in zip((p, o, s), (rp, ro, rs)):
            assert np.array_equal(np.asarray(x), np.asarray(y))


def test_gs_converges_faster_with_same_quality():
    """Gauss-Seidel sweeps reach the all-assigned fixed point in no more
    sweeps than Jacobi, and the assignment value matches within the n*eps
    epsilon-CS bound (both are eps-CS at termination)."""
    from ghicp_tpu.ops.auction_rounds import (auction_phase_gs_pallas,
                                              auction_phase_pallas)
    rng = np.random.default_rng(9)
    S, C = 512, 640
    b = rng.uniform(-4, 0, (S, C)).astype(np.float32)
    b[rng.random((S, C)) < 0.3] = -3e38
    bj = jnp.asarray(b)
    p0 = jnp.zeros(C, jnp.float32)
    o0 = jnp.full((C,), -1, jnp.int32)
    s0 = jnp.zeros(S, jnp.int32)
    op0 = jnp.ones(S, jnp.int32)
    eps, sink = 0.02, -2.0
    pj, oj, sj, rj = auction_phase_pallas(bj, p0, o0, s0, eps, sink,
                                          2000, ts=128, interpret=True)
    pg, og, sg, rg, _g = auction_phase_gs_pallas(bj, p0, o0, s0, op0, eps, sink,
                                             2000, ts=128, interpret=True)
    def value(o, s):
        o = np.asarray(o)
        tot = 0.0
        for c, i in enumerate(o):
            if i >= 0:
                tot += b[i, c]
        tot += sink * np.asarray(s).sum()
        return tot
    assert int(rg) <= int(rj)
    assert abs(value(og, sg) - value(oj, sj)) <= S * eps + 1e-3


def test_gs_eps_escalation_parity_and_convergence():
    """With escalation on, kernel and ref stay bit-identical, and a
    war-heavy square problem converges well below the sweep cap."""
    from ghicp_tpu.ops.auction_rounds import (auction_phase_gs_pallas,
                                              auction_rounds_gs_ref)
    rng = np.random.default_rng(10)
    S, C = 256, 256              # square: every column contested
    b = jnp.asarray(rng.uniform(-4, 0, (S, C)).astype(np.float32))
    p0 = jnp.zeros(C, jnp.float32)
    o0 = jnp.full((C,), -1, jnp.int32)
    s0 = jnp.zeros(S, jnp.int32)
    op0 = jnp.ones(S, jnp.int32)
    eps, sink, budget = 1e-4, -10.0, 64    # tiny eps: war would crawl
    p, o, s, r, _g = auction_phase_gs_pallas(b, p0, o0, s0, op0, eps, sink,
                                         budget, ts=128, esc_after=8,
                                         esc_period=4, interpret=True)
    assert int(r) < budget       # escalation terminated the war
    owned = np.zeros(S, bool)
    owned[np.asarray(o)[np.asarray(o) >= 0]] = True
    assert np.all(owned | (np.asarray(s) == 1))
    rp, ro, rs, _ = auction_rounds_gs_ref(b, p0, o0, s0, op0, eps, sink,
                                          int(r), ts=128, esc_after=8,
                                          esc_period=4)
    for x, y in zip((p, o, s), (rp, ro, rs)):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def _warm_fixture(seed=11, S=256, C=384):
    # C comfortably above S: a square problem's forced-sink endgame needs
    # price mass ~penalty*C to push the surplus rows out — thousands of
    # fixed-eps sweeps (production solves rely on escalation + greedy
    # completion there); surplus columns keep these unit tests in the
    # fast-converging regime the contracts are about.
    rng = np.random.default_rng(seed)
    kps = rng.uniform(-4, 4, (S, 3)).astype(np.float32)
    kpt = rng.uniform(-4, 4, (C, 3)).astype(np.float32)
    fd = rng.integers(0, 200, (S, C)).astype(np.float32).astype(jnp.bfloat16)
    ms = np.ones(S, bool)
    ms[S - 6:] = False
    mt = np.ones(C, bool)
    mt[C - 10:] = False
    return kps, kpt, fd, jnp.asarray(ms), jnp.asarray(mt)


def test_warm_fused_kernel_cold_energy_bound():
    """Cold start through the single-launch warm kernel: the assignment's
    energy must be within the auction's n*eps bound of the Hungarian
    optimum on the same gated benefit matrix (km.cpp:40 semantics)."""
    from scipy.optimize import linear_sum_assignment

    from ghicp_tpu.ops.auction_rounds import auction_warm_fused_pallas
    from ghicp_tpu.ops.cost_kernel import fused_benefit_ref

    kps, kpt, fd, ms, mt = _warm_fixture()
    S, C = fd.shape
    wed, wfd, scale = 0.7, 0.3, 0.15
    penalty = 40.0
    p0 = jnp.zeros(C, jnp.float32)
    o0 = jnp.full((C,), -1, jnp.int32)
    p, owner, sunk, r, gcol, stats = auction_warm_fused_pallas(
        jnp.asarray(kps), jnp.asarray(kpt), fd, ms, mt, wed, wfd, scale,
        p0, o0, jnp.full((S,), -1, jnp.int32), jnp.zeros(S, jnp.int32),
        jnp.zeros(S, bool), -penalty, 0.5, 0.0, 0.0, 400,
        ts=128, esc_after=0, esc_period=1, interpret=True)
    # derive the matching
    acol = np.full(S, -1, np.int64)
    own = np.asarray(owner)
    for c in range(C):
        if own[c] >= 0:
            acol[own[c]] = c
    b = np.asarray(fused_benefit_ref(
        jnp.asarray(kps), jnp.asarray(kpt), fd, ms, mt, wed, wfd,
        scale, out_dtype=jnp.bfloat16)[0].astype(jnp.float32))
    # all masked/real rows resolved (no leftovers at a 200-round budget)
    assert int(np.sum((acol < 0) & ~np.asarray(sunk, bool))) == 0
    gate = b > -penalty
    matched = (acol >= 0) & gate[np.arange(S), np.where(acol >= 0, acol, 0)]
    energy = (-b[np.arange(S), np.where(acol >= 0, acol, 0)][matched].sum()
              + penalty * (max(S, C) - matched.sum()))
    # Hungarian on the same square problem
    big = penalty
    cost = np.full((max(S, C), max(S, C)), big, np.float64)
    cost[:S, :C] = np.where(gate, -b, big)
    ri, ci = linear_sum_assignment(cost)
    opt = cost[ri, ci].sum()
    eps = float(stats[2])
    assert energy <= opt + (S + 2) * eps + 1e-3, (energy, opt, eps)


def test_warm_fused_kernel_keeps_converged_state():
    """Re-solving a converged problem through the warm kernel with exact
    prices and zero drift must keep the assignment (the in-kernel eps-CS
    keep test) and leave prices untouched for kept columns."""
    from ghicp_tpu.ops.auction_rounds import auction_warm_fused_pallas

    kps, kpt, fd, ms, mt = _warm_fixture(seed=3)
    S, C = fd.shape
    wed, wfd, scale = 0.6, 0.4, 0.2
    penalty = 35.0
    p0 = jnp.zeros(C, jnp.float32)
    o0 = jnp.full((C,), -1, jnp.int32)
    p1, owner1, sunk1, r1, gcol1, stats1 = auction_warm_fused_pallas(
        jnp.asarray(kps), jnp.asarray(kpt), fd, ms, mt, wed, wfd, scale,
        p0, o0, jnp.full((S,), -1, jnp.int32), jnp.zeros(S, jnp.int32),
        jnp.zeros(S, bool), -penalty, 0.5, 0.0, 0.0, 400,
        ts=128, esc_after=0, esc_period=1, interpret=True)
    own1 = np.asarray(owner1)
    acol1 = np.full(S, -1, np.int32)
    for c in range(C):
        if own1[c] >= 0:
            acol1[own1[c]] = c
    own_ok = acol1 >= 0
    p2, owner2, sunk2, r2, gcol2, stats2 = auction_warm_fused_pallas(
        jnp.asarray(kps), jnp.asarray(kpt), fd, ms, mt, wed, wfd, scale,
        p1, owner1, jnp.asarray(acol1), sunk1,
        jnp.asarray(own_ok), -penalty, 0.5, 0.0, 0.0, 400,
        ts=128, esc_after=0, esc_period=1, interpret=True)
    # the converged assignment satisfies eps-CS at its own prices: every
    # previously-owned column must keep its owner, prices unchanged
    assert np.array_equal(np.asarray(owner2), own1)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), rtol=1e-6)
    assert int(r2) == 1  # round 0 only; nothing re-bids
    # sunk rows stay sunk
    assert np.array_equal(np.asarray(sunk2) > 0, np.asarray(sunk1) > 0)
