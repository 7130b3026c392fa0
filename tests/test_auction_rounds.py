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


def test_gs_fused_factor_kernel_matches_materialized():
    """The factor-streaming GS kernel (benefits recomputed per tile from
    coordinate + FD factors) must be bit-identical to the plain GS kernel
    running on the materialized bf16 benefit matrix built from the same
    factors (ops/cost_kernel.py arithmetic)."""
    import jax.numpy as jnp

    from ghicp_tpu.ops.auction_rounds import (auction_phase_gs_fused_pallas,
                                              auction_phase_gs_pallas)
    from ghicp_tpu.ops.cost_kernel import fused_benefit_ref

    rng = np.random.default_rng(5)
    S, C = 512, 640
    kps = rng.uniform(-4, 4, (S, 3)).astype(np.float32)
    kpt = rng.uniform(-4, 4, (C, 3)).astype(np.float32)
    fd = rng.integers(0, 200, (S, C)).astype(np.float32).astype(jnp.bfloat16)
    ms = np.ones(S, bool)
    ms[500:] = False
    mt = np.ones(C, bool)
    mt[630:] = False
    wed, wfd, scale = 0.7, 0.3, 0.15
    b, *_ = fused_benefit_ref(jnp.asarray(kps), jnp.asarray(kpt),
                              jnp.asarray(fd), jnp.asarray(ms),
                              jnp.asarray(mt), wed, wfd, scale,
                              out_dtype=jnp.bfloat16)
    p0 = jnp.zeros(C, jnp.float32)
    o0 = jnp.full((C,), -1, jnp.int32)
    s0 = jnp.zeros(S, jnp.int32)
    open0 = jnp.asarray(ms).astype(jnp.int32)
    for budget, comp in ((1, 0), (6, 0), (40, 1)):
        a = auction_phase_gs_pallas(b, p0, o0, s0, open0, 0.05, -8.0,
                                    budget, ts=128, inner_cap=1,
                                    esc_after=0, esc_period=1,
                                    complete_open=comp, interpret=True)
        f = auction_phase_gs_fused_pallas(
            jnp.asarray(kps), jnp.asarray(kpt), jnp.asarray(fd),
            jnp.asarray(ms), jnp.asarray(mt), wed, wfd, scale,
            p0, o0, s0, open0, 0.05, -8.0, budget, ts=128, inner_cap=1,
            esc_after=0, esc_period=1, complete_open=comp, quantize=True,
            interpret=True)
        for k, (x, y) in enumerate(zip(a, f)):
            assert np.array_equal(np.asarray(x), np.asarray(y)), (budget, k)


def test_auction_match_benefits_factor_path_parity():
    """Solve-level parity: auction_match_benefits driven by factors
    (matrix-free GS) returns the same assignment/prices/energy as the
    materialized-b solve, warm start included — and the factor gate must
    actually engage (asserted via the kernel-only shape conditions)."""
    import jax.numpy as jnp

    import ghicp_tpu.matching.auction as au
    from ghicp_tpu.ops.cost_kernel import fused_benefit_ref

    rng = np.random.default_rng(11)
    S, C = 512, 512
    kps = rng.uniform(-4, 4, (S, 3)).astype(np.float32)
    kpt = (kps[rng.permutation(S)[:C]]
           + rng.normal(0, 0.1, (C, 3))).astype(np.float32)
    fd = rng.integers(0, 200, (S, C)).astype(np.float32).astype(jnp.bfloat16)
    ms = jnp.ones(S, bool)
    mt = jnp.ones(C, bool)
    wed, wfd, scale = 0.6, 0.4, 0.2
    factors = (jnp.asarray(kps), jnp.asarray(kpt), jnp.asarray(fd),
               ms, mt, jnp.float32(wed), jnp.float32(wfd),
               jnp.float32(scale))
    out = fused_benefit_ref(*factors)
    b, b_max = out[0], out[6]
    penalty = jnp.float32(40.0)

    old = au._KERNEL_INTERPRET
    au._KERNEL_INTERPRET = True
    try:
        # The factor gate must actually engage under the interpret hook —
        # otherwise this test would silently compare b against b.
        assert au._factor_gate(S, C, True, au.LOCAL, 1, 0, None, None)
        common = dict(eps_final=0.05, max_rounds=6, rel_eps=1.0 / 64,
                      use_round_kernel=True, n_phases=1, b_max=b_max)
        r_mat = au.auction_match_benefits(b, penalty, ms, mt, **common)
        r_fac = au.auction_match_benefits(None, penalty, ms, mt,
                                          factors=factors, quantize_b=True,
                                          **common)
        assert np.array_equal(np.asarray(r_mat.acol), np.asarray(r_fac.acol))
        np.testing.assert_allclose(np.asarray(r_mat.prices),
                                   np.asarray(r_fac.prices), rtol=1e-6)
        np.testing.assert_allclose(float(r_mat.energy), float(r_fac.energy),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(r_mat.cd_sel),
                                   np.asarray(r_fac.cd_sel), rtol=1e-5,
                                   atol=1e-4)
        # Warm-started re-solve (hints + previous assignment), both paths.
        v1h, vselh = out[7], out[8]
        warm = dict(p0=r_mat.prices, price_uncertainty=jnp.float32(0.1),
                    acol0=r_mat.acol, hint_v1=v1h, hint_vsel=vselh,
                    keep_slack_extra=jnp.float32(0.02))
        w_mat = au.auction_match_benefits(b, penalty, ms, mt, **common,
                                          **warm)
        w_fac = au.auction_match_benefits(None, penalty, ms, mt,
                                          factors=factors, quantize_b=True,
                                          **common, **warm)
        assert np.array_equal(np.asarray(w_mat.acol), np.asarray(w_fac.acol))
        np.testing.assert_allclose(np.asarray(w_mat.prices),
                                   np.asarray(w_fac.prices), rtol=1e-6)
    finally:
        au._KERNEL_INTERPRET = old
