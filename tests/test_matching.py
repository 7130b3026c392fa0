"""Tests: cost matrices, NN/NNR matchers, auction vs scipy Hungarian."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from ghicp_tpu.matching import (auction_match, blend_bsc, blend_none,
                                euclidean_matrix, nn_match, nnr_match)


def test_euclidean_matrix_exact():
    rng = np.random.default_rng(0)
    s = rng.normal(size=(40, 3)).astype(np.float32)
    t = rng.normal(size=(30, 3)).astype(np.float32)
    ed = np.asarray(euclidean_matrix(jnp.asarray(s), jnp.asarray(t),
                                     jnp.float32(2.0)))
    ref = 2.0 * np.linalg.norm(s[:, None] - t[None], axis=-1)
    np.testing.assert_allclose(ed, ref, atol=1e-4)


def test_blend_none_penalty_quirk():
    """Penalty is always max(CDmean, 1.0) — reference overwrite at
    ghicp_reg.cpp:230-239."""
    rng = np.random.default_rng(1)
    ed = jnp.asarray(rng.uniform(2, 4, (8, 8)).astype(np.float32))
    m = jnp.ones(8, bool)
    res = blend_none(ed, m, m)
    np.testing.assert_allclose(float(res.penalty), float(res.cd_mean),
                               rtol=1e-6)


def test_nn_match_gate():
    cd = jnp.asarray(np.array([[0.1, 5.0], [4.0, 6.0]], np.float32))
    m2 = jnp.ones(2, bool)
    res = nn_match(cd, jnp.float32(1.0), m2, m2)
    assert res.w.tolist() == [1.0, 0.0]
    assert int(res.tgt_idx[0]) == 0


def test_nnr_mutual_only():
    # Row 0 and 1 both prefer col 0; col 0 prefers row 0 -> only (0,0) kept.
    cd = jnp.asarray(np.array([[0.1, 9.0], [0.2, 8.0]], np.float32))
    m2 = jnp.ones(2, bool)
    res = nnr_match(cd, m2, m2)
    assert res.w.tolist() == [1.0, 0.0]


def _km_reference(cd, penalty, ns, nt):
    """Reference KM semantics via scipy on the padded square matrix."""
    n = max(ns, nt)
    b = np.full((n, n), -penalty)
    gate = cd[:ns, :nt] < penalty
    b[:ns, :nt] = np.where(gate, -cd[:ns, :nt], -penalty)
    ri, ci = linear_sum_assignment(-b)  # scipy minimizes
    total = b[ri, ci].sum()
    real = [(i, j) for i, j in zip(ri, ci)
            if i < ns and j < nt and b[i, j] != -penalty]
    return total, real


@pytest.mark.parametrize("ns,nt,seed", [(30, 30, 0), (40, 25, 1), (25, 40, 2),
                                        (64, 64, 3)])
def test_auction_matches_hungarian_energy(ns, nt, seed):
    rng = np.random.default_rng(seed)
    cd = rng.uniform(0, 10, size=(ns, nt)).astype(np.float32)
    penalty = 6.0
    mask_s = jnp.ones(ns, bool)
    mask_t = jnp.ones(nt, bool)
    res = auction_match(jnp.asarray(cd), jnp.float32(penalty), mask_s, mask_t,
                        eps_final=0.001)
    ref_total, ref_real = _km_reference(cd, penalty, ns, nt)

    # Our achieved total benefit on the square problem:
    w = np.asarray(res.match.w)
    tj = np.asarray(res.match.tgt_idx)
    n = max(ns, nt)
    got_total = sum(-cd[i, tj[i]] for i in range(ns) if w[i] > 0)
    got_total += -penalty * (n - int(w.sum()))
    # epsilon-optimality bound: within n * eps of the Hungarian optimum.
    assert got_total >= ref_total - n * 0.001 - 1e-3, (got_total, ref_total)
    # Energy metric agrees with -total.
    np.testing.assert_allclose(float(res.energy), -got_total, rtol=1e-5)


def test_auction_outlier_rejection():
    """Pairs with CD >= penalty must never be matched (km.cpp:162)."""
    rng = np.random.default_rng(4)
    cd = rng.uniform(5, 10, size=(20, 20)).astype(np.float32)
    # Plant 5 good pairs under the gate.
    for k in range(5):
        cd[k, k] = 0.5
    m = jnp.ones(20, bool)
    res = auction_match(jnp.asarray(cd), jnp.float32(2.0), m, m)
    w = np.asarray(res.match.w)
    tj = np.asarray(res.match.tgt_idx)
    assert int(res.match.n_matches) == 5
    assert all(w[k] == 1 and tj[k] == k for k in range(5))
    assert w[5:].sum() == 0


def test_auction_padded_masks():
    """Masked (padding) rows/cols behave like absent points."""
    rng = np.random.default_rng(5)
    cd_small = rng.uniform(0, 3, size=(10, 12)).astype(np.float32)
    penalty = 2.0
    # Embed into padded capacities with masks.
    S, T = 16, 16
    cd = np.full((S, T), np.inf, np.float32)
    cd[:10, :12] = cd_small
    mask_s = jnp.asarray(np.arange(S) < 10)
    mask_t = jnp.asarray(np.arange(T) < 12)
    res = auction_match(jnp.asarray(cd), jnp.float32(penalty), mask_s, mask_t,
                        eps_final=0.001)
    ref_total, ref_real = _km_reference(cd_small, penalty, 10, 12)
    w = np.asarray(res.match.w)
    tj = np.asarray(res.match.tgt_idx)
    assert w[10:].sum() == 0
    got_real = {(i, tj[i]) for i in range(10) if w[i] > 0}
    # Same number of real matches as Hungarian (sets can differ only among
    # degenerate optima; with random floats they coincide).
    assert got_real == set(ref_real)


def test_blend_bsc_weight_schedule():
    ed = jnp.ones((4, 4), jnp.float32) * 2.0
    fd = jnp.ones((4, 4), jnp.float32) * 100.0
    m = jnp.ones(4, bool)
    args = dict(mask_s=m, mask_t=m, rms=jnp.float32(1.0),
                fdm=jnp.float32(50.0), fdstd=jnp.float32(10.0),
                para1=jnp.float32(1.0), para2=jnp.float32(1.0),
                scale=jnp.float32(1.0), weight_changing_rate=6.0,
                penalty_initial=2.0)
    r0 = blend_bsc(ed, fd, iteration=jnp.int32(0), **args)
    # iter 0: WFD = 1 -> CD = FD
    np.testing.assert_allclose(np.asarray(r0.cd), 100.0, rtol=1e-6)
    r12 = blend_bsc(ed, fd, iteration=jnp.int32(12), **args)
    wfd = np.exp(-12 / 6.0)
    np.testing.assert_allclose(np.asarray(r12.cd),
                               (1 - wfd) * 2.0 + wfd * 100.0, rtol=1e-5)
    # Late-iteration penalty formula (ghicp_reg.cpp:279-287).
    expect = 1.0 * 1.0 * 1.0 * (1 - wfd) + (50.0 + 1.0 * 10.0) * wfd
    np.testing.assert_allclose(float(r12.penalty), max(expect, 5.0), rtol=1e-5)


def test_auction_warm_start_matches_cold():
    """Warm-starting from a perturbed problem's prices (deflated by the
    perturbation bound) must reproduce the cold-start optimal real-match
    set — over-deflation only costs rounds, never correctness."""
    import jax.numpy as jnp
    from ghicp_tpu.matching.auction import auction_match
    rng = np.random.default_rng(17)
    n = 96
    cd0 = rng.uniform(0.0, 4.0, (n, n)).astype(np.float32)
    ii = np.arange(n)
    cd0[ii, ii] *= 0.1  # clear diagonal structure
    penalty = 3.0
    ms = jnp.ones(n, bool)
    a0 = auction_match(jnp.asarray(cd0), jnp.float32(penalty), ms, ms,
                       eps_final=0.001)
    # Perturb and re-solve cold vs warm.
    delta = 0.05
    cd1 = (cd0 + rng.uniform(-delta, delta, cd0.shape)).astype(np.float32)
    cold = auction_match(jnp.asarray(cd1), jnp.float32(penalty), ms, ms,
                         eps_final=0.001)
    warm = auction_match(jnp.asarray(cd1), jnp.float32(penalty), ms, ms,
                         eps_final=0.001, p0=a0.prices,
                         price_uncertainty=2 * delta + 0.01)
    # Same energy within the eps-optimality band; both near scipy optimum.
    from scipy.optimize import linear_sum_assignment
    b = np.full((n, n), penalty, np.float32)
    gate = cd1 < penalty
    b[gate] = cd1[gate]
    ri, ci = linear_sum_assignment(b)
    opt = b[ri, ci].sum()
    for res in (cold, warm):
        assert float(res.energy) <= opt + n * 0.01 + 1e-3
    assert abs(float(cold.energy) - float(warm.energy)) <= n * 0.01 + 1e-3


def test_auction_assignment_warm_start_matches_cold():
    """Warm-starting prices AND the previous assignment (``acol0``): rows
    whose eps-CS still holds keep their match; the rest re-bid.  The
    combined assignment must stay within the same n*eps optimality band as
    a cold solve, on both the XLA and (interpret-mode) kernel paths."""
    import jax.numpy as jnp
    import ghicp_tpu.matching.auction as auc
    from ghicp_tpu.matching.auction import auction_match
    from scipy.optimize import linear_sum_assignment
    rng = np.random.default_rng(29)
    n = 128
    cd0 = rng.uniform(0.0, 4.0, (n, n)).astype(np.float32)
    ii = np.arange(n)
    cd0[ii, ii] *= 0.1
    penalty = 3.0
    ms = jnp.ones(n, bool)
    delta = 0.05
    cd1 = (cd0 + rng.uniform(-delta, delta, cd0.shape)).astype(np.float32)
    b = np.full((n, n), penalty, np.float32)
    gate = cd1 < penalty
    b[gate] = cd1[gate]
    ri, ci = linear_sum_assignment(b)
    opt = b[ri, ci].sum()
    for use_kernel in (False, True):
        auc._KERNEL_INTERPRET = use_kernel
        try:
            a0 = auction_match(jnp.asarray(cd0), jnp.float32(penalty), ms,
                               ms, eps_final=0.001,
                               use_round_kernel=use_kernel)
            warm = auction_match(jnp.asarray(cd1), jnp.float32(penalty), ms,
                                 ms, eps_final=0.001, p0=a0.prices,
                                 price_uncertainty=2 * delta + 0.01,
                                 acol0=a0.acol, use_round_kernel=use_kernel)
        finally:
            auc._KERNEL_INTERPRET = False
        assert float(warm.energy) <= opt + n * 0.01 + 1e-3, use_kernel
        # one-to-one over real matches
        tgt = np.asarray(warm.match.tgt_idx)[np.asarray(warm.match.w) > 0]
        assert len(set(tgt.tolist())) == len(tgt), use_kernel


def test_auction_round_kernel_path_matches_xla():
    """The whole-phase Pallas kernel dispatch (interpret mode on CPU) must
    reach the same epsilon-optimal energy as the XLA while-loop path, with
    the runtime rounds budget threaded through the phases."""
    import ghicp_tpu.matching.auction as auc
    rng = np.random.default_rng(23)
    n = 128                       # kernel path needs R % 128 == C % 128 == 0
    cd = rng.uniform(0.0, 4.0, (n, n)).astype(np.float32)
    penalty = 3.0
    ms = jnp.ones(n, bool)
    xla = auction_match(jnp.asarray(cd), jnp.float32(penalty), ms, ms,
                        eps_final=0.001, max_rounds=2000)
    auc._KERNEL_INTERPRET = True
    try:
        ker = auction_match(jnp.asarray(cd), jnp.float32(penalty), ms, ms,
                            eps_final=0.001, max_rounds=2000,
                            use_round_kernel=True)
    finally:
        auc._KERNEL_INTERPRET = False
    from scipy.optimize import linear_sum_assignment
    b = np.full((n, n), penalty, np.float32)
    gate = cd < penalty
    b[gate] = cd[gate]
    ri, ci = linear_sum_assignment(b)
    opt = b[ri, ci].sum()
    for res in (xla, ker):
        assert float(res.energy) <= opt + n * 0.001 + 1e-3
    assert int(ker.rounds) <= 2000
    # Both are eps-optimal; sets may differ among near-degenerate optima,
    # but the achieved energies must agree within the n*eps band.
    assert int(xla.match.n_matches) == int(ker.match.n_matches)
    assert abs(float(xla.energy) - float(ker.energy)) <= n * 0.001 + 1e-3


def test_auction_budget_exhaustion_completes_assignment():
    """When the TOTAL rounds budget binds mid-war, leftover rows must take
    their best column at current prices (duplicates allowed) instead of
    being silently dropped — a partial correspondence set destabilizes the
    engine's SVD step (see auction_match completion comment)."""
    rng = np.random.default_rng(17)
    n = 200
    cd = rng.uniform(0, 1, size=(n, n)).astype(np.float32)
    m = jnp.ones(n, bool)
    penalty = 1e6  # gate never binds; every row has a valid column
    res = auction_match(jnp.asarray(cd), jnp.float32(penalty), m, m,
                        eps_final=1e-4, max_rounds=2)
    # Budget of 2 rounds cannot finish a 200-row auction; completion must
    # still produce a full correspondence set.
    assert int(res.match.n_matches) == n
    assert int(res.rounds) == 2
    # Unconstrained budget on the same problem stays exactly one-to-one.
    full = auction_match(jnp.asarray(cd), jnp.float32(penalty), m, m,
                         eps_final=1e-4, max_rounds=8000)
    tj = np.asarray(full.match.tgt_idx)[np.asarray(full.match.w) > 0]
    assert len(set(tj.tolist())) == len(tj)


def test_ransac_coarse_align_recovers_pose():
    """Frame-based + triple hypotheses recover a rigid transform from a
    feature-distance matrix with heavy impostor noise."""
    from ghicp_tpu.matching.ransac import ransac_coarse_align
    rng = np.random.default_rng(9)
    S = 256
    kp_t = rng.uniform(0, 20, (S, 3)).astype(np.float32)
    th = np.deg2rad(25.0)
    axis = np.float32([0.2, -0.5, 0.84])
    axis /= np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]], np.float32)
    R = np.eye(3, dtype=np.float32) + np.sin(th) * K \
        + (1 - np.cos(th)) * (K @ K)
    t = np.float32([1.0, -2.0, 0.5])
    kp_s = ((kp_t - t) @ R).astype(np.float32)  # T maps s -> t
    # fd: only 8% of rows carry a discriminative true match; the rest get
    # a random impostor as their best candidate.
    fd = rng.uniform(50, 200, (S, S)).astype(np.float32)
    true_rows = rng.choice(S, 20, replace=False)
    fd[true_rows, true_rows] = rng.uniform(0, 10, 20)
    imp = np.setdiff1d(np.arange(S), true_rows)
    fd[imp, rng.permutation(imp)] = rng.uniform(0, 10, len(imp))
    m = jnp.ones(S, bool)
    res = ransac_coarse_align(jnp.asarray(kp_s), m, jnp.asarray(kp_t), m,
                              jnp.asarray(fd), tau=0.3, n_hyp=1 << 14)
    T = np.asarray(res.transform)
    assert int(res.inliers) >= 15
    np.testing.assert_allclose(T[:3, :3], R, atol=5e-3)
    np.testing.assert_allclose(T[:3, 3], t, atol=5e-2)


def test_ransac_frame_hypotheses_low_inlier():
    """With local frames, a handful of true pairs suffices even when random
    triples would need a lucky draw (frame hypotheses are exhaustive)."""
    from ghicp_tpu.matching.ransac import ransac_coarse_align
    from ghicp_tpu.core import transform as tfm
    rng = np.random.default_rng(10)
    S = 200
    kp_t = rng.uniform(0, 15, (S, 3)).astype(np.float32)
    th = np.deg2rad(40.0)
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    t = np.float32([2.0, 1.0, -0.3])
    kp_s = ((kp_t - t) @ R).astype(np.float32)
    # random orthonormal target frames; source frames = Rt @ R (covariant)
    frames_t = np.zeros((S, 3, 3), np.float32)
    for i in range(S):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        frames_t[i] = q.T
    frames_s = np.einsum("sij,jk->sik", frames_t, R)
    # only 5 true pairs; everything else random impostors
    fd = rng.uniform(50, 200, (S, S)).astype(np.float32)
    true_rows = rng.choice(S, 5, replace=False)
    fd[true_rows, true_rows] = 1.0
    imp = np.setdiff1d(np.arange(S), true_rows)
    fd[imp, rng.permutation(imp)] = rng.uniform(0, 10, len(imp))
    m = jnp.ones(S, bool)
    res = ransac_coarse_align(jnp.asarray(kp_s), m, jnp.asarray(kp_t), m,
                              jnp.asarray(fd), tau=0.2, n_hyp=1 << 13,
                              frames_s=jnp.asarray(frames_s),
                              frames_t=jnp.asarray(frames_t))
    T = np.asarray(res.transform)
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-2)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-1)


def test_auction_kernel_budget_quality_contract():
    """The kernel path's quality contract across rounds budgets on a hard
    square problem: (a) a generous budget with 2 eps phases + escalation
    reaches the Hungarian optimum within the epsilon bound; (b) the
    production budget (48, where truncation + greedy completion kick in)
    yields a VALID solve — every match gated, auction-assigned columns
    one-to-one — whose energy a bigger budget only improves.  The
    truncation's optimality gap is a deliberate trade: it is invisible at
    the pose level (NOTES.md auction economics) and costs ~0 time."""
    import ghicp_tpu.matching.auction as au
    rng = np.random.default_rng(17)
    n = 512
    cd = rng.uniform(0, 10, size=(n, n)).astype(np.float32)
    penalty = 8.0
    m = jnp.ones(n, bool)

    def solve(budget, rel_eps):
        old = au._KERNEL_INTERPRET
        au._KERNEL_INTERPRET = True
        try:
            return auction_match(jnp.asarray(cd), jnp.float32(penalty), m, m,
                                 eps_final=0.01, max_rounds=budget,
                                 rel_eps=rel_eps, use_round_kernel=True,
                                 n_phases=2)
        finally:
            au._KERNEL_INTERPRET = old

    def total(res):
        w = np.asarray(res.match.w)
        tj = np.asarray(res.match.tgt_idx)
        t = sum(-cd[i, tj[i]] for i in range(n) if w[i] > 0)
        return t - penalty * (n - int(w.sum()))

    ref_total, _ = _km_reference(cd, penalty, n, n)

    # Exact mode (absolute eps, generous budget): the GS kernel + escalation
    # must land within the n*eps epsilon-CS bound of the Hungarian optimum
    # (escalation only engages past half the budget — convergence is long
    # before, so it must not perturb exactness).
    res_big = solve(16384, rel_eps=0.0)
    assert total(res_big) >= ref_total - n * 0.01 - 1e-2, (
        total(res_big), ref_total)

    res_prod = solve(48, rel_eps=1.0 / 64.0)
    w = np.asarray(res_prod.match.w)
    tj = np.asarray(res_prod.match.tgt_idx)
    for i in range(n):
        if w[i] > 0:
            assert cd[i, tj[i]] < penalty   # gate always respected


def test_auction_production_budget_energy_gap():
    """PRODUCTION defaults (auction_max_rounds=2, auction_phases=1,
    rel_eps=1/64, bf16) measured against scipy Hungarian on bench-statistics
    matrices (shared keypoints + noise, integer min-Hamming FD with decoy
    tie clusters, ~2k rows — the regime every engine iteration solves).

    Documented contract (NOTES.md "production-budget matching quality"):
    * the energy gap vs the Hungarian optimum is < 0.5% in both the
      iteration-0 (pure integer FD, massive ties) and the late (ED-
      dominated) regime — measured 0.000% across seeds;
    * on ED-dominated matrices (iteration >= 2) the assignment is also
      exactly one-to-one;
    * on exact-tie iteration-0 matrices the greedy completion may assign
      duplicate columns among TIED optima (energy-equal, so pose-neutral);
      the reference's KM would pick one arbitrary perfect matching of the
      same energy (km.cpp:128-141 Calenergy is the comparable metric).
    """
    def bench_matrix(n, seed, it, n_decoys=6):
        rng = np.random.default_rng(seed)
        kp = rng.uniform(0, 25, (n, 3)).astype(np.float32)
        kps = kp + rng.normal(0, 0.05, kp.shape).astype(np.float32)
        perm = rng.permutation(n)
        kpt = (kp + rng.normal(0, 0.05, kp.shape).astype(np.float32))[perm]
        ed = (0.005 * 43.0 * np.linalg.norm(
            kps[:, None] - kpt[None], axis=-1)).astype(np.float32)
        fd = rng.integers(170, 260, (n, n)).astype(np.float32)
        for _ in range(n_decoys):      # tie clusters (repeated structure)
            cols = rng.integers(0, n, n)
            fd[np.arange(n), cols] = np.minimum(fd[np.arange(n), cols], 80)
        fd[np.arange(n), np.argsort(perm)] = 80
        wfd = np.exp(-it / 6.0)
        cd = ((1 - wfd) * ed + wfd * fd).astype(np.float32)
        pen = float(cd.mean() - 2.0 * cd.std())
        if it > 1:
            pen = max(pen, 5.0)
        return cd, pen

    n = 2048
    m = jnp.ones(n, bool)
    for it in (0, 2):
        for seed in (0, 1):
            cd, pen = bench_matrix(n, seed, it)
            b = np.where(cd < pen, -cd, -pen)
            ri, ci = linear_sum_assignment(-b)
            opt = b[ri, ci].sum()
            res = auction_match(jnp.asarray(cd), jnp.float32(pen), m, m,
                                eps_final=0.01, max_rounds=2, n_phases=1,
                                rel_eps=1.0 / 64.0, quantize_bf16=True)
            got = -float(res.energy)
            gap = (opt - got) / abs(opt)
            assert gap < 0.005, (it, seed, gap)
            if it >= 2:   # ED-dominated: exactly one-to-one
                tj = np.asarray(res.match.tgt_idx)
                w = np.asarray(res.match.w)
                real = tj[w > 0]
                assert len(real) == len(np.unique(real)), (it, seed)


def test_auction_hint_keep_test_matches_inline():
    """The fused-kernel CS hints (hint_v1/hint_vsel computed in the same
    sweep that builds the benefit matrix) must produce EXACTLY the result
    of the in-solver full-matrix keep test when they encode the same
    quantities (p_defl == the solver's deflated owner-zeroed prices,
    slack == 0)."""
    import jax.numpy as jnp
    from ghicp_tpu.matching.auction import _SINK, auction_match_benefits
    rng = np.random.default_rng(31)
    S = C = 128
    cd = rng.uniform(0.0, 4.0, (S, C)).astype(np.float32)
    penalty = 3.0
    b = np.where(cd < penalty, -cd, -3.0e38).astype(np.float32)
    ms = jnp.ones(S, bool)
    # a previous solve provides warm state
    a0 = auction_match_benefits(jnp.asarray(b), jnp.float32(penalty), ms, ms,
                                eps_final=0.01, max_rounds=500)
    # drift the benefits a little
    b1 = (b + np.where(b > -1e30, rng.uniform(-0.02, 0.02, b.shape), 0.0)
          ).astype(np.float32)
    d = 0.05
    cold = auction_match_benefits(jnp.asarray(b1), jnp.float32(penalty), ms,
                                  ms, eps_final=0.01, max_rounds=500,
                                  p0=a0.prices, price_uncertainty=d,
                                  acol0=a0.acol)
    # replicate the solver's p_init: deflate then zero unowned columns
    acol0 = np.asarray(a0.acol)
    real0 = (acol0 >= 0) & (acol0 < C)
    owner = np.full(C, -1, np.int64)
    for r in np.argsort(np.arange(S)):   # max-row-id wins scatter
        if real0[r]:
            owner[acol0[r]] = max(owner[acol0[r]], r)
    p_init = np.maximum(np.asarray(a0.prices) - d, 0.0)
    p_init[owner < 0] = 0.0
    v = b1 - p_init[None, :]
    v1 = v.max(axis=1)
    vsel = np.where(real0, v[np.arange(S), np.where(real0, acol0, 0)],
                    -3.0e38).astype(np.float32)
    hinted = auction_match_benefits(jnp.asarray(b1), jnp.float32(penalty),
                                    ms, ms, eps_final=0.01, max_rounds=500,
                                    p0=a0.prices, price_uncertainty=d,
                                    acol0=a0.acol,
                                    hint_v1=jnp.asarray(v1),
                                    hint_vsel=jnp.asarray(vsel))
    assert np.array_equal(np.asarray(cold.acol), np.asarray(hinted.acol))
    np.testing.assert_allclose(np.asarray(cold.prices),
                               np.asarray(hinted.prices), rtol=1e-6)
    assert float(cold.energy) == float(hinted.energy)
