"""Multi-device tests on the 8-way virtual CPU mesh (conftest.py forces
XLA_FLAGS=--xla_force_host_platform_device_count=8; SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                   GHICPConfig)
from ghicp_tpu.registration.ghicp import ghicp_register
from ghicp_tpu.shard import ghicp_register_sharded, make_mesh


def _problem(seed=0, S=128, T=96, n_live_s=100, n_live_t=90):
    rng = np.random.default_rng(seed)
    tgt = rng.uniform(0, 10, (T, 3)).astype(np.float32)
    theta = np.deg2rad(8.0)
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], np.float32)
    t = np.float32([0.5, -0.3, 0.2])
    src = ((tgt[:S] if S <= T else
            np.concatenate([tgt, rng.uniform(0, 10, (S - T, 3)).astype(np.float32)]))
           - t) @ R
    src = src.astype(np.float32) + rng.normal(0, 0.005, (S, 3)).astype(np.float32)
    mask_s = np.arange(S) < n_live_s
    mask_t = np.arange(T) < n_live_t
    fd = np.zeros((S, T), np.float32)
    return (jnp.asarray(src), jnp.asarray(mask_s), jnp.asarray(tgt),
            jnp.asarray(mask_t), jnp.asarray(fd))


@pytest.mark.parametrize("corr", [CorrespondenceType.NN,
                                  CorrespondenceType.NNR,
                                  CorrespondenceType.KM])
def test_sharded_matches_single_device(corr):
    """The SPMD engine must agree with the single-device engine."""
    assert len(jax.devices()) >= 8
    kp_s, mask_s, kp_t, mask_t, fd = _problem()
    cfg = GHICPConfig(feature=FeatureType.NONE, correspondence=corr,
                      estimated_overlap=0.8, max_iterations=8,
                      auction_max_rounds=600)
    single = ghicp_register(kp_s, mask_s, kp_t, mask_t, fd,
                            jnp.float32(30.0), cfg)
    mesh = make_mesh(8)
    shard = ghicp_register_sharded(kp_s, mask_s, kp_t, mask_t, fd,
                                   30.0, cfg, mesh)
    np.testing.assert_allclose(np.asarray(shard.transform),
                               np.asarray(single.transform), atol=2e-4)
    assert int(shard.iterations) == int(single.iterations)
    it = int(single.iterations)
    np.testing.assert_allclose(np.asarray(shard.metrics.rmse)[:it],
                               np.asarray(single.metrics.rmse)[:it],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(shard.metrics.cor)[:it],
                                  np.asarray(single.metrics.cor)[:it])


def test_sharded_fused_kernel_matches_single_device():
    """The fused benefit kernel runs sharded (interpret mode on the CPU
    mesh): per-device row-shard kernels + psum'd statistics must land the
    single-device fused result exactly (VERDICT r2 item 2: the fast path
    must not be single-device-only)."""
    assert len(jax.devices()) >= 8
    import ghicp_tpu.registration.ghicp as eng
    kp_s, mask_s, kp_t, mask_t, fd = _problem(seed=3, S=256, T=128,
                                              n_live_s=230, n_live_t=120)
    fd = jnp.asarray(np.random.default_rng(4).integers(
        0, 200, fd.shape).astype(np.float32))
    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      estimated_overlap=0.8, max_iterations=6,
                      auction_max_rounds=600, auction_round_kernel=False)
    old = eng._FUSED_INTERPRET
    eng._FUSED_INTERPRET = True
    try:
        single = ghicp_register(kp_s, mask_s, kp_t, mask_t, fd,
                                jnp.float32(30.0), cfg)
        shard = ghicp_register_sharded(kp_s, mask_s, kp_t, mask_t, fd,
                                       30.0, cfg, make_mesh(8))
    finally:
        eng._FUSED_INTERPRET = old
    it = int(single.iterations)
    assert int(shard.iterations) == it
    np.testing.assert_array_equal(np.asarray(shard.metrics.cor)[:it],
                                  np.asarray(single.metrics.cor)[:it])
    np.testing.assert_allclose(np.asarray(shard.metrics.rmse)[:it],
                               np.asarray(single.metrics.rmse)[:it],
                               rtol=1e-3, atol=1e-4)
    # psum'd statistics change fp accumulation order -> ~1e-3 transform
    # noise; the MATCHING (cor) above is exact.
    np.testing.assert_allclose(np.asarray(shard.transform),
                               np.asarray(single.transform), atol=3e-3)


def test_sharded_stream_kernel_matches_single_device():
    """The streaming sweep kernel likewise runs sharded (interpret mode):
    row-shard Pallas sweeps + mesh-axis auction resolution must land the
    single-device result."""
    assert len(jax.devices()) >= 8
    import ghicp_tpu.registration.ghicp as eng
    from ghicp_tpu.features.bsc import pack_bits
    from ghicp_tpu.ops.stream_kernel import make_stream_features
    rng = np.random.default_rng(5)
    S = C = 256
    n_bits = 441
    kp = rng.uniform(0, 20, (S, 3)).astype(np.float32)
    kp_s = jnp.asarray(kp + rng.normal(0, 0.3, kp.shape).astype(np.float32))
    kp_t = jnp.asarray(kp[rng.permutation(S)])
    feats = make_stream_features(
        packed_s=pack_bits(jnp.asarray(
            (rng.random((2, S, n_bits)) < 0.3).astype(np.float32))),
        packed_t=pack_bits(jnp.asarray(
            (rng.random((1, C, n_bits)) < 0.3).astype(np.float32))),
        n_bits=n_bits)
    mask = jnp.ones(S, bool)
    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      max_iterations=4, auction_max_rounds=64,
                      streaming_cost="on")
    old = eng._STREAM_INTERPRET
    eng._STREAM_INTERPRET = True
    try:
        single = ghicp_register(kp_s, mask, kp_t, mask, None,
                                jnp.float32(30.0), cfg, stream=feats)
        shard = ghicp_register_sharded(kp_s, mask, kp_t, mask, None,
                                       jnp.float32(30.0), cfg, make_mesh(8),
                                       stream=feats)
    finally:
        eng._STREAM_INTERPRET = old
    it = int(single.iterations)
    assert int(shard.iterations) == it
    np.testing.assert_array_equal(np.asarray(shard.metrics.cor)[:it],
                                  np.asarray(single.metrics.cor)[:it])
    np.testing.assert_allclose(np.asarray(shard.transform),
                               np.asarray(single.transform), atol=5e-4)


def test_sharded_auction_optimality():
    """Sharded auction reaches the Hungarian optimum on a random matrix."""
    from scipy.optimize import linear_sum_assignment
    from ghicp_tpu.core.comm import Comm
    from ghicp_tpu.matching.auction import auction_match
    from jax.sharding import PartitionSpec as P

    rng = np.random.default_rng(1)
    S = T = 64
    cd = rng.uniform(0, 10, (S, T)).astype(np.float32)
    penalty = 6.0
    mesh = make_mesh(8)
    comm = Comm(axis="rows")

    @jax.jit
    @functools_partial_shard(mesh)
    def run(cd, mask_s, mask_t):
        return auction_match(cd, jnp.float32(penalty), mask_s, mask_t,
                             eps_final=0.001, comm=comm, total_rows=S).match

    match = run(jnp.asarray(cd), jnp.ones(S, bool), jnp.ones(T, bool))
    w = np.asarray(match.w)
    tj = np.asarray(match.tgt_idx)
    n = max(S, T)
    got = sum(-cd[i, tj[i]] for i in range(S) if w[i] > 0) \
        - penalty * (n - int(w.sum()))
    b = np.full((n, n), -penalty)
    gate = cd < penalty
    b[:S, :T] = np.where(gate, -cd, -penalty)
    ri, ci = linear_sum_assignment(-b)
    ref = b[ri, ci].sum()
    assert got >= ref - n * 0.001 - 1e-3, (got, ref)


def functools_partial_shard(mesh):
    """shard_map decorator: rows sharded, masks sharded/replicated."""
    import functools
    from jax.sharding import PartitionSpec as P
    from ghicp_tpu.matching.matchers import MatchResult

    def deco(f):
        return functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P("rows"), P("rows"), P()),
            out_specs=MatchResult(tgt_idx=P("rows"), w=P("rows"),
                                  n_matches=P()),
            check_vma=False)(f)
    return deco


def test_sharded_gs_kernel_reconciliation():
    """Sharded GS auction kernel (per-device whole-sweep launches + mesh
    price/winner reconciliation, VERDICT r3 task 2a): a real registration
    problem lands the single-device GS kernel's pose on the 8-device mesh
    (trajectories differ — cross-device price information is delayed one
    sweep — but both are eps-CS auctions on the same cost field)."""
    import ghicp_tpu.matching.auction as au
    import ghicp_tpu.registration.ghicp as eng
    from __graft_entry__ import _pose_err, _registration_problem
    from ghicp_tpu.registration.ghicp import ghicp_register

    assert len(jax.devices()) >= 8
    S = T = 2048
    src, tgt, fd_np, _, _, T_gt = _registration_problem(S, T, seed=2)
    kp_s, kp_t = jnp.asarray(src), jnp.asarray(tgt)
    ms = jnp.ones((S,), bool)
    mt = jnp.ones((T,), bool)
    fd = jnp.asarray(fd_np)
    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      estimated_overlap=0.95, max_iterations=4,
                      auction_max_rounds=8, auction_round_kernel=True)
    old_f, old_k = eng._FUSED_INTERPRET, au._KERNEL_INTERPRET
    eng._FUSED_INTERPRET = au._KERNEL_INTERPRET = True
    try:
        single = ghicp_register(kp_s, ms, kp_t, mt, fd, jnp.float32(40.0),
                                cfg)
        shard = ghicp_register_sharded(kp_s, ms, kp_t, mt, fd, 40.0, cfg,
                                       make_mesh(8))
    finally:
        eng._FUSED_INTERPRET, au._KERNEL_INTERPRET = old_f, old_k
    rs, ts_ = _pose_err(np.asarray(single.transform), T_gt)
    rh, th_ = _pose_err(np.asarray(shard.transform), T_gt)
    assert rs < 1.5 and ts_ < 0.25, (rs, ts_)
    assert rh < 1.5 and th_ < 0.25, (rh, th_)
    # Relative agreement between the two solvers.
    d = np.asarray(shard.transform)[:3, :3] @ np.asarray(
        single.transform)[:3, :3].T
    c = np.clip((np.trace(d) - 1) / 2, -1, 1)
    assert np.degrees(np.arccos(c)) < 1.0
