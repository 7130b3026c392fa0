"""Dense-lane warm fast path (GHICPConfig.dense_fast_path).

Stats-free iterations with few CS violators must skip the full benefit
sweep + full-matrix solver (routing through the stream_solve compact
machinery over dense-FD gathers) WITHOUT changing the recovered pose.
Counterpart of the streaming lane's fast-path tests
(test_stream_engine.py); reference per-iteration passes being skipped:
ghicp_reg.cpp:114-341, km.cpp:40.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                   GHICPConfig)
from ghicp_tpu.registration.ghicp import ghicp_register

# Module-level call counter: the jitted engine executable is cached across
# tests with identical (config, shapes), and the baked-in debug callback
# closes over whatever list it was traced with — a module global survives
# the cache.
_CALLS = []


def _keypoint_problem(seed=0, n=256, rot_deg=5.0):
    """Keypoint-level problem with informative FD: target = scene points,
    source = rigidly offset copy (same index = true correspondence), FD
    low on the true diagonal and high elsewhere — iteration 0's pure-FD
    matching then finds the right pairs, like real BSC features do."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    th = np.deg2rad(rot_deg)
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    t = np.float32([0.5, -0.3, 0.1])
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R
    T_gt[:3, 3] = t
    kp_t = pts
    kp_s = ((pts - t) @ R + rng.normal(0, 0.01, pts.shape)).astype(
        np.float32)
    fd = rng.integers(80, 200, (n, n)).astype(np.float32)
    fd[np.arange(n), np.arange(n)] = rng.integers(0, 15, n)
    mask = np.ones(n, bool)
    return (jnp.asarray(kp_s), jnp.asarray(mask), jnp.asarray(kp_t),
            jnp.asarray(mask), jnp.asarray(fd), T_gt)


def _pose_err(T_est, T_gt):
    dR = np.asarray(T_est)[:3, :3] @ T_gt[:3, :3].T
    rot = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    return rot, np.linalg.norm(np.asarray(T_est)[:3, 3] - T_gt[:3, 3])


@pytest.mark.parametrize("seed", [0, 3])
def test_dense_fast_path_engages_and_recovers_pose(seed, monkeypatch):
    import ghicp_tpu.matching.stream_auction as sa

    kp_s, ms, kp_t, mt, fd, T_gt = _keypoint_problem(seed=seed)
    # Convergence thresholds zeroed: the clean synthetic problem otherwise
    # converges at iteration 2, before the stats-free phase (it_eff > 1)
    # the fast path needs.
    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      estimated_overlap=0.95, max_iterations=15,
                      converge_translation=0.0, converge_rotation=0.0,
                      auction_max_rounds=600, auction_round_kernel=False,
                      dense_fast_path=True, dense_open_cap=4096)

    orig = sa.stream_solve

    def wrapped(*a, **k):
        # Executes only when the cond actually takes the warm branch.
        jax.debug.callback(lambda: _CALLS.append(1))
        return orig(*a, **k)

    _CALLS.clear()
    monkeypatch.setattr(sa, "stream_solve", wrapped)
    fast = ghicp_register(kp_s, ms, kp_t, mt, fd, jnp.float32(20.0), cfg)
    jax.block_until_ready(fast.transform)
    assert len(_CALLS) > 0, "warm fast path never engaged"

    monkeypatch.setattr(sa, "stream_solve", orig)
    slow = ghicp_register(kp_s, ms, kp_t, mt, fd, jnp.float32(20.0),
                          dataclasses.replace(cfg, dense_fast_path=False))

    rf, tf_ = _pose_err(fast.transform, T_gt)
    rs, ts_ = _pose_err(slow.transform, T_gt)
    assert rs < 0.5 and ts_ < 0.1, (rs, ts_)
    assert rf < 0.5 and tf_ < 0.1, (rf, tf_)
    # Same correspondence counts at convergence (the fast path's compact
    # re-bidding keeps the epsilon-optimal matching contract).
    it = min(int(fast.iterations), int(slow.iterations))
    cor_f = np.asarray(fast.metrics.cor)[:it]
    cor_s = np.asarray(slow.metrics.cor)[:it]
    assert abs(int(cor_f[-1]) - int(cor_s[-1])) <= 3, (cor_f, cor_s)


def test_dense_fast_path_off_by_zero_cap():
    """dense_fast_path off (the default) routes everything through the full
    solve (no stream_solve calls)."""
    import ghicp_tpu.matching.stream_auction as sa

    kp_s, ms, kp_t, mt, fd, T_gt = _keypoint_problem(seed=1)
    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      estimated_overlap=0.95, max_iterations=8,
                      auction_max_rounds=600, auction_round_kernel=False)
    orig = sa.stream_solve

    def wrapped(*a, **k):
        jax.debug.callback(lambda: _CALLS.append(1))
        return orig(*a, **k)

    _CALLS.clear()
    old = sa.stream_solve
    sa.stream_solve = wrapped
    try:
        res = ghicp_register(kp_s, ms, kp_t, mt, fd, jnp.float32(20.0),
                             cfg)
        jax.block_until_ready(res.transform)
    finally:
        sa.stream_solve = old
    assert not _CALLS
    rot, tr = _pose_err(res.transform, T_gt)
    assert rot < 0.5 and tr < 0.1
