"""Fused cost->benefit kernel (ops/cost_kernel.py): interpret-mode parity
vs the jnp reference and the separate blend path, and engine-level
equivalence of the fused dispatch."""
import numpy as np
import jax.numpy as jnp

from ghicp_tpu.ops.cost_kernel import fused_benefit, fused_benefit_ref


def _fixture(seed=0, S=256, C=384, offset=300.0):
    rng = np.random.default_rng(seed)
    kp_s = (rng.uniform(0, 12, (S, 3)) + offset).astype(np.float32)
    kp_t = (rng.uniform(0, 12, (C, 3)) + offset).astype(np.float32)
    fd = rng.integers(0, 441, (S, C)).astype(np.float32)
    ms = np.ones(S, bool); ms[-13:] = False
    mt = np.ones(C, bool); mt[-7:] = False
    return (jnp.asarray(kp_s), jnp.asarray(kp_t),
            jnp.asarray(fd).astype(jnp.bfloat16),
            jnp.asarray(ms), jnp.asarray(mt))


def test_fused_benefit_matches_ref():
    kp_s, kp_t, fd, ms, mt = _fixture()
    # center like the engine does
    mid = 0.5 * (jnp.min(jnp.where(mt[:, None], kp_t, 3e38), axis=0)
                 + jnp.max(jnp.where(mt[:, None], kp_t, -3e38), axis=0))
    args = (kp_s - mid, kp_t - mid, fd, ms, mt, 0.7, 0.3, 0.22)
    # Warm-start CS hint inputs: a nontrivial price vector and an acol0 mix
    # of real columns, -1 (no assignment) and a sink marker (2**30).
    rng = np.random.default_rng(5)
    S, C = fd.shape
    p = jnp.asarray(rng.uniform(0, 3, C).astype(np.float32))
    acol0 = rng.integers(0, C, S).astype(np.int32)
    acol0[::7] = -1
    acol0[::11] = 2**30
    acol0 = jnp.asarray(acol0)
    got = fused_benefit(*args, ts=128, interpret=True, p_defl=p, acol0=acol0)
    want = fused_benefit_ref(*args, p_defl=p, acol0=acol0)
    assert np.array_equal(np.asarray(got[0]), np.asarray(want[0]))
    for g, w in zip(got[1:7], want[1:7]):
        np.testing.assert_allclose(float(g), float(w), rtol=1e-5)
    # hint vectors (v1 [S], vsel [S])
    for g, w in zip(got[7:], want[7:]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-5)


def test_fused_benefit_matches_blend_path():
    """Stats and benefit values must agree with the separate
    euclidean_matrix + blend_bsc + gate pipeline (within bf16 rounding of
    the emitted matrix)."""
    from ghicp_tpu.matching.cost import blend_bsc, euclidean_matrix
    kp_s, kp_t, fd, ms, mt = _fixture(seed=3)
    mid = 0.5 * (jnp.min(jnp.where(mt[:, None], kp_t, 3e38), axis=0)
                 + jnp.max(jnp.where(mt[:, None], kp_t, -3e38), axis=0))
    wfd = float(np.exp(-2.0 / 6.0))
    wed = 1.0 - wfd
    scale = 0.15
    b, cnt, s1, s2, cdmax, edmax, bmax, _v1, _vsel = fused_benefit(
        kp_s - mid, kp_t - mid, fd, ms, mt, wed, wfd, scale,
        ts=128, interpret=True)
    ed = euclidean_matrix(kp_s, kp_t, jnp.float32(scale))
    cost = blend_bsc(ed, fd.astype(jnp.float32), ms, mt, jnp.float32(2.0),
                     jnp.float32(1.0), jnp.float32(100.0), jnp.float32(30.0),
                     jnp.float32(1.0), jnp.float32(1.0), jnp.float32(scale),
                     6.0, 2.0)
    mean = float(s1 / cnt)
    std = float(jnp.sqrt(jnp.maximum(s2 / cnt - (s1 / cnt) ** 2, 0.0)))
    np.testing.assert_allclose(mean, float(cost.cd_mean), rtol=2e-4)
    np.testing.assert_allclose(std, float(cost.cd_std), rtol=2e-3, atol=1e-4)
    m = np.asarray(ms)[:, None] & np.asarray(mt)[None, :]
    cd = np.where(m, np.asarray(cost.cd), 0.0)
    bb = np.asarray(b.astype(jnp.float32))
    # benefit = -cd within bf16 rounding at valid pairs
    np.testing.assert_allclose(np.where(m, bb, 0.0), -cd, rtol=1e-2,
                               atol=0.6)
    assert np.all(bb[~m] < -1e30)


def test_engine_fused_path_matches_xla_path():
    """End-to-end: the fused-kernel engine (interpret mode) must land on the
    same pose as the separate-blend engine within the bf16-benefit noise."""
    import dataclasses

    import ghicp_tpu.matching.auction as au
    import ghicp_tpu.registration.ghicp as gh
    from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                       GHICPConfig)
    from ghicp_tpu.io.synthetic import structured_scene
    from ghicp_tpu.registration import register_pair, transform_error

    rng = np.random.default_rng(9)
    pts = structured_scene(rng, 6000, extent=8.0)
    th = np.deg2rad(8.0)
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    t = np.float32([0.5, -0.3, 0.1])
    T_gt = np.eye(4, dtype=np.float32); T_gt[:3, :3] = R; T_gt[:3, 3] = t
    src = ((pts - t) @ R + rng.normal(0, 0.01, pts.shape)).astype(np.float32)
    tgt = (pts + rng.normal(0, 0.01, pts.shape)).astype(np.float32)

    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      voxel_size=0.15, neighborhood_radius=0.5,
                      non_max_radius=1.0, min_neighbors=8,
                      estimated_overlap=0.9, max_iterations=25)
    out_plain = register_pair(src, tgt,
                              dataclasses.replace(cfg,
                                                  fused_cost_kernel=False))
    old_f, old_k = gh._FUSED_INTERPRET, au._KERNEL_INTERPRET
    gh._FUSED_INTERPRET = True
    au._KERNEL_INTERPRET = True
    try:
        out_fused = register_pair(src, tgt, cfg)
    finally:
        gh._FUSED_INTERPRET = old_f
        au._KERNEL_INTERPRET = old_k
    r1, t1 = transform_error(out_plain.transform, T_gt)
    r2, t2 = transform_error(out_fused.transform, T_gt)
    assert r1 < 1.5 and t1 < 0.3, (r1, t1)
    assert r2 < 1.5 and t2 < 0.3, (r2, t2)


def test_fused_benefit_mult_blend_matches_ref():
    """FPFH/RoPS lane: cd = ed / max(fd, 1e-6)^k inside the kernel."""
    kp_s, kp_t, fd, ms, mt = _fixture(seed=7)
    sim = (jnp.abs(fd.astype(jnp.float32)) / 441.0).astype(jnp.float32)
    mid = 0.5 * (jnp.min(jnp.where(mt[:, None], kp_t, 3e38), axis=0)
                 + jnp.max(jnp.where(mt[:, None], kp_t, -3e38), axis=0))
    k = 1.0 / 3.0
    args = (kp_s - mid, kp_t - mid, sim, ms, mt, 1.0, k, 0.22)
    got = fused_benefit(*args, ts=128, interpret=True, mult_blend=True)
    want = fused_benefit_ref(*args, mult_blend=True)
    np.testing.assert_allclose(np.asarray(got[0].astype(jnp.float32)),
                               np.asarray(want[0].astype(jnp.float32)),
                               rtol=1e-2, atol=1e-2)
    for g, w in zip(got[1:7], want[1:7]):
        np.testing.assert_allclose(float(g), float(w), rtol=1e-4)


def test_engine_fused_rops_matches_xla_path():
    """RoPS through the fused kernel + GS auction (interpret mode) lands the
    same pose as the separate-blend XLA engine."""
    import dataclasses

    import ghicp_tpu.matching.auction as au
    import ghicp_tpu.registration.ghicp as gh
    from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                       GHICPConfig)
    from ghicp_tpu.io.synthetic import structured_scene
    from ghicp_tpu.registration import register_pair, transform_error

    rng = np.random.default_rng(14)
    pts = structured_scene(rng, 6000, extent=8.0)
    th = np.deg2rad(8.0)
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    t = np.float32([0.5, -0.3, 0.1])
    T_gt = np.eye(4, dtype=np.float32); T_gt[:3, :3] = R; T_gt[:3, 3] = t
    src = ((pts - t) @ R + rng.normal(0, 0.01, pts.shape)).astype(np.float32)
    tgt = (pts + rng.normal(0, 0.01, pts.shape)).astype(np.float32)

    cfg = GHICPConfig(feature=FeatureType.ROPS,
                      correspondence=CorrespondenceType.KM,
                      voxel_size=0.15, neighborhood_radius=0.5,
                      non_max_radius=1.0, min_neighbors=8,
                      estimated_overlap=0.9, max_iterations=25)
    out_plain = register_pair(src, tgt,
                              dataclasses.replace(cfg,
                                                  fused_cost_kernel=False))
    old_f, old_k = gh._FUSED_INTERPRET, au._KERNEL_INTERPRET
    gh._FUSED_INTERPRET = True
    au._KERNEL_INTERPRET = True
    try:
        out_fused = register_pair(src, tgt, cfg)
    finally:
        gh._FUSED_INTERPRET = old_f
        au._KERNEL_INTERPRET = old_k
    r1, t1 = transform_error(out_plain.transform, T_gt)
    r2, t2 = transform_error(out_fused.transform, T_gt)
    assert r1 < 1.5 and t1 < 0.3, (r1, t1)
    assert r2 < 1.5 and t2 < 0.3, (r2, t2)


def test_engine_warm_kernel_matches_two_launch_path():
    """The single-launch warm iteration (warm_fused_kernel, engaged at
    >= 1024 keypoints) lands the same registration as the two-launch
    fused+GS path on the same problem (interpret mode; the soundness-
    critical keep/epsilon plumbing otherwise only runs on real TPU)."""
    import dataclasses

    import ghicp_tpu.matching.auction as au
    import ghicp_tpu.registration.ghicp as gh
    from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                       GHICPConfig)
    from ghicp_tpu.registration.ghicp import ghicp_register
    from ghicp_tpu.registration.pipeline import transform_error

    import __graft_entry__ as ge
    S = T = 1024
    src, tgt, fd_np, bits_s, bits_t, T_gt = ge._registration_problem(
        S, T, seed=13)
    kp_s = jnp.asarray(src)
    kp_t = jnp.asarray(tgt)
    ms = jnp.ones((S,), bool)
    mt = jnp.ones((T,), bool)
    fd = jnp.asarray(fd_np)
    base = GHICPConfig(feature=FeatureType.BSC,
                       correspondence=CorrespondenceType.KM,
                       max_iterations=6, auction_max_rounds=4)
    old_f, old_k = gh._FUSED_INTERPRET, au._KERNEL_INTERPRET
    gh._FUSED_INTERPRET = True
    au._KERNEL_INTERPRET = True
    try:
        outs = {}
        for warm in (True, False):
            cfg = dataclasses.replace(base, warm_fused_kernel=warm)
            out = ghicp_register(kp_s, ms, kp_t, mt, fd, jnp.float32(40.0),
                                 cfg)
            outs[warm] = out
            rot, tr = transform_error(np.asarray(out.transform),
                                      np.asarray(T_gt))
            assert rot < 1.0 and tr < 0.2, (warm, rot, tr)
        dR = (np.asarray(outs[True].transform)[:3, :3]
              @ np.asarray(outs[False].transform)[:3, :3].T)
        c = np.clip((np.trace(dR) - 1.0) / 2.0, -1.0, 1.0)
        d_rot = float(np.degrees(np.arccos(c)))
        d_t = float(np.linalg.norm(
            np.asarray(outs[True].transform)[:3, 3]
            - np.asarray(outs[False].transform)[:3, 3]))
        assert d_rot < 0.5 and d_t < 0.1, (d_rot, d_t)
    finally:
        gh._FUSED_INTERPRET = old_f
        au._KERNEL_INTERPRET = old_k
