"""End-to-end streaming-lane tests: the engine with NO [S,T] tensor."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                   GHICPConfig)
from ghicp_tpu.io.synthetic import structured_scene
from ghicp_tpu.registration.pipeline import register_pair, transform_error


def _pair(seed=0, n=20000, extent=10.0, rot_deg=6.0):
    rng = np.random.default_rng(seed)
    pts = structured_scene(rng, n, extent=extent)
    th = np.deg2rad(rot_deg)
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    t = np.float32([0.6, -0.4, 0.1])
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R
    T_gt[:3, 3] = t
    src = ((pts - t) @ R + rng.normal(0, 0.01, pts.shape)).astype(np.float32)
    tgt = (pts + rng.normal(0, 0.01, pts.shape)).astype(np.float32)
    return src, tgt, T_gt


_BASE = dict(correspondence=CorrespondenceType.KM, voxel_size=0.15,
             neighborhood_radius=0.5, non_max_radius=1.0, min_neighbors=8,
             estimated_overlap=0.9, max_iterations=40,
             ransac_hypotheses=4096)


@pytest.mark.parametrize("feature", [FeatureType.BSC, FeatureType.FPFH,
                                     FeatureType.NONE])
def test_register_pair_streaming_matches_dense(feature):
    """streaming_cost='on' (matrix-free lane) lands the same registration
    as the dense path on the full pipeline."""
    src, tgt, T_gt = _pair(seed=feature.value.__hash__() % 7)
    kw = dict(_BASE)
    if feature == FeatureType.NONE:
        kw["coarse_init"] = "none"
        kw["max_iterations"] = 60
    dense = register_pair(src, tgt, GHICPConfig(
        feature=feature, streaming_cost="off", **kw))
    stream = register_pair(src, tgt, GHICPConfig(
        feature=feature, streaming_cost="on", **kw))
    rot_d, tr_d = transform_error(dense.transform, T_gt)
    rot_s, tr_s = transform_error(stream.transform, T_gt)
    assert rot_s < 2.0 and tr_s < 0.3, (feature, rot_s, tr_s)
    # Both paths solve the same problem: pose agreement within the
    # engine's own convergence tolerance.
    rot_ds, tr_ds = transform_error(stream.transform, dense.transform)
    assert rot_ds < 0.5 and tr_ds < 0.1, (feature, rot_ds, tr_ds)
    if stream.success != dense.success:
        # Knife-edge tolerance: the success verdict is a hard threshold
        # (rmse_after < 1.5*NMS, ghicp_reg.cpp:918-924) and this pair's
        # matched RMSE sits near it.  The two lanes also report DIFFERENT
        # honest one-to-one statistics by design (the dense lane re-solves
        # at tight epsilon, the streaming lane deduplicates its in-loop
        # matching — see _final_resolve_jit), so near the threshold the
        # flags may legitimately disagree; require the statistics
        # themselves to be close instead.
        # The dense statistic is over a COMPLETE one-to-one matching
        # (tight re-solve pushes surplus rows onto far columns); the
        # streaming statistic drops duplicate losers, a closer subset —
        # a systematic ~0.5 offset on marginal-repeatability scenes.
        thr = 1.5 * 1.0
        near = abs(float(stream.final_rmse) - thr) < 0.05 * thr
        close = abs(float(stream.final_rmse)
                    - float(dense.final_rmse)) < 0.75
        garbage = max(float(stream.final_rmse),
                      float(dense.final_rmse)) > 2.0 * thr
        assert (near or close) and not garbage, (
            feature, float(stream.final_rmse), float(dense.final_rmse))


def test_sharded_streaming_matches_single_device():
    """Row-sharded streaming engine on the 8-device CPU mesh lands the
    single-device result (same matrix-free math, reductions over the mesh
    axis)."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from ghicp_tpu.core.types import PointCloud
    from ghicp_tpu.ops.stream_kernel import make_stream_features
    from ghicp_tpu.features.bsc import pack_bits
    from ghicp_tpu.registration.ghicp import ghicp_register
    from ghicp_tpu.shard.spmd import ghicp_register_sharded, make_mesh

    rng = np.random.default_rng(3)
    S = C = 512
    n_bits = 441
    kp = rng.uniform(0, 20, (S, 3)).astype(np.float32)
    kp_s = jnp.asarray(kp + rng.normal(0, 0.3, kp.shape).astype(np.float32))
    kp_t = jnp.asarray(kp[rng.permutation(S)])
    bits_s = (rng.random((2, S, n_bits)) < 0.3).astype(np.float32)
    bits_t = (rng.random((1, C, n_bits)) < 0.3).astype(np.float32)
    feats = make_stream_features(packed_s=pack_bits(jnp.asarray(bits_s)),
                                 packed_t=pack_bits(jnp.asarray(bits_t)),
                                 n_bits=n_bits)
    mask = jnp.ones(S, bool)
    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      max_iterations=6, auction_max_rounds=64,
                      streaming_cost="on")
    bbx = jnp.float32(30.0)
    single = ghicp_register(kp_s, mask, kp_t, mask, None, bbx, cfg,
                            stream=feats)
    mesh = make_mesh(8)
    shard = ghicp_register_sharded(kp_s, mask, kp_t, mask, None, bbx, cfg,
                                   mesh, stream=feats)
    np.testing.assert_allclose(np.asarray(shard.transform),
                               np.asarray(single.transform), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(shard.metrics.cor),
                                  np.asarray(single.metrics.cor))
    np.testing.assert_allclose(np.asarray(shard.metrics.rmse),
                               np.asarray(single.metrics.rmse), atol=1e-4)


def test_ring_streaming_matches_single_device():
    """Ring-rotated target factor blocks (ppermute dataflow) land the
    single-device streaming result — SURVEY §5's 'never materialize the
    cost matrix globally; ring-rotated' mandate, end to end."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from ghicp_tpu.features.bsc import pack_bits
    from ghicp_tpu.ops.stream_kernel import make_stream_features
    from ghicp_tpu.registration.ghicp import ghicp_register
    from ghicp_tpu.shard.spmd import ghicp_register_ring, make_mesh

    rng = np.random.default_rng(7)
    S = C = 512
    n_bits = 441
    kp = rng.uniform(0, 20, (S, 3)).astype(np.float32)
    kp_s = jnp.asarray(kp + rng.normal(0, 0.3, kp.shape).astype(np.float32))
    kp_t = jnp.asarray(kp[rng.permutation(S)])
    packed_s = pack_bits(jnp.asarray(
        (rng.random((2, S, n_bits)) < 0.3).astype(np.float32)))
    packed_t = pack_bits(jnp.asarray(
        (rng.random((1, C, n_bits)) < 0.3).astype(np.float32)))
    feats = make_stream_features(packed_s=packed_s, packed_t=packed_t,
                                 n_bits=n_bits)
    mask = jnp.ones(S, bool)
    # Pin the warm fast path off so both sides run identical full-sweep
    # schedules and the ring's bit-equality contract stays checkable
    # (the fast lane's ring parity has its own test below).
    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      max_iterations=6, auction_max_rounds=64,
                      streaming_cost="on", stream_fast_path=False)
    bbx = jnp.float32(30.0)
    single = ghicp_register(kp_s, mask, kp_t, mask, None, bbx, cfg,
                            stream=feats)
    ring = ghicp_register_ring(kp_s, mask, kp_t, mask, feats, packed_s,
                               packed_t, bbx, cfg, make_mesh(8))
    # The MATCHING is bit-identical (lowest-id tie-breaking makes the
    # argmax scan-order-independent); metrics/transform differ only by
    # block-order fp summation in the CD statistics (~1e-3).
    np.testing.assert_array_equal(np.asarray(ring.matches),
                                  np.asarray(single.matches))
    np.testing.assert_array_equal(np.asarray(ring.metrics.cor),
                                  np.asarray(single.metrics.cor))
    np.testing.assert_allclose(np.asarray(ring.transform),
                               np.asarray(single.transform), atol=5e-4)
    np.testing.assert_allclose(np.asarray(ring.metrics.rmse),
                               np.asarray(single.metrics.rmse), atol=2e-3)


def test_sharded_streaming_4k_rows_per_device():
    """Scale probe on the virtual mesh: 4096 rows/device x 8 devices
    (32768 source keypoints) register through the matrix-free lane — the
    configuration whose dense FD would be a 32768 x 2048 x 4B = 268MB
    matrix per iteration pass (and 10GB at the 50k x 50k flagship this
    lane exists for).  Reduced bit count keeps single-core CPU runtime
    sane; the dataflow (factor sweeps + mesh-axis auction resolution) is
    the TPU one."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from ghicp_tpu.features.bsc import pack_bits
    from ghicp_tpu.ops.stream_kernel import make_stream_features
    from ghicp_tpu.shard.spmd import ghicp_register_sharded, make_mesh

    rng = np.random.default_rng(5)
    S = 4096 * 8
    C = 2048
    n_bits = 96
    base = rng.uniform(0, 40, (C, 3)).astype(np.float32)
    # every source row corresponds to a target (many-to-one at this ratio)
    src_of = rng.integers(0, C, S)
    kp_s = jnp.asarray(base[src_of]
                       + rng.normal(0, 0.05, (S, 3)).astype(np.float32))
    kp_t = jnp.asarray(base)
    bits_t = (rng.random((C, n_bits)) < 0.4).astype(np.float32)
    flip = rng.random((S, n_bits)) < 0.05
    bits_s = np.where(flip, 1 - bits_t[src_of], bits_t[src_of])
    feats = make_stream_features(
        packed_s=pack_bits(jnp.asarray(bits_s[None])),
        packed_t=pack_bits(jnp.asarray(bits_t[None])), n_bits=n_bits)
    mask_s = jnp.ones(S, bool)
    mask_t = jnp.ones(C, bool)
    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      max_iterations=2, auction_max_rounds=2,
                      streaming_cost="on")
    res = ghicp_register_sharded(kp_s, mask_s, kp_t, mask_t, None,
                                 jnp.float32(70.0), cfg, make_mesh(8),
                                 stream=feats)
    cor = np.asarray(res.metrics.cor)
    it = max(int(res.iterations) - 1, 0)
    # near-identity start on a noisy correspondence problem: the engine
    # must produce a large, gated correspondence set and finite metrics.
    assert cor[it] > C // 2, cor
    assert np.isfinite(np.asarray(res.metrics.rmse)[it])


def test_stream_fast_path_pose_parity():
    """The warm fast path (skip sweep-0 via hint carry + open-row
    compaction) lands the same registration as the full-sweep streaming
    engine — it changes dataflow and tie resolution, never the gate or
    pose quality."""
    src, tgt, T_gt = _pair(seed=4)
    kw = dict(_BASE)
    slow = register_pair(src, tgt, GHICPConfig(
        feature=FeatureType.BSC, streaming_cost="on",
        stream_fast_path=False, stream_open_cap=0, **kw))
    fast = register_pair(src, tgt, GHICPConfig(
        feature=FeatureType.BSC, streaming_cost="on",
        stream_fast_path=True, stream_open_cap=256, **kw))
    rot_f, tr_f = transform_error(fast.transform, T_gt)
    assert rot_f < 2.0 and tr_f < 0.3, (rot_f, tr_f)
    # Mutual agreement: the two engines walk tie-shuffled trajectories
    # (the wide penalty gate makes the matching degenerate at the tie
    # level), so each lands within the GT gate but up to ~2x the per-run
    # wobble apart from the other.
    rot_fs, tr_fs = transform_error(fast.transform, slow.transform)
    assert rot_fs < 1.0 and tr_fs < 0.2, (rot_fs, tr_fs)
    if fast.success != slow.success:
        # Success is a hard threshold on the honest one-to-one matched
        # RMSE (1.5*NMS, ghicp_reg.cpp:918-924) and this scene sits at the
        # knife edge; the two lanes converge at different iteration counts
        # (the fast lane's kept matching makes steps shrink sooner), so
        # the flag may flip within a few percent of the bound at equal
        # pose.  Same tolerance as the streaming-vs-dense parity test.
        thr = 1.5 * 1.0
        assert abs(float(fast.final_rmse) - thr) < 0.05 * thr, (
            float(fast.final_rmse), float(slow.final_rmse))


def test_ring_streaming_fast_path_matches_single():
    """The warm fast path now runs on the ring lane too (sweep-0 skip via
    hint carry; compact ring sweeps via the sweep_sub_fn hook).  Per-row
    carries and exact vsel gathers are deterministic, so ring-fast still
    lands the single-device-fast result."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from ghicp_tpu.features.bsc import pack_bits
    from ghicp_tpu.ops.stream_kernel import make_stream_features
    from ghicp_tpu.registration.ghicp import ghicp_register
    from ghicp_tpu.shard.spmd import ghicp_register_ring, make_mesh

    rng = np.random.default_rng(17)
    S = C = 512
    n_bits = 441
    kp = rng.uniform(0, 20, (S, 3)).astype(np.float32)
    kp_s = jnp.asarray(kp + rng.normal(0, 0.3, kp.shape).astype(np.float32))
    kp_t = jnp.asarray(kp[rng.permutation(S)])
    packed_s = pack_bits(jnp.asarray(
        (rng.random((2, S, n_bits)) < 0.3).astype(np.float32)))
    packed_t = pack_bits(jnp.asarray(
        (rng.random((1, C, n_bits)) < 0.3).astype(np.float32)))
    feats = make_stream_features(packed_s=packed_s, packed_t=packed_t,
                                 n_bits=n_bits)
    mask = jnp.ones(S, bool)
    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      max_iterations=6, auction_max_rounds=64,
                      streaming_cost="on", stream_fast_path=True,
                      stream_open_cap=256)
    bbx = jnp.float32(30.0)
    single = ghicp_register(kp_s, mask, kp_t, mask, None, bbx, cfg,
                            stream=feats)
    ring = ghicp_register_ring(kp_s, mask, kp_t, mask, feats, packed_s,
                               packed_t, bbx, cfg, make_mesh(8))
    # Early (stats-bearing) iterations see the documented block-order
    # summation wobble in the penalty; stats-free fast iterations are
    # exactly deterministic.  Assert agreement at the correspondence and
    # pose level.
    cor_r = np.asarray(ring.metrics.cor).astype(float)
    cor_s = np.asarray(single.metrics.cor).astype(float)
    assert (np.abs(cor_r - cor_s) <= 0.1 * np.maximum(cor_s, 50)).all()
    np.testing.assert_allclose(np.asarray(ring.transform),
                               np.asarray(single.transform), atol=5e-3)


def test_ring_compact_sweeps_engage():
    """Compact ring sweeps (the sweep_sub_fn hook) actually run: 4096
    source rows over 8 devices = 512 rows/shard, open_cap 256 < 512, so
    warm bidding rounds must take the compacted path — and still land the
    full-sweep ring result."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from ghicp_tpu.features.bsc import pack_bits
    from ghicp_tpu.ops.stream_kernel import make_stream_features
    from ghicp_tpu.shard.spmd import ghicp_register_ring, make_mesh

    rng = np.random.default_rng(23)
    S = 4096
    C = 1024
    n_bits = 96
    base = rng.uniform(0, 30, (C, 3)).astype(np.float32)
    src_of = rng.integers(0, C, S)
    kp_s = jnp.asarray(base[src_of]
                       + rng.normal(0, 0.05, (S, 3)).astype(np.float32))
    kp_t = jnp.asarray(base)
    bits_t = (rng.random((C, n_bits)) < 0.4).astype(np.float32)
    flip = rng.random((S, n_bits)) < 0.05
    bits_s = np.where(flip, 1 - bits_t[src_of], bits_t[src_of])
    packed_s = pack_bits(jnp.asarray(bits_s[None]))
    packed_t = pack_bits(jnp.asarray(bits_t[None]))
    feats = make_stream_features(packed_s=packed_s, packed_t=packed_t,
                                 n_bits=n_bits)
    mask_s = jnp.ones(S, bool)
    mask_t = jnp.ones(C, bool)
    mesh = make_mesh(8)
    bbx = jnp.float32(52.0)

    def run(**kw):
        cfg = GHICPConfig(feature=FeatureType.BSC,
                          correspondence=CorrespondenceType.KM,
                          max_iterations=4, auction_max_rounds=8,
                          streaming_cost="on", **kw)
        return ghicp_register_ring(kp_s, mask_s, kp_t, mask_t, feats,
                                   packed_s, packed_t, bbx, cfg, mesh)

    full = run(stream_fast_path=True, stream_open_cap=0)
    compact = run(stream_fast_path=True, stream_open_cap=256)
    # Compaction is exact WITHIN a solve, but across engine iterations the
    # hint carry differs (kept rows keep the inflated bound instead of a
    # fresh observation), so keep tests may release different tie sets —
    # pose agreement at the tie-wobble level, correspondence counts equal.
    np.testing.assert_array_equal(np.asarray(compact.metrics.cor),
                                  np.asarray(full.metrics.cor))
    np.testing.assert_allclose(np.asarray(compact.transform),
                               np.asarray(full.transform), atol=5e-3)
    cor = np.asarray(compact.metrics.cor)
    it = max(int(compact.iterations) - 1, 0)
    assert cor[it] > C // 2, cor


@pytest.mark.parametrize("corres", [CorrespondenceType.NN,
                                    CorrespondenceType.NNR])
def test_streaming_nn_nnr_matches_dense(corres):
    """Matrix-free NN / reciprocal-NN (the KM-only restriction lifted,
    VERDICT r3 item 4; ghicp_reg.cpp:700-769, 605-698): the streaming lane
    with Ct=NN/NNR lands the dense matchers' registration."""
    src, tgt, T_gt = _pair(seed=11)
    kw = dict(_BASE)
    kw["correspondence"] = corres
    kw["max_iterations"] = 60
    dense = register_pair(src, tgt, GHICPConfig(
        feature=FeatureType.BSC, streaming_cost="off", **kw))
    stream = register_pair(src, tgt, GHICPConfig(
        feature=FeatureType.BSC, streaming_cost="on", **kw))
    rot_s, tr_s = transform_error(stream.transform, T_gt)
    assert rot_s < 2.0 and tr_s < 0.3, (corres, rot_s, tr_s)
    rot_ds, tr_ds = transform_error(stream.transform, dense.transform)
    assert rot_ds < 0.5 and tr_ds < 0.1, (corres, rot_ds, tr_ds)
    assert stream.success == dense.success


def test_stream_sweep_col_side_matches_dense_argmin():
    """col_side sweep outputs = dense per-column min/argmin (lowest row on
    ties), the reciprocal matcher's column reduction."""
    from ghicp_tpu.features.bsc import pack_bits
    from ghicp_tpu.ops.stream_kernel import (make_stream_features,
                                             stream_sweep_ref)

    rng = np.random.default_rng(5)
    S, C, n_bits = 192, 256, 441
    kp_s = jnp.asarray(rng.uniform(0, 10, (S, 3)).astype(np.float32))
    kp_t = jnp.asarray(rng.uniform(0, 10, (C, 3)).astype(np.float32))
    bits_s = (rng.random((2, S, n_bits)) < 0.3).astype(np.float32)
    bits_t = (rng.random((1, C, n_bits)) < 0.3).astype(np.float32)
    feats = make_stream_features(packed_s=pack_bits(jnp.asarray(bits_s)),
                                 packed_t=pack_bits(jnp.asarray(bits_t)),
                                 n_bits=n_bits)
    ms = jnp.asarray(rng.random(S) < 0.9)
    mt = jnp.asarray(rng.random(C) < 0.9)
    wed, wfd, scale = 0.4, 0.6, 0.21
    sw = stream_sweep_ref(kp_s, kp_t, feats, ms, mt,
                          jnp.zeros((C,)), jnp.full((S,), -1, jnp.int32),
                          wed, wfd, scale, tc=64, col_side=True)
    # dense reference
    ham = np.zeros((2, S, C), np.float32)
    for v in range(2):
        ham[v] = (bits_s[v].sum(1)[:, None] + bits_t[0].sum(1)[None, :]
                  - 2.0 * bits_s[v] @ bits_t[0].T)
    fd = ham.min(0)
    ed = scale * np.linalg.norm(np.asarray(kp_s)[:, None]
                                - np.asarray(kp_t)[None], axis=-1)
    cd = wed * ed + wfd * fd
    m = np.asarray(ms)[:, None] & np.asarray(mt)[None, :]
    cdm = np.where(m, cd, 3.0e38)
    cmin_ref = cdm.min(0)
    crow_ref = np.where(cmin_ref < 3.0e38, cdm.argmin(0), 2**30)
    np.testing.assert_allclose(np.asarray(sw.cmin), cmin_ref,
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(sw.crow), crow_ref)
