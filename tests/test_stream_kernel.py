"""Parity tests for the matrix-free streaming cost sweep
(ops/stream_kernel.py) against the dense formulation it replaces."""
import numpy as np
import jax.numpy as jnp

from ghicp_tpu.features.bsc import pack_bits
from ghicp_tpu.features.fpfh import fpfh_similarity_matrix
from ghicp_tpu.features.hamming import min_hamming_fd
from ghicp_tpu.features.rops import rops_similarity_matrix
from ghicp_tpu.ops.stream_kernel import (make_stream_features,
                                         stream_selected, stream_sweep,
                                         stream_sweep_ref)

_NEG = -3.0e38


def _problem(S=256, C=384, V=2, n_bits=441, seed=0):
    rng = np.random.default_rng(seed)
    kp_s = rng.uniform(-10, 10, (S, 3)).astype(np.float32)
    kp_t = rng.uniform(-10, 10, (C, 3)).astype(np.float32)
    bits_s = (rng.random((V, S, n_bits)) < 0.3).astype(np.float32)
    bits_t = (rng.random((1, C, n_bits)) < 0.3).astype(np.float32)
    packed_s = pack_bits(jnp.asarray(bits_s))
    packed_t = pack_bits(jnp.asarray(bits_t))
    mask_s = jnp.asarray(rng.random(S) < 0.9)
    mask_t = jnp.asarray(rng.random(C) < 0.9)
    prices = jnp.asarray(rng.uniform(0, 3, C).astype(np.float32))
    acol = jnp.asarray(
        np.where(rng.random(S) < 0.7, rng.integers(0, C, S), -1)
        .astype(np.int32))
    return (kp_s, kp_t, packed_s, packed_t, mask_s, mask_t, prices, acol,
            n_bits)


def _dense_oracle(kp_s, kp_t, fd, mask_s, mask_t, prices, acol, wed, wfd,
                  scale, mult=False):
    ed = scale * np.linalg.norm(kp_s[:, None] - kp_t[None], axis=-1)
    if mult:
        cd = ed / np.maximum(fd, 1e-6) ** wfd
    else:
        cd = wed * ed + wfd * fd
    m = np.asarray(mask_s)[:, None] & np.asarray(mask_t)[None, :]
    v = np.where(m, -cd - np.asarray(prices)[None, :], _NEG)
    j1 = np.argmax(v, axis=1)
    v1 = v[np.arange(len(v)), j1]
    v_masked = v.copy()
    v_masked[np.arange(len(v)), j1] = _NEG
    v2 = v_masked.max(axis=1)
    j2 = np.argmax(v_masked, axis=1)
    ac = np.asarray(acol)
    ok = (ac >= 0) & (ac < v.shape[1])
    vsel = np.where(ok, v[np.arange(len(v)), np.where(ok, ac, 0)], _NEG)
    cdm = np.where(m, cd, 0.0)
    stats = (m.sum(), cdm.sum(), (cdm * cd).sum(), cdm.max(),
             np.where(m, ed, 0.0).max(), np.where(m, -cd, _NEG).max())
    return v1, j1, v2, j2, vsel, stats


def test_stream_sweep_ref_matches_dense_bsc():
    (kp_s, kp_t, packed_s, packed_t, mask_s, mask_t, prices, acol,
     n_bits) = _problem()
    feats = make_stream_features(packed_s=packed_s, packed_t=packed_t,
                                 n_bits=n_bits)
    fd = np.asarray(min_hamming_fd(packed_s, packed_t[:1], n_bits))
    wed, wfd, scale = 0.4, 0.6, 0.12
    res = stream_sweep_ref(jnp.asarray(kp_s), jnp.asarray(kp_t), feats,
                           mask_s, mask_t, prices, acol, wed, wfd, scale,
                           tc=128)
    v1, j1, v2, j2, vsel, stats = _dense_oracle(
        kp_s, kp_t, fd, mask_s, mask_t, prices, acol, wed, wfd, scale)
    np.testing.assert_allclose(np.asarray(res.v1), v1, rtol=2e-5, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(res.j1), j1)
    np.testing.assert_allclose(np.asarray(res.v2), v2, rtol=2e-5, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(res.j2), j2)
    np.testing.assert_allclose(np.asarray(res.vsel), vsel, rtol=2e-5,
                               atol=2e-4)
    got = (float(res.cnt), float(res.cd_sum), float(res.cd_sumsq),
           float(res.cd_max), float(res.ed_max), float(res.b_max))
    for g, e in zip(got, stats):
        np.testing.assert_allclose(g, e, rtol=1e-4)


def test_stream_sweep_pallas_interpret_matches_ref():
    (kp_s, kp_t, packed_s, packed_t, mask_s, mask_t, prices, acol,
     n_bits) = _problem(S=256, C=256, V=2)
    feats = make_stream_features(packed_s=packed_s, packed_t=packed_t,
                                 n_bits=n_bits)
    wed, wfd, scale = 0.7, 0.3, 0.08
    ref = stream_sweep_ref(jnp.asarray(kp_s), jnp.asarray(kp_t), feats,
                           mask_s, mask_t, prices, acol, wed, wfd, scale,
                           tc=128)
    got = stream_sweep(jnp.asarray(kp_s), jnp.asarray(kp_t), feats,
                       mask_s, mask_t, prices, acol, wed, wfd, scale,
                       ts=128, tc=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got.v1), np.asarray(ref.v1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.j1), np.asarray(ref.j1))
    np.testing.assert_allclose(np.asarray(got.v2), np.asarray(ref.v2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.j2), np.asarray(ref.j2))
    np.testing.assert_allclose(np.asarray(got.vsel), np.asarray(ref.vsel),
                               rtol=1e-5, atol=1e-5)
    for name in ("cnt", "cd_sum", "cd_sumsq", "cd_max", "ed_max", "b_max"):
        np.testing.assert_allclose(float(getattr(got, name)),
                                   float(getattr(ref, name)), rtol=1e-5)


def test_stream_features_similarity_matches_fpfh():
    rng = np.random.default_rng(3)
    ds = jnp.asarray(rng.uniform(0, 5, (64, 33)).astype(np.float32))
    dt = jnp.asarray(rng.uniform(0, 5, (96, 33)).astype(np.float32))
    feats = make_stream_features(desc_s=ds, desc_t=dt)
    sim_stream = np.abs(np.asarray(feats.fs[0], np.float32)
                        @ np.asarray(feats.ft, np.float32).T)
    sim_dense = np.asarray(fpfh_similarity_matrix(ds, dt))
    # bf16 factor rows: ~2^-8 relative agreement is the contract.
    np.testing.assert_allclose(sim_stream, sim_dense, atol=2e-2)


def test_stream_features_similarity_matches_rops():
    rng = np.random.default_rng(4)
    ds = jnp.asarray((rng.uniform(0, 1, (48, 135))
                      * rng.uniform(0, 3, 135)).astype(np.float32))
    dt = jnp.asarray((rng.uniform(0, 1, (80, 135))
                      * rng.uniform(0, 3, 135)).astype(np.float32))
    feats = make_stream_features(desc_s=ds, desc_t=dt, standardize="dims")
    sim_stream = np.abs(np.asarray(feats.fs[0], np.float32)
                        @ np.asarray(feats.ft, np.float32).T)
    sim_dense = np.asarray(rops_similarity_matrix(ds, dt))
    np.testing.assert_allclose(sim_stream, sim_dense, atol=2e-2)


def test_stream_selected_matches_dense_gather():
    (kp_s, kp_t, packed_s, packed_t, mask_s, mask_t, prices, acol,
     n_bits) = _problem(seed=5)
    feats = make_stream_features(packed_s=packed_s, packed_t=packed_t,
                                 n_bits=n_bits)
    fd = np.asarray(min_hamming_fd(packed_s, packed_t[:1], n_bits))
    rng = np.random.default_rng(6)
    tgt_idx = jnp.asarray(rng.integers(0, kp_t.shape[0],
                                       kp_s.shape[0]).astype(np.int32))
    wed, wfd, scale = 0.55, 0.45, 0.1
    cd_sel, ed_sel, fd_sel = stream_selected(
        jnp.asarray(kp_s), jnp.asarray(kp_t), feats, tgt_idx,
        wed, wfd, scale)
    rows = np.arange(kp_s.shape[0])
    tj = np.asarray(tgt_idx)
    fd_e = fd[rows, tj]
    ed_e = scale * np.linalg.norm(kp_s - kp_t[tj], axis=-1)
    np.testing.assert_allclose(np.asarray(fd_sel), fd_e, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ed_sel), ed_e, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(cd_sel),
                               wed * ed_e + wfd * fd_e, rtol=1e-4,
                               atol=1e-3)


def test_stream_sweep_ref_mult_lane():
    rng = np.random.default_rng(7)
    S, C = 128, 256
    kp_s = rng.uniform(-8, 8, (S, 3)).astype(np.float32)
    kp_t = rng.uniform(-8, 8, (C, 3)).astype(np.float32)
    ds = jnp.asarray(rng.uniform(0, 5, (S, 33)).astype(np.float32))
    dt = jnp.asarray(rng.uniform(0, 5, (C, 33)).astype(np.float32))
    feats = make_stream_features(desc_s=ds, desc_t=dt)
    sim = np.abs(np.asarray(feats.fs[0], np.float32)
                 @ np.asarray(feats.ft, np.float32).T)
    mask_s = jnp.ones(S, bool)
    mask_t = jnp.ones(C, bool)
    prices = jnp.zeros(C, jnp.float32)
    acol = jnp.full((S,), -1, jnp.int32)
    k, scale = 0.5, 0.1
    res = stream_sweep_ref(jnp.asarray(kp_s), jnp.asarray(kp_t), feats,
                           mask_s, mask_t, prices, acol, 1.0, k, scale,
                           tc=128, mult_blend=True)
    v1, j1, v2, j2, vsel, stats = _dense_oracle(
        kp_s, kp_t, sim, mask_s, mask_t, prices, acol, 1.0, k, scale,
        mult=True)
    np.testing.assert_allclose(np.asarray(res.v1), v1, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(res.j1), j1)


def test_stream_sweep_kernel_col_side_matches_ref():
    """The Pallas sweep kernel's scratch-accumulated column min/argmin
    (interpret mode) matches the scan reference, including tie-breaks."""
    import jax.numpy as jnp

    from ghicp_tpu.features.bsc import pack_bits
    from ghicp_tpu.ops.stream_kernel import (make_stream_features,
                                             stream_sweep, stream_sweep_ref)

    rng = np.random.default_rng(9)
    S, C, n_bits = 512, 1024, 441
    kp_s = jnp.asarray(rng.uniform(0, 10, (S, 3)).astype(np.float32))
    kp_t = jnp.asarray(rng.uniform(0, 10, (C, 3)).astype(np.float32))
    bits_s = (rng.random((2, S, n_bits)) < 0.3).astype(np.float32)
    bits_t = (rng.random((1, C, n_bits)) < 0.3).astype(np.float32)
    feats = make_stream_features(packed_s=pack_bits(jnp.asarray(bits_s)),
                                 packed_t=pack_bits(jnp.asarray(bits_t)),
                                 n_bits=n_bits)
    ms = jnp.asarray(rng.random(S) < 0.9)
    mt = jnp.asarray(rng.random(C) < 0.9)
    p = jnp.zeros((C,))
    ac = jnp.full((S,), -1, jnp.int32)
    args = (kp_s, kp_t, feats, ms, mt, p, ac, 0.4, 0.6, 0.21)
    got = stream_sweep(*args, ts=256, tc=512, interpret=True, col_side=True)
    want = stream_sweep_ref(*args, tc=512, col_side=True)
    np.testing.assert_allclose(np.asarray(got.cmin), np.asarray(want.cmin),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got.crow),
                                  np.asarray(want.crow))
    np.testing.assert_allclose(np.asarray(got.v1), np.asarray(want.v1),
                               rtol=1e-5, atol=1e-4)
