"""Tests for BSC encoding, Hamming kernels, FPFH histograms."""
import jax.numpy as jnp
import numpy as np

from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                   GHICPConfig)
from ghicp_tpu.core.types import PointCloud
from ghicp_tpu.features import (extract_bsc, fpfh_features,
                                fpfh_similarity_matrix, hamming_matrix_mxu,
                                hamming_matrix_popcount, min_hamming_fd,
                                pack_bits, sample_pattern, unpack_bits,
                                variant_permutations)


def test_sample_pattern_valid():
    p = sample_pattern(20170417, 7)
    assert p.shape == (49, 2)
    assert (p[:, 0] != p[:, 1]).all()
    unordered = {frozenset(t) for t in map(tuple, p)}
    assert len(unordered) == 49  # no duplicate unordered pairs
    # Deterministic
    assert (p == sample_pattern(20170417, 7)).all()


def test_variant_permutations_are_permutations():
    perms = variant_permutations(7, 4)
    assert perms.shape == (4, 3, 49)
    for v in range(4):
        for pl in range(3):
            assert sorted(perms[v, pl]) == list(range(49))
    # Variants differ from identity
    for v in range(1, 4):
        assert not (perms[v] == perms[0]).all()


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=(5, 441)).astype(np.float32)
    packed = pack_bits(jnp.asarray(bits))
    assert packed.shape == (5, 14)
    out = np.asarray(unpack_bits(packed, 441))
    assert (out == bits).all()


def test_hamming_paths_agree():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 2, size=(33, 441)).astype(np.float32)
    b = rng.integers(0, 2, size=(57, 441)).astype(np.float32)
    ap, bp = pack_bits(jnp.asarray(a)), pack_bits(jnp.asarray(b))
    h_pop = np.asarray(hamming_matrix_popcount(ap, bp, block=16))
    h_mxu = np.asarray(hamming_matrix_mxu(ap, bp, 441))
    ref = (a[:, None, :] != b[None, :, :]).sum(-1)
    assert (h_pop == ref).all()
    np.testing.assert_allclose(h_mxu, ref, atol=0.1)


def test_min_hamming_fd_variants():
    rng = np.random.default_rng(2)
    src = rng.integers(0, 2, size=(4, 10, 441)).astype(np.float32)
    tgt = rng.integers(0, 2, size=(1, 8, 441)).astype(np.float32)
    sp = pack_bits(jnp.asarray(src))
    tp = pack_bits(jnp.asarray(tgt))
    fd = np.asarray(min_hamming_fd(sp, tp, 441))
    ref = (src[:, :, None, :] != tgt[0][None, None, :, :]).sum(-1).min(0)
    np.testing.assert_allclose(fd, ref, atol=0.1)


def _sphere_cap_scene(rng, n=3000):
    """Points on a hemisphere + plane: structured, full-rank neighborhoods."""
    u = rng.uniform(0, 1, n)
    th = rng.uniform(0, 2 * np.pi, n)
    z = u
    r = np.sqrt(np.maximum(1 - z**2, 0))
    sphere = np.stack([r * np.cos(th), r * np.sin(th), z], 1) * 2.0
    plane = np.zeros((n // 2, 3))
    plane[:, :2] = rng.uniform(-3, 3, (n // 2, 2))
    return np.concatenate([sphere, plane]).astype(np.float32)


def test_bsc_rotation_invariance_via_variants():
    """Under a rigid motion, corresponding curvature keypoints must be much
    closer in min-variant Hamming distance than non-corresponding ones (the
    point of the LCS + flipped variants design, bfe.hpp:121-155, 762-837).

    Keypoints with degenerate weighted-PCA neighborhoods have an unstable
    second LCS axis in *any* implementation (the reference included), so the
    gate is a discriminative margin + hit rate, not exactness; end-to-end
    registration RMSE is the real quality gate (SURVEY.md §7 hard part 4).
    """
    from ghicp_tpu.io.synthetic import structured_scene
    from ghicp_tpu.preprocess import detect_keypoints
    rng = np.random.default_rng(3)
    pts = structured_scene(rng, 15000, extent=8.0)
    cfg = GHICPConfig(non_max_radius=1.0, neighborhood_radius=0.5,
                      min_neighbors=10, bsc_neighbor_k=192)
    cloud_a = PointCloud.from_points(pts)
    res = detect_keypoints(cloud_a, cfg)
    kp_all = np.nonzero(np.asarray(res.mask))[0]
    kp = jnp.asarray(kp_all[:48].astype(np.int32))
    kmask = jnp.ones(len(kp), bool)

    theta = np.deg2rad(37.0)
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0],
                  [0, 0, 1]], np.float32)
    pts_rot = pts @ R.T + np.array([5.0, -2.0, 0.5], np.float32)
    cloud_b = PointCloud.from_points(pts_rot)

    fa = extract_bsc(cloud_a, kp, kmask, cfg, num_variants=4)
    fb = extract_bsc(cloud_b, kp, kmask, cfg, num_variants=1)
    fd = np.asarray(min_hamming_fd(fa.packed, fb.packed, fa.n_bits))
    diag = np.diag(fd)
    off = fd[~np.eye(len(kp), dtype=bool)]
    assert diag.mean() < 0.7 * off.mean(), (diag.mean(), off.mean())
    hits = (fd.argmin(axis=1) == np.arange(len(kp))).mean()
    assert hits >= 0.25, hits


def test_bsc_identity_self_distance_zero():
    rng = np.random.default_rng(4)
    pts = _sphere_cap_scene(rng, 2000)
    cfg = GHICPConfig(non_max_radius=0.8)
    cloud = PointCloud.from_points(pts)
    kp = jnp.asarray(np.arange(8, dtype=np.int32) * 100)
    kmask = jnp.ones(8, bool)
    fa = extract_bsc(cloud, kp, kmask, cfg, num_variants=4)
    fb = extract_bsc(cloud, kp, kmask, cfg, num_variants=1)
    fd = np.asarray(min_hamming_fd(fa.packed, fb.packed, fa.n_bits))
    assert (np.diag(fd) == 0).all()


def test_fpfh_correlation_properties():
    rng = np.random.default_rng(5)
    pts = _sphere_cap_scene(rng, 2500)
    cloud = PointCloud.from_points(pts)
    fpfh, valid = fpfh_features(cloud, radius=0.5, k=24)
    f = np.asarray(fpfh)
    v = np.asarray(valid)[:len(pts)]
    live = f[:len(pts)][v]
    # Histograms: 3 blocks summing to ~100 each.
    sums = live.reshape(-1, 3, 11).sum(-1)
    np.testing.assert_allclose(sums, 100.0, atol=0.5)
    # Self-similarity = 1.
    sim = np.asarray(fpfh_similarity_matrix(jnp.asarray(live[:20]),
                                            jnp.asarray(live[:20])))
    np.testing.assert_allclose(np.diag(sim), 1.0, atol=1e-4)
    assert (sim <= 1.0 + 1e-5).all() and (sim >= 0).all()


def test_fpfh_invariance_under_rigid_motion():
    rng = np.random.default_rng(6)
    pts = _sphere_cap_scene(rng, 2500)
    theta = np.deg2rad(25)
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], np.float32)
    pts2 = pts @ R.T + np.float32([1, 2, 3])
    f1, v1 = fpfh_features(PointCloud.from_points(pts), radius=0.5, k=24)
    f2, v2 = fpfh_features(PointCloud.from_points(pts2), radius=0.5, k=24)
    a, b = np.asarray(f1)[:len(pts)], np.asarray(f2)[:len(pts)]
    ok = np.asarray(v1)[:len(pts)] & np.asarray(v2)[:len(pts)]
    sim = np.asarray(fpfh_similarity_matrix(jnp.asarray(a[ok][:200]),
                                            jnp.asarray(b[ok][:200])))
    # Corresponding points highly similar.
    assert np.median(np.diag(sim)) > 0.9


def test_rops_invariance_and_discrimination():
    """RoPS descriptors (features/rops.py — beyond reference parity; the
    reference's RoPS is enum-only, ghicp_main.cpp:130-134) must be stable
    under rigid motion and discriminative across keypoints."""
    from ghicp_tpu.features import rops_features, rops_similarity_matrix
    from ghicp_tpu.io.synthetic import structured_scene
    from ghicp_tpu.preprocess import detect_keypoints
    rng = np.random.default_rng(11)
    pts = structured_scene(rng, 15000, extent=8.0)
    cfg = GHICPConfig(non_max_radius=1.0, neighborhood_radius=0.5,
                      min_neighbors=10)
    cloud_a = PointCloud.from_points(pts)
    res = detect_keypoints(cloud_a, cfg)
    kp = jnp.asarray(np.nonzero(np.asarray(res.mask))[0][:48].astype(np.int32))
    kmask = jnp.ones(len(kp), bool)

    theta = np.deg2rad(33.0)
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], np.float32)
    pts_b = pts @ R.T + np.float32([4.0, -1.0, 0.7])
    cloud_b = PointCloud.from_points(pts_b)

    fa = rops_features(cloud_a, kp, kmask, radius=1.0, neighbor_k=192)
    fb = rops_features(cloud_b, kp, kmask, radius=1.0, neighbor_k=192)
    assert fa.desc.shape == (len(kp), 3 * 3 * 3 * 5)
    sim = np.asarray(rops_similarity_matrix(fa.desc, fb.desc))
    diag = np.diag(sim)
    off = sim[~np.eye(len(kp), dtype=bool)]
    # Corresponding keypoints decidedly more similar than impostors.
    assert np.median(diag) > 0.95, np.median(diag)
    assert diag.mean() > off.mean() + 0.1, (diag.mean(), off.mean())
    hits = (sim.argmax(axis=1) == np.arange(len(kp))).mean()
    assert hits >= 0.5, hits


def test_rops_registration_end_to_end():
    """GH-ICP with the RoPS feature (KM matching, FPFH-style multiplicative
    blend lane) recovers a known rigid transform."""
    from ghicp_tpu.io.synthetic import structured_scene
    from ghicp_tpu.registration import register_pair, transform_error
    rng = np.random.default_rng(12)
    pts = structured_scene(rng, 8000, extent=8.0)
    theta = np.deg2rad(10.0)
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], np.float32)
    t = np.float32([0.6, -0.4, 0.1])
    T_gt = np.eye(4, dtype=np.float32); T_gt[:3, :3] = R; T_gt[:3, 3] = t
    src = ((pts - t) @ R + rng.normal(0, 0.01, pts.shape)).astype(np.float32)
    tgt = (pts + rng.normal(0, 0.01, pts.shape)).astype(np.float32)
    cfg = GHICPConfig(feature=FeatureType.ROPS,
                      correspondence=CorrespondenceType.KM,
                      voxel_size=0.15, neighborhood_radius=0.5,
                      non_max_radius=1.0, min_neighbors=8,
                      estimated_overlap=0.9, max_iterations=30)
    out = register_pair(src, tgt, cfg)
    rot, tr = transform_error(out.transform, T_gt)
    assert rot < 1.5 and tr < 0.3, (rot, tr)
