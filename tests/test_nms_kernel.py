"""Whole-fixed-point NMS Pallas kernel: parity vs the jnp brute-force
reference and vs the serial greedy algorithm it reproduces."""
import numpy as np
import jax.numpy as jnp

from ghicp_tpu.ops.nms_kernel import nms_bruteforce_ref, nms_pallas


def _greedy(pts, curv, cand, radius):
    """Serial greedy-by-curvature NMS (keypoint_detect.hpp:149-191)."""
    n = len(curv)
    order = np.argsort(-curv, kind="stable")
    alive = cand.copy()
    want = np.zeros(n, bool)
    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    for i in order:
        if alive[i]:
            want[i] = True
            alive[d[i] <= radius] = False
    return want


def test_kernel_matches_ref_and_greedy():
    rng = np.random.default_rng(11)
    n = 512
    pts = rng.uniform(0, 6, (n, 3)).astype(np.float32)
    curv = rng.uniform(0.05, 1.0, n).astype(np.float32)
    cand = rng.random(n) < 0.8
    cand[500:] = False          # padding tail
    r = 0.8
    sel, rounds = nms_pallas(jnp.asarray(pts), jnp.asarray(curv),
                             jnp.asarray(cand), r, ts=256, interpret=True)
    rsel, rrounds = nms_bruteforce_ref(jnp.asarray(pts), jnp.asarray(curv),
                                       jnp.asarray(cand), r)
    assert np.array_equal(np.asarray(sel), np.asarray(rsel))
    assert int(rounds) == int(rrounds)
    want = _greedy(pts, curv, cand, r)
    assert np.array_equal(np.asarray(sel), want)


def test_kernel_curvature_ties_break_by_index():
    """Exactly tied curvatures must resolve to the lower index, matching
    the reference's stable sort order."""
    rng = np.random.default_rng(12)
    n = 256
    pts = rng.uniform(0, 3, (n, 3)).astype(np.float32)
    curv = rng.choice(np.float32([0.25, 0.5, 0.75]), n)  # heavy ties
    cand = np.ones(n, bool)
    r = 0.9
    sel, _ = nms_pallas(jnp.asarray(pts), jnp.asarray(curv),
                        jnp.asarray(cand), r, ts=256, interpret=True)
    want = _greedy(pts, curv, cand, r)
    assert np.array_equal(np.asarray(sel), want)


def test_kernel_multi_tile():
    """Cross-tile suppression: tiles must see each other's alive/wins."""
    rng = np.random.default_rng(13)
    n = 1024
    pts = rng.uniform(0, 8, (n, 3)).astype(np.float32)
    curv = rng.uniform(0.0, 1.0, n).astype(np.float32)
    cand = rng.random(n) < 0.9
    r = 1.1
    sel, rounds = nms_pallas(jnp.asarray(pts), jnp.asarray(curv),
                             jnp.asarray(cand), r, ts=256, interpret=True)
    want = _greedy(pts, curv, cand, r)
    assert np.array_equal(np.asarray(sel), want)
    assert int(rounds) >= 1


def test_kernel_no_candidates():
    pts = np.zeros((256, 3), np.float32)
    curv = np.zeros(256, np.float32)
    cand = np.zeros(256, bool)
    sel, rounds = nms_pallas(jnp.asarray(pts), jnp.asarray(curv),
                             jnp.asarray(cand), 1.0, ts=256, interpret=True)
    assert not np.asarray(sel).any()
    assert int(rounds) == 0


def test_kernel_far_from_origin():
    """Centering keeps the norm-expansion distances accurate for clouds far
    from the origin (TLS clouds often carry ~1e2-1e3 m offsets)."""
    rng = np.random.default_rng(14)
    n = 512
    pts = (rng.uniform(0, 6, (n, 3)) + np.float32([500., -300., 80.])
           ).astype(np.float32)
    curv = rng.uniform(0.05, 1.0, n).astype(np.float32)
    cand = np.ones(n, bool)
    r = 0.8
    sel, _ = nms_pallas(jnp.asarray(pts), jnp.asarray(curv),
                        jnp.asarray(cand), r, ts=256, interpret=True)
    want = _greedy(pts, curv, cand, r)
    assert np.array_equal(np.asarray(sel), want)


def test_dispatch_path_matches_gather_nms():
    """All three NMS dispatch paths (exact brute, gather, Pallas kernel in
    interpret mode) must agree when the gather K cap does not bind."""
    import ghicp_tpu.preprocess.keypoints as kp
    from ghicp_tpu.core.types import PointCloud
    rng = np.random.default_rng(15)
    n = 300
    pts = rng.uniform(0, 6, (n, 3)).astype(np.float32)
    curv = rng.uniform(0.1, 1.0, n).astype(np.float32)
    cloud = PointCloud.from_points(pts, capacity=512)
    curv_p = np.zeros(512, np.float32)
    curv_p[:n] = curv
    cand = np.zeros(512, bool)
    cand[:n] = True
    brute_sel, _ = kp.non_max_suppression(
        cloud, jnp.asarray(curv_p), jnp.asarray(cand), radius=0.8)
    kp._NMS_BRUTE_MAX_N = 0      # force the gather path
    try:
        gather_sel, _ = kp.non_max_suppression(
            cloud, jnp.asarray(curv_p), jnp.asarray(cand), radius=0.8,
            k=96, cell_cap=64, chunk=128)
    finally:
        kp._NMS_BRUTE_MAX_N = 8192
    assert np.array_equal(np.asarray(gather_sel), np.asarray(brute_sel))
    kp._NMS_KERNEL_INTERPRET = True
    kp._NMS_BRUTE_MAX_N = 0      # force the Pallas kernel (interpret)
    try:
        kern_sel, _ = kp.non_max_suppression(
            cloud, jnp.asarray(curv_p), jnp.asarray(cand), radius=0.8)
    finally:
        kp._NMS_KERNEL_INTERPRET = False
        kp._NMS_BRUTE_MAX_N = 8192
    assert np.array_equal(np.asarray(brute_sel), np.asarray(kern_sel))
