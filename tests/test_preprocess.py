"""Unit tests: eigh3, voxel downsampling, grid neighbors, PCA, keypoints.

Each kernel is checked against a brute-force numpy reference implementing the
same math as the C++ reference (SURVEY.md §4 test strategy).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ghicp_tpu.core.types import PointCloud
from ghicp_tpu.ops.eigh3 import eigh3
from ghicp_tpu.preprocess import (detect_keypoints, non_max_suppression,
                                  pca_features, radius_neighbors,
                                  voxel_downsample)
from ghicp_tpu.core.config import GHICPConfig


def test_eigh3_matches_numpy():
    rng = np.random.default_rng(0)
    M = rng.normal(size=(500, 3, 3)).astype(np.float32)
    A = M @ M.transpose(0, 2, 1)  # PSD
    vals, vecs = eigh3(jnp.asarray(A))
    vals = np.asarray(vals)
    vecs = np.asarray(vecs)
    ref = np.linalg.eigvalsh(A)[:, ::-1]  # descending
    np.testing.assert_allclose(vals, ref, rtol=2e-4, atol=2e-4)
    # Eigenvector property: A v = lambda v
    for k in range(3):
        Av = np.einsum("nij,nj->ni", A, vecs[:, :, k])
        lv = vals[:, k:k + 1] * vecs[:, :, k]
        np.testing.assert_allclose(Av, lv, atol=5e-3)
    # Orthonormality
    VtV = np.einsum("nij,nik->njk", vecs, vecs)
    np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), VtV.shape),
                               atol=1e-4)


def test_eigh3_degenerate():
    # Identity (all eigenvalues equal) and rank-1 matrices must not NaN.
    A = np.stack([np.eye(3), np.zeros((3, 3)),
                  np.outer([1., 2., 3.], [1., 2., 3.])]).astype(np.float32)
    vals, vecs = eigh3(jnp.asarray(A))
    assert np.all(np.isfinite(np.asarray(vals)))
    assert np.all(np.isfinite(np.asarray(vecs)))
    np.testing.assert_allclose(np.asarray(vals)[0], [1, 1, 1], atol=1e-5)


def test_voxel_downsample_one_per_voxel():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 10, size=(3000, 3)).astype(np.float32)
    cloud = PointCloud.from_points(pts)
    voxel = 0.5
    out = voxel_downsample(cloud, voxel)
    live = out.to_numpy()
    # Reference semantics: exactly one representative per occupied voxel.
    keys = set(map(tuple, np.floor((pts - pts.min(0)) / voxel).astype(int)))
    got = set(map(tuple, np.floor((live - pts.min(0)) / voxel).astype(int)))
    assert len(live) == len(keys)
    assert got == keys
    # Representatives are actual input points.
    assert all(tuple(p) in set(map(tuple, pts)) for p in live[:50])


def test_radius_neighbors_vs_bruteforce():
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 4, size=(800, 3)).astype(np.float32)
    cloud = PointCloud.from_points(pts, capacity=1024)
    r = 0.5
    nb = radius_neighbors(cloud, cloud, radius=r, k=64, cell_cap=32,
                          chunk=256)
    idx, valid = np.asarray(nb.idx), np.asarray(nb.valid)
    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    for i in rng.choice(800, 60, replace=False):
        truth = set(np.nonzero(d[i] <= r)[0])
        got = set(idx[i][valid[i]])
        if len(truth) <= 64:
            assert got == truth, f"point {i}: {got ^ truth}"
        else:
            assert got <= truth and len(got) == 64


def test_radius_neighbors_padding_masked():
    pts = np.array([[0, 0, 0], [0.1, 0, 0], [5, 5, 5]], np.float32)
    cloud = PointCloud.from_points(pts, capacity=256)
    nb = radius_neighbors(cloud, cloud, radius=1.0, k=8, chunk=64)
    valid = np.asarray(nb.valid)
    # Padded rows have no neighbors at all.
    assert not valid[3:].any()
    assert valid[:2].sum(axis=1).tolist() == [2, 2]
    assert valid[2].sum() == 1  # isolated point sees only itself


def _plane_with_spike(n=2000, seed=3):
    rng = np.random.default_rng(seed)
    pts = np.zeros((n, 3), np.float32)
    pts[:, :2] = rng.uniform(-5, 5, size=(n, 2))
    pts[:, 2] = rng.normal(scale=0.002, size=n)
    # A sharp corner feature at the origin: points on two meeting planes.
    m = 200
    edge = np.zeros((m, 3), np.float32)
    edge[:, 0] = rng.uniform(0, 1, m)
    edge[:, 2] = edge[:, 0] * 1.0  # 45-degree ramp -> curvature along the fold
    return np.concatenate([pts, edge])


def test_pca_plane_curvature_low():
    pts = _plane_with_spike()
    cloud = PointCloud.from_points(pts)
    feats = pca_features(cloud, radius=0.5, k=64)
    curv = np.asarray(feats.curvature)
    valid = np.asarray(feats.valid)
    n_flat = 2000
    flat_curv = curv[:n_flat][valid[:n_flat]]
    # Flat plane points: curvature ~ 0 (lambda3 << lambda1).
    assert np.median(flat_curv) < 0.01
    normals = np.asarray(feats.normal)[:n_flat]
    # Plane normal is +-z.
    assert np.median(np.abs(normals[valid[:n_flat], 2])) > 0.99


def test_nms_greedy_equivalence():
    rng = np.random.default_rng(4)
    n = 300
    pts = rng.uniform(0, 6, size=(n, 3)).astype(np.float32)
    curv = rng.uniform(0.1, 1.0, size=n).astype(np.float32)
    cloud = PointCloud.from_points(pts, capacity=512)
    curv_p = np.zeros(512, np.float32)
    curv_p[:n] = curv
    cand = np.zeros(512, bool)
    cand[:n] = True
    r = 0.8
    sel, rounds = non_max_suppression(
        cloud, jnp.asarray(curv_p), jnp.asarray(cand), radius=r, k=96,
        cell_cap=64, chunk=128)
    got = set(np.nonzero(np.asarray(sel))[0])
    # Serial greedy reference (keypoint_detect.hpp:149-191): sort by curvature
    # desc, pick, suppress within radius.
    order = np.argsort(-curv, kind="stable")
    alive = np.ones(n, bool)
    want = set()
    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    for i in order:
        if alive[i]:
            want.add(i)
            alive[d[i] <= r] = False
    assert got == want


def test_detect_keypoints_on_structured_scene():
    from ghicp_tpu.io.synthetic import structured_scene
    rng = np.random.default_rng(5)
    pts = structured_scene(rng, 20000, extent=10.0)
    cloud = PointCloud.from_points(pts)
    cfg = GHICPConfig(voxel_size=0.1, neighborhood_radius=0.5,
                      non_max_radius=1.0, min_neighbors=10)
    res = detect_keypoints(cloud, cfg)
    nkp = int(np.asarray(res.mask).sum())
    # Sanity: some keypoints exist and they are a sparse subset.
    assert 5 <= nkp <= 2000
    # NMS spacing: no two keypoints within the non-max radius.
    kp = np.asarray(cloud.xyz)[np.asarray(res.mask)]
    dd = np.linalg.norm(kp[:, None] - kp[None], axis=-1)
    np.fill_diagonal(dd, 1e9)
    assert dd.min() > 1.0


def test_pca_cell_table_matches_neighbor_list():
    """Cell-table moment PCA (the fast TPU path) must reproduce the exact
    neighbor-list PCA — including far-from-origin f32 stability."""
    from ghicp_tpu.preprocess.neighbors import radius_neighbors
    from ghicp_tpu.preprocess.pca import pca_features, pca_from_neighbors
    rng = np.random.default_rng(3)
    n = 3000
    xyz = rng.uniform(0, 8, (n, 3)).astype(np.float32) + 500.0
    mask = np.ones(n, bool)
    mask[-64:] = False
    pc = PointCloud(xyz=jnp.asarray(xyz), mask=jnp.asarray(mask))
    r = 0.8
    got = pca_features(pc, radius=r, cell_cap=64, chunk=512, max_cells=2048)
    nb = radius_neighbors(pc, pc, radius=r, k=128, cell_cap=64, chunk=512)
    want = pca_from_neighbors(pc, nb)
    v = mask
    assert np.array_equal(np.asarray(got.n_neighbors)[v],
                          np.asarray(nb.count)[v])
    np.testing.assert_allclose(np.asarray(got.eigvals)[v],
                               np.asarray(want.eigvals)[v], atol=2e-6)
    np.testing.assert_allclose(np.asarray(got.curvature)[v],
                               np.asarray(want.curvature)[v], atol=2e-6)
    assert np.array_equal(np.asarray(got.valid), np.asarray(want.valid))


def test_refine_positions_corner_snaps_to_vertex():
    """Plane-intersection refinement must localize a 3-plane corner at the
    true vertex regardless of where the curvature argmax landed, and must
    not move a keypoint on flat surface."""
    import jax.numpy as jnp
    from ghicp_tpu.core.types import PointCloud
    from ghicp_tpu.preprocess import pca_features
    from ghicp_tpu.preprocess.keypoints import refine_positions_corner

    rng = np.random.default_rng(21)
    # Three orthogonal quarter-planes meeting at the origin (a box corner),
    # sampled at production-like ~0.04 spacing (voxel-downsampled clouds
    # have bounded per-cell density; dense multi-surface cells would
    # saturate the neighbor-table caps instead).
    g = np.arange(0.0, 1.0, 0.04, dtype=np.float32)
    uu, vv = np.meshgrid(g, g)
    u = np.stack([uu.ravel(), vv.ravel()], 1)
    z = np.zeros(len(u), np.float32)
    planes = [
        np.stack([u[:, 0], u[:, 1], z], 1),   # z=0
        np.stack([u[:, 0], z, u[:, 1]], 1),   # y=0
        np.stack([z, u[:, 0], u[:, 1]], 1),   # x=0
    ]
    pts = np.concatenate(planes).astype(np.float32)
    pts += rng.normal(0, 0.002, pts.shape).astype(np.float32)
    cloud = PointCloud.from_points(pts, capacity=4096)
    feats = pca_features(cloud, radius=0.15, k=48, cell_cap=32)

    kp = jnp.asarray(np.float32([[0.12, 0.09, 0.0],     # off-vertex, on z=0
                                 [0.6, 0.55, 0.0]]))    # mid-face (flat)
    mask = jnp.asarray([True, True])
    out = np.asarray(refine_positions_corner(kp, mask, cloud, feats,
                                             radius=0.3, k=192,
                                             cell_cap=128))
    # Corner keypoint snaps to the vertex (origin).
    assert np.linalg.norm(out[0]) < 0.03, out[0]
    # Flat-surface keypoint stays within noise of where it was (the anchor
    # dominates the null directions; the normal direction projects to the
    # plane).
    assert np.linalg.norm(out[1] - np.asarray(kp[1])) < 0.05, out[1]


def test_pca_cell_pair_spill_matches_query_path():
    """Cell-pair PCA with a tiny cell cap (forcing resident overflow) must
    still produce features for EVERY valid point, identical to the per-query
    path — the spill fallback covers points absent from the cell table."""
    from ghicp_tpu.preprocess.pca import _pca_features_query, pca_features
    rng = np.random.default_rng(11)
    n = 2000
    xyz = rng.uniform(0, 4, (n, 3)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[-37:] = False
    pc = PointCloud(xyz=jnp.asarray(xyz), mask=jnp.asarray(mask))
    r = 0.9
    # cell_cap=8 at ~45 pts/cell: most points spill.
    got = pca_features(pc, radius=r, cell_cap=8, chunk=512, max_cells=512)
    want = _pca_features_query(pc, radius=r, cell_cap=8, chunk=512,
                               max_cells=512)
    v = mask
    assert np.array_equal(np.asarray(got.n_neighbors)[v],
                          np.asarray(want.n_neighbors)[v])
    np.testing.assert_allclose(np.asarray(got.eigvals)[v],
                               np.asarray(want.eigvals)[v], atol=3e-6)
    np.testing.assert_allclose(np.asarray(got.curvature)[v],
                               np.asarray(want.curvature)[v], atol=3e-6)
    assert np.array_equal(np.asarray(got.valid)[v], np.asarray(want.valid)[v])
