"""Native runtime tests: build, parity with numpy fallbacks, speed sanity."""
import numpy as np
import pytest

from ghicp_tpu import native


def test_native_builds():
    assert native.available(), "libghicp_native.so failed to build"


def test_voxel_mark_one_per_voxel():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 10, (20000, 3)).astype(np.float32)
    keep = native.voxel_mark(pts, 0.5)
    kept = pts[keep]
    mn = pts.min(0)
    keys = set(map(tuple, np.floor((pts - mn) / 0.5).astype(int)))
    got = set(map(tuple, np.floor((kept - mn) / 0.5).astype(int)))
    # Hash-map dedup: one representative per voxel (collisions ~2^-40).
    assert got == keys
    assert len(kept) == len(keys)


def test_las_decode_parity():
    rng = np.random.default_rng(1)
    n, rl = 5000, 20
    raw = rng.integers(0, 256, n * rl, dtype=np.uint8)
    scale = np.array([0.001, 0.001, 0.001])
    offset = np.array([100.0, 200.0, 300.0])
    out = native.las_decode(raw, n, rl, scale, offset)
    rec = raw.reshape(n, rl)
    xyz_i = rec[:, :12].copy().view("<i4").reshape(n, 3)
    ref = xyz_i.astype(np.float64) * scale + offset
    np.testing.assert_allclose(out, ref)


def test_transform_points_parity():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(1000, 3)).astype(np.float32)
    theta = 0.3
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = [[np.cos(theta), -np.sin(theta), 0],
                 [np.sin(theta), np.cos(theta), 0], [0, 0, 1]]
    T[:3, 3] = [1, 2, 3]
    out = native.transform_points(pts, T)
    ref = pts @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_txt_parse_native_matches_loadtxt(tmp_path):
    from ghicp_tpu import native
    from ghicp_tpu.io.files import read_txt, write_txt
    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    pts = rng.normal(0, 50, (5000, 3)).astype(np.float32)
    p = tmp_path / "cloud.txt"
    # extras column + comment/blank lines exercise the skip logic
    with open(p, "w") as f:
        f.write("# comment line\n\n")
        for q in pts:
            f.write(f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} 42\n")
    got = read_txt(str(p))
    want = np.loadtxt(p, dtype=np.float64, ndmin=2)[:, :3].astype(np.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)
    # round-trip through write_txt
    p2 = tmp_path / "rt.txt"
    write_txt(str(p2), got)
    back = read_txt(str(p2))
    np.testing.assert_allclose(back, got, atol=1e-5)


def test_txt_parse_large_speed():
    """The parallel parser must handle a million-line buffer correctly."""
    from ghicp_tpu import native
    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(4)
    pts = rng.normal(0, 100, (300_000, 3))
    lines = "\n".join(f"{a:.4f} {b:.4f} {c:.4f}" for a, b, c in pts)
    got = native.txt_parse(lines.encode())
    assert got is not None and got.shape == (len(pts), 3)
    np.testing.assert_allclose(got, pts, atol=1e-4)
