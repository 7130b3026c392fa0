"""Round-trip tests for all cloud file formats (dataio.hpp parity)."""
import os

import numpy as np
import pytest

from ghicp_tpu.io import (read_cloud, write_cloud)
from ghicp_tpu.io.files import (load_global_shift, read_las, read_pcd,
                                read_ply, write_las, write_pcd, write_ply)


@pytest.fixture
def pts():
    rng = np.random.default_rng(0)
    return rng.uniform(-50, 50, (500, 3)).astype(np.float32)


@pytest.mark.parametrize("ext", [".pcd", ".ply", ".txt", ".las"])
def test_roundtrip(tmp_path, pts, ext):
    p = str(tmp_path / f"cloud{ext}")
    write_cloud(p, pts)
    out, shift = read_cloud(p)
    atol = 2e-3 if ext == ".las" else 1e-4
    np.testing.assert_allclose(out, pts, atol=atol)


def test_pcd_ascii(tmp_path, pts):
    p = str(tmp_path / "a.pcd")
    write_pcd(p, pts, binary=False)
    np.testing.assert_allclose(read_pcd(p), pts, atol=1e-4)


def test_pcd_binary_compressed(tmp_path, pts):
    """LZF binary_compressed PCD round trip (PCL pcd_io transparency,
    reference read path dataio.hpp:121-162)."""
    p = str(tmp_path / "c.pcd")
    write_pcd(p, pts, compressed=True)
    np.testing.assert_allclose(read_pcd(p), pts, atol=1e-6)
    # The compressed file must actually be smaller on repetitive data.
    rep = np.tile(pts[:8], (64, 1)).astype(np.float32)
    pr = str(tmp_path / "rep.pcd")
    pb = str(tmp_path / "repb.pcd")
    write_pcd(pr, rep, compressed=True)
    write_pcd(pb, rep, binary=True)
    assert os.path.getsize(pr) < os.path.getsize(pb) / 2
    np.testing.assert_allclose(read_pcd(pr), rep, atol=1e-6)


def test_lzf_codec_edge_cases():
    """The LZF pair handles long matches, overlapping copies (RLE), and
    incompressible streams."""
    from ghicp_tpu.io.files import _lzf_compress, _lzf_decompress
    cases = [
        b"",
        b"a",
        b"a" * 1000,                        # overlapping back reference
        bytes(range(256)) * 8,              # long matches
        np.random.default_rng(3).integers(0, 256, 5000,
                                          dtype=np.uint8).tobytes(),
        b"abcabcabcabc" + b"x" * 40 + b"abcabcabc",
    ]
    for raw in cases:
        comp = _lzf_compress(raw)
        assert _lzf_decompress(comp, len(raw)) == raw


def test_ply_ascii(tmp_path, pts):
    p = str(tmp_path / "a.ply")
    write_ply(p, pts, binary=False)
    np.testing.assert_allclose(read_ply(p), pts, atol=1e-4)


def test_las_global_shift(tmp_path):
    """UTM-scale LAS clouds are re-centered with a persisted shared shift
    (dataio.hpp:268-361)."""
    rng = np.random.default_rng(1)
    utm = rng.uniform(0, 100, (300, 3)) + np.array([500000.0, 4000000.0, 300.0])
    p1 = str(tmp_path / "s1.las")
    p2 = str(tmp_path / "s2.las")
    write_las(p1, utm)
    write_las(p2, utm + 25.0)
    a, shift_a = read_cloud(p1)
    b, shift_b = read_cloud(p2)
    # Both clouds share the same persisted shift.
    np.testing.assert_allclose(shift_a, shift_b)
    assert load_global_shift(str(tmp_path)) is not None
    # Recentered values are small.
    assert np.abs(a).max() < 1e4
    # Relative geometry preserved.
    np.testing.assert_allclose(b.mean(0) - a.mean(0), [25.0] * 3, atol=1e-2)
    # Writing back undoes the shift.
    p3 = str(tmp_path / "out.las")
    write_cloud(p3, a, global_shift=shift_a)
    back = read_las(p3)
    np.testing.assert_allclose(back, utm, atol=5e-3)
