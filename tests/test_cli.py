"""CLI end-to-end test (the reference's 13-positional-arg interface)."""
import numpy as np

from ghicp_tpu.cli.main import main
from ghicp_tpu.io import read_cloud, write_cloud
from ghicp_tpu.io.synthetic import structured_scene


def test_cli_roundtrip(tmp_path, capsys):
    rng = np.random.default_rng(0)
    pts = structured_scene(rng, 6000, extent=8.0)
    theta = np.deg2rad(6.0)
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], np.float32)
    t = np.float32([0.6, -0.4, 0.1])
    src = ((pts - t) @ R + rng.normal(0, 0.01, pts.shape)).astype(np.float32)
    tgt = (pts + rng.normal(0, 0.01, pts.shape)).astype(np.float32)
    sp = str(tmp_path / "s.ply")
    tp = str(tmp_path / "t.ply")
    op = str(tmp_path / "out.ply")
    write_cloud(sp, src)
    write_cloud(tp, tgt)

    rc = main([tp, sp, op, "N", "R", "0.15", "0.5", "1.0", "1.1", "0.1",
               "6", "0.9", "1", "--max-iterations", "40", "--jax-cache", ""])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Registration Succeed" in out
    registered, _ = read_cloud(op)
    # Registered source should overlay the target (nearest-point check on a
    # subsample).
    from scipy.spatial import cKDTree
    d, _ = cKDTree(tgt).query(registered[::20])
    assert np.median(d) < 0.2
    # Viewer flag exported the aligned pair.
    assert (tmp_path / "out_pair_source.ply").exists()
    assert (tmp_path / "out_pair_target.ply").exists()
