"""Tests for the ground-truth evaluation harness."""
import numpy as np

from ghicp_tpu.registration.evaluate import (correspondence_pr, gt_matches,
                                             registration_report)


def test_gt_matches_and_pr():
    rng = np.random.default_rng(0)
    kp_t = rng.uniform(0, 10, (50, 3)).astype(np.float32)
    theta = np.deg2rad(5.0)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = [[np.cos(theta), -np.sin(theta), 0],
                 [np.sin(theta), np.cos(theta), 0], [0, 0, 1]]
    T[:3, 3] = [0.5, -0.2, 0.1]
    # Sources = inverse-transformed targets (perfect correspondences).
    kp_s = ((kp_t - T[:3, 3]) @ T[:3, :3]).astype(np.float32)
    gt = gt_matches(kp_s, kp_t, T, max_dist=0.05)
    np.testing.assert_array_equal(gt, np.arange(50))

    # A matcher that gets 40 right, 5 wrong, 5 unmatched:
    matches = np.arange(50)
    matches[40:45] = 0
    w = np.ones(50)
    w[45:] = 0
    pr = correspondence_pr(matches, w, gt)
    assert abs(pr["precision"] - 40 / 45) < 1e-9
    assert abs(pr["recall"] - 40 / 50) < 1e-9

    rep = registration_report(T, T, kp_s, kp_t, matches, w)
    assert rep["rotation_error_deg"] < 1e-3
    assert rep["translation_error_m"] < 1e-6
    assert "precision" in rep
