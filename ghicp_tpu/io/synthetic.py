"""Synthetic point-cloud pair generation for tests and benchmarks.

The reference validates only on real TLS scans (README.md:75,93); our test
strategy (SURVEY.md §4) instead needs deterministic synthetic pairs with a
known ground-truth rigid transform, partial overlap, and noise.
"""
from __future__ import annotations

import numpy as np


def structured_scene(rng: np.random.Generator, n_points: int,
                     extent: float = 20.0) -> np.ndarray:
    """A TLS-like scene: ground plane + walls + scattered distinct objects.

    Surfaces (not uniform volume noise) so that curvature keypoints and BSC
    features are meaningful, mimicking the terrestrial scans the reference
    targets (README.md:16-20).  The object mix is deliberately diverse
    (yawed boxes, slant-roofed boxes, cylinders, octahedra) so that
    curvature keypoints are *point-like and repeatable* across independent
    samplings — long featureless edges produce NMS keypoints at arbitrary
    positions and no registration pipeline can match them.
    """
    parts = []
    n_ground = n_points // 6
    g = rng.uniform([-extent, -extent, 0], [extent, extent, 0.02],
                    size=(n_ground, 3))
    parts.append(g)

    n_wall = n_points // 6
    w1 = rng.uniform([-extent, -extent, 0], [extent, -extent + 0.02, 6.0],
                     size=(n_wall // 2, 3))
    w2 = rng.uniform([-extent, -extent, 0], [-extent + 0.02, extent, 6.0],
                     size=(n_wall - n_wall // 2, 3))
    parts.extend([w1, w2])

    n_boxes = n_points - n_ground - n_wall
    n_per_box = max(n_boxes // 40, 8)
    placed = 0
    obj_id = 0
    while placed < n_boxes:
        c = rng.uniform([-extent * 0.8, -extent * 0.8, 0],
                        [extent * 0.8, extent * 0.8, 0])
        m = min(n_per_box, n_boxes - placed)
        kind = obj_id % 4
        obj_id += 1
        if kind == 3:
            # octahedron (|x|+|y|+|z| = s) at a random orientation: eight
            # sharp point-like vertices -> repeatable curvature keypoints
            s = rng.uniform(0.5, 1.8)
            v = rng.normal(size=(m, 3))
            v = v / np.maximum(np.abs(v).sum(1, keepdims=True), 1e-9) * s
            q = rng.normal(size=(3, 3))
            Q, _ = np.linalg.qr(q)
            parts.append(c + np.array([0, 0, s]) + v @ Q.T)
        elif kind == 2:
            # vertical cylinder (tree trunk / pillar): distinctive curvature
            radius = rng.uniform(0.2, 1.2)
            height = rng.uniform(1.0, 6.0)
            ang = rng.uniform(0, 2 * np.pi, m)
            z = rng.uniform(0, height, m)
            pts = np.stack([radius * np.cos(ang), radius * np.sin(ang), z], 1)
            parts.append(c + pts)
        else:
            # box with a random yaw and (kind==1) a random slanted top cut,
            # so corners/edges differ between objects — avoids the
            # feature-ambiguity of cloned axis-aligned boxes.
            size = rng.uniform(0.5, 4.0, size=3)
            face = rng.integers(0, 6, size=m)
            uv = rng.uniform(0, 1, size=(m, 2))
            pts = np.zeros((m, 3))
            for axis in range(3):
                lo = face == 2 * axis
                hi = face == 2 * axis + 1
                others = [a for a in range(3) if a != axis]
                for sel, val in ((lo, 0.0), (hi, 1.0)):
                    pts[sel, axis] = val
                    pts[sel, others[0]] = uv[sel, 0]
                    pts[sel, others[1]] = uv[sel, 1]
            pts = pts * size
            if kind == 1:
                # slanted roof: shear the top face
                slope = rng.uniform(-0.4, 0.4, 2)
                pts[:, 2] += (pts[:, 0] * slope[0] + pts[:, 1] * slope[1]) \
                    * (pts[:, 2] / max(size[2], 1e-6))
            yaw = rng.uniform(0, 2 * np.pi)
            Rz = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                           [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
            parts.append(c + pts @ Rz.T)
        placed += m
    scene = np.concatenate(parts, axis=0)[:n_points]
    return scene.astype(np.float32)


def make_pair(seed: int = 0, n_points: int = 20000,
              rotation_deg: float = 10.0, translation: float = 1.0,
              noise: float = 0.01, overlap: float = 0.8,
              yaw_only: bool = False, extent: float = 20.0):
    """Generate (source, target, T_gt) with T_gt mapping source -> target.

    Partial overlap is produced by slicing each cloud to an overlapping
    half-space band; both clouds get independent noise realizations.
    """
    rng = np.random.default_rng(seed)
    scene = structured_scene(rng, int(n_points / max(overlap, 0.1)), extent)

    # overlap window along x
    xs = scene[:, 0]
    lo, hi = np.quantile(xs, [0.0, 1.0])
    span = hi - lo
    cut = lo + span * (1.0 - overlap)
    target_pts = scene[xs >= lo + span * 0.0]
    source_sel = scene[xs >= cut] if overlap < 1.0 else scene
    target_sel = scene[xs <= hi - span * (1.0 - overlap)] if overlap < 1.0 else scene

    # ground-truth transform: source = T_gt^-1(target region); we instead
    # define clean source points and transform them by T_gt to sit in the
    # target frame.
    angle = np.deg2rad(rotation_deg) * rng.uniform(0.3, 1.0)
    if yaw_only:
        axis = np.array([0.0, 0.0, 1.0])
    else:
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)
    t = rng.uniform(-translation, translation, size=3)
    if yaw_only:
        t[2] *= 0.1
    T_gt = np.eye(4, dtype=np.float64)
    T_gt[:3, :3] = R
    T_gt[:3, 3] = t

    # source cloud lives in its own frame: apply inverse of T_gt to the
    # shared geometry, so that T_gt maps source -> target.
    src_clean = (source_sel - t) @ R  # == R^T (x - t)
    source = src_clean + rng.normal(scale=noise, size=src_clean.shape)
    target = target_sel + rng.normal(scale=noise, size=target_sel.shape)
    return (source.astype(np.float32), target.astype(np.float32),
            T_gt.astype(np.float32))
