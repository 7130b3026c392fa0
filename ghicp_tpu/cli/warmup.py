"""Compilation-cache pre-seeding tool.

First-contact latency on a fresh machine is dominated by XLA compilation
of the pipeline's executables (minutes through a remote-TPU transport;
SURVEY.md §7 "static shapes" keeps the executable set small but each
compile is slow).  This tool runs one synthetic registration at the
deployment's expected scale so the persistent compilation cache
(``--jax-cache``) already holds every executable when real data arrives —
afterwards, same-bucket runs start warm (~2 s end-to-end at the 800k-pt
bench scale instead of minutes).

Shapes are bucketed (core/types.py::bucket_size), so the synthetic proxy
covers real clouds whose raw / downsampled / keypoint counts land in the
same power-of-two-ish buckets; run once per expected scale.

Usage:
  python -m ghicp_tpu.cli.warmup --points 800000 --feature B --corres K \
      --voxel 0.1 --radius 0.5 --nms 0.5
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="pre-seed the XLA compilation cache at a given scale")
    p.add_argument("--points", type=int, default=800_000)
    p.add_argument("--extent", type=float, default=25.0)
    p.add_argument("--feature", choices=list("BFRN"), default="B")
    p.add_argument("--corres", choices=list("KNR"), default="K")
    p.add_argument("--voxel", type=float, default=0.1)
    p.add_argument("--radius", type=float, default=0.5)
    p.add_argument("--nms", type=float, default=0.5)
    p.add_argument("--dof", type=int, choices=[4, 6], default=6)
    p.add_argument("--streaming", choices=["auto", "on", "off"],
                   default="auto")
    p.add_argument("--jax-cache", default="/root/.ghicp_jax_cache")
    args = p.parse_args(argv)

    import jax
    if args.jax_cache:
        jax.config.update("jax_compilation_cache_dir", args.jax_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                       GHICPConfig)
    from ghicp_tpu.io.synthetic import structured_scene
    from ghicp_tpu.registration.pipeline import register_pair

    fmap = {"B": "bsc", "F": "fpfh", "R": "rops", "N": "none"}
    cmap = {"K": "km", "N": "nn", "R": "nnr"}
    cfg = GHICPConfig(feature=FeatureType(fmap[args.feature]),
                      correspondence=CorrespondenceType(cmap[args.corres]),
                      reg_dof=args.dof, voxel_size=args.voxel,
                      neighborhood_radius=args.radius,
                      non_max_radius=args.nms,
                      streaming_cost=args.streaming)
    rng = np.random.default_rng(0)
    pts = structured_scene(rng, args.points, extent=args.extent)
    theta = np.deg2rad(8.0)
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], np.float32)
    src = ((pts - np.float32([0.8, -0.5, 0.1])) @ R
           + rng.normal(0, 0.006, pts.shape)).astype(np.float32)
    tgt = (pts + rng.normal(0, 0.006, pts.shape)).astype(np.float32)
    t0 = time.perf_counter()
    out = register_pair(src, tgt, cfg)
    print(f"[warmup] compiled + ran the {args.points}-pt "
          f"{args.feature}/{args.corres} pipeline in "
          f"{time.perf_counter() - t0:.1f}s "
          f"(kps={out.n_source_keypoints}/{out.n_target_keypoints}); "
          f"cache at {args.jax_cache}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
