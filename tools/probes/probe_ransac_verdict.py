"""Why does the coarse init fail at the verdict (NMS 1.0) config?

Monkeypatches ransac_coarse_align to capture its inlier count and pose
error, then runs the bench verdict pipeline.
"""
import dataclasses
import sys

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from bench import make_bench_pair  # noqa: E402
from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,  # noqa
                                   GHICPConfig)
from ghicp_tpu.matching import ransac as _r  # noqa: E402
from ghicp_tpu.registration import pipeline as _pl  # noqa: E402
from ghicp_tpu.registration.pipeline import (register_pair,  # noqa: E402
                                             transform_error)

captured = {}
orig = _r.ransac_coarse_align


def spy(*a, **k):
    rr = orig(*a, **k)
    captured["inliers"] = int(rr.inliers)
    captured["transform"] = np.asarray(rr.transform)
    return rr


_r.ransac_coarse_align = spy
_pl_mod = sys.modules["ghicp_tpu.registration.pipeline"]


def main():
    src, tgt, T_gt = make_bench_pair()
    for nms in (1.0, 0.5):
        captured.clear()
        cfg = GHICPConfig(feature=FeatureType.BSC,
                          correspondence=CorrespondenceType.KM,
                          voxel_size=0.1, neighborhood_radius=0.5,
                          non_max_radius=nms, min_neighbors=15,
                          bsc_neighbor_k=256, pca_cell_cap=40,
                          pca_max_cells=65536, estimated_overlap=0.8,
                          max_iterations=60)
        out = register_pair(src, tgt, cfg)
        rot, tr = transform_error(out.transform, T_gt)
        line = (f"NMS {nms}: kps={out.n_source_keypoints}/"
                f"{out.n_target_keypoints} iters="
                f"{int(out.result.iterations)} rot={rot:.3f} t={tr:.3f}")
        if "inliers" in captured:
            rrot, rtr = transform_error(captured["transform"], T_gt)
            line += (f"  RANSAC: inliers={captured['inliers']} "
                     f"rot={rrot:.3f} t={rtr:.3f}")
        else:
            line += "  RANSAC: NOT CALLED"
        print(line, flush=True)


if __name__ == "__main__":
    main()
