"""GS-phase dynamics on the REAL bench cost matrices (iter-0 FD and late ED)."""
import sys
sys.path.insert(0, "/root/repo")
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from bench import make_bench_pair
from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                   GHICPConfig)
from ghicp_tpu.core.types import PointCloud, bucket_size, cloud_bounds, compact_device
from ghicp_tpu.preprocess import voxel_downsample, pca_features, detect_keypoints
from ghicp_tpu.registration.pipeline import _keypoint_arrays, _morton_order_rows
from ghicp_tpu.features import extract_bsc, min_hamming_fd
from ghicp_tpu.matching.cost import euclidean_matrix
from ghicp_tpu.ops.auction_rounds import auction_phase_gs_pallas

cfg = GHICPConfig(feature=FeatureType.BSC, correspondence=CorrespondenceType.KM,
                  voxel_size=0.1, neighborhood_radius=0.5, non_max_radius=0.5,
                  min_neighbors=15, bsc_neighbor_k=256, pca_cell_cap=40,
                  pca_max_cells=65536, estimated_overlap=0.8)
src, tgt, _ = make_bench_pair()
ds = compact_device(voxel_downsample(PointCloud.from_points(src), 0.1))
dt = compact_device(voxel_downsample(PointCloud.from_points(tgt), 0.1))
bbx = float(cloud_bounds(ds).magnitude)
fs_p = pca_features(ds, radius=0.5, k=cfg.neighbor_k, cell_cap=40, max_cells=65536)
ft_p = pca_features(dt, radius=0.5, k=cfg.neighbor_k, cell_cap=40, max_cells=65536)
rs = detect_keypoints(ds, cfg, fs_p)
rt = detect_keypoints(dt, cfg, ft_p)
ms, mt = np.asarray(rs.mask), np.asarray(rt.mask)
cap = bucket_size(max(ms.sum(), mt.sum(), 1))
kp_s_idx, kp_s_mask, _ = _keypoint_arrays(ms, cap)
kp_t_idx, kp_t_mask, _ = _keypoint_arrays(mt, cap)
so = _morton_order_rows(ds.xyz[kp_s_idx], kp_s_mask)
kp_s_idx, kp_s_mask = kp_s_idx[so], kp_s_mask[so]
kp_s, kp_t = ds.xyz[kp_s_idx], dt.xyz[kp_t_idx]
fsb = extract_bsc(ds, kp_s, kp_s_mask, cfg, num_variants=cfg.bsc_num_variants)
ftb = extract_bsc(dt, kp_t, kp_t_mask, cfg, num_variants=1)
fd = min_hamming_fd(fsb.packed, ftb.packed, fsb.n_bits)
jax.block_until_ready(fd)
print("cap:", cap, "kps:", int(ms.sum()), int(mt.sum()), flush=True)

scale = 0.005 * bbx
m = (kp_s_mask[:, None] & kp_t_mask[None, :])


def run_phases(cd, penalty, tag, budget=48):
    S, C = cd.shape
    gate = jnp.isfinite(cd) & (cd < penalty)
    b = jnp.where(gate, -cd, -3.0e38).astype(jnp.bfloat16)
    finite_max = float(jnp.max(jnp.where(gate, -cd, -3.0e38)))
    spread = max(finite_max + penalty, 0.0)
    eps_final = max(0.01, spread / 64.0)
    p = jnp.zeros((C,), jnp.float32)
    owner = jnp.full((C,), -1, jnp.int32)
    sunk = jnp.zeros((S,), jnp.int32)
    open_ = kp_s_mask.astype(jnp.int32)
    # also open the padding rows like the solver does (they sink round 1)
    open_ = jnp.ones((S,), jnp.int32)
    eps_now = max(spread / 8.0, eps_final)
    remaining = budget
    for k in range(4):
        t0 = time.perf_counter()
        p, owner, sunk, r, _g = auction_phase_gs_pallas(
            b, p, owner, sunk, open_, eps_now, -float(penalty), remaining,
            ts=128, esc_after=max(remaining // 2, 1),
            esc_period=max(remaining // 8, 1))
        jax.block_until_ready(p)
        dt_ = time.perf_counter() - t0
        o = np.asarray(owner)
        owned = np.zeros(S, bool)
        owned[o[o >= 0]] = True
        open_np = (~owned) & (np.asarray(sunk) == 0)
        print(f"{tag} phase {k}: eps={eps_now:.3f} rounds={int(r)}/{remaining} "
              f"open_after={open_np.sum()} sunk={int(np.asarray(sunk).sum())} "
              f"time={dt_*1e3:.0f}ms", flush=True)
        remaining -= int(r)
        if remaining <= 0:
            break
        eps_now = max(eps_now / 5.0, eps_final)
        open_ = jnp.asarray(open_np.astype(np.int32))


# iteration 0: pure FD, early penalty = mean - 2*std
fd_m = jnp.where(m, fd, jnp.inf)
mean = float(jnp.mean(jnp.where(m, fd, 0)) * (m.size / jnp.sum(m)))
std = float(jnp.sqrt(jnp.maximum(
    jnp.sum(jnp.where(m, (fd - mean) ** 2, 0)) / jnp.sum(m), 0)))
pen0 = max(mean - 2.0 * std, 5.0)
print(f"iter0: fd mean={mean:.1f} std={std:.1f} pen={pen0:.1f}", flush=True)
run_phases(fd_m, pen0, "iter0-FD")

# late iteration: ED-dominant at converged pose (src ~ tgt), wfd=exp(-3)
ed = euclidean_matrix(kp_s, kp_t, jnp.float32(scale))
wfd = float(np.exp(-3.0))
cd_late = jnp.where(m, (1 - wfd) * ed + wfd * fd, jnp.inf)
pen_late = 5.0
run_phases(cd_late, pen_late, "late-ED")
