"""Split cell-pair PCA internals + NMS stage on the bench source cloud."""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from bench import make_bench_pair
from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                   GHICPConfig)
from ghicp_tpu.core.types import PointCloud, compact_device
from ghicp_tpu.preprocess import voxel_downsample
from ghicp_tpu.preprocess.neighbors import build_cell_table
from ghicp_tpu.preprocess.pca import _pca_cell_pair, pca_features
from ghicp_tpu.preprocess.keypoints import (detect_keypoints, prune_unstable)


def t(f, n=5):
    r = f(); jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = f()
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


cfg = GHICPConfig(feature=FeatureType.BSC, correspondence=CorrespondenceType.KM,
                  voxel_size=0.1, neighborhood_radius=0.5, non_max_radius=0.5,
                  min_neighbors=15, bsc_neighbor_k=256, pca_cell_cap=40,
                  pca_max_cells=65536, estimated_overlap=0.8)

src, tgt, _ = make_bench_pair()
cs = PointCloud.from_points(src)
ds = compact_device(voxel_downsample(cs, 0.1))
r = cfg.neighborhood_radius

tb = lambda: build_cell_table(ds, cell=r, max_cells=cfg.pca_max_cells,
                              cap=cfg.pca_cell_cap)
print("build_cell_table:", t(tb), flush=True)
table = tb()
jax.block_until_ready(table.hashes)
n_cells = int(jnp.sum(table.hashes != jnp.int32(2**31 - 1)))
print("n_cells:", n_cells, flush=True)
cc = 256
n_chunks = (n_cells + cc - 1) // cc
cp = lambda: _pca_cell_pair(table, r, cc, n_chunks, ds.capacity)
print("_pca_cell_pair:", t(cp), flush=True)
feats = cp()
jax.block_until_ready(feats.curvature)
spill = ds.mask & ~(feats.n_neighbors > 0)
print("n_spill:", int(jnp.sum(spill)), flush=True)

full = lambda: pca_features(ds, radius=r, k=cfg.neighbor_k,
                            cell_cap=cfg.pca_cell_cap,
                            max_cells=cfg.pca_max_cells)
print("pca_features full:", t(full), flush=True)
fs = full()
jax.block_until_ready(fs.curvature)

cand = prune_unstable(fs, cfg.unstable_ratio_threshold, cfg.min_neighbors)
print("n_candidates:", int(jnp.sum(cand)), flush=True)
dk = lambda: detect_keypoints(ds, cfg, fs).mask
print("detect_keypoints:", t(dk), flush=True)

# NMS kernel alone at the compacted candidate bucket
from ghicp_tpu.core.types import bucket_size
count = int(jnp.sum(cand))
cap = bucket_size(count, min_size=256)
sel = jnp.argsort(~cand)[:cap]
cmask = cand[sel]
cxyz = ds.xyz[sel]
ccurv = fs.curvature[sel]
jax.block_until_ready(cxyz)
print("cand bucket:", cap, flush=True)
from ghicp_tpu.ops.nms_kernel import nms_pallas
nm = lambda: nms_pallas(cxyz, ccurv, cmask, cfg.non_max_radius)[0]
print("nms_pallas:", t(nm), flush=True)
print("nms rounds:", int(nms_pallas(cxyz, ccurv, cmask, cfg.non_max_radius)[1]),
      flush=True)
