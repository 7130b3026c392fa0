"""PCA internals timing on the bench source cloud."""
import numpy as np, time, functools, jax
jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from bench import make_bench_pair
from ghicp_tpu.core.types import PointCloud
from ghicp_tpu.preprocess import voxel_downsample, pca_features
from ghicp_tpu.preprocess.neighbors import build_cell_table, cell_candidates
from ghicp_tpu.preprocess.pca import _pca_cell_block
from ghicp_tpu.ops.eigh3 import eigh3
from ghicp_tpu.registration.pipeline import _compact

def t(f, n=5):
    r = f(); jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); r = f(); jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)

src, tgt, _ = make_bench_pair()
ds = _compact(voxel_downsample(PointCloud.from_points(src), 0.1))
print("capacity:", ds.capacity, flush=True)
tab = build_cell_table(ds, cell=0.5, max_cells=65536, cap=40)
print("build_cell_table:", round(t(lambda: build_cell_table(ds, cell=0.5, max_cells=65536, cap=40).xyz), 3), flush=True)

for chunk in (4096, 16384, 65536):
    f = functools.partial(pca_features, ds, radius=0.5, k=128, cell_cap=40,
                          max_cells=65536, chunk=chunk)
    print(f"pca_features chunk={chunk}:", round(t(lambda: f().curvature), 3), flush=True)

# single chunk pieces
q = ds.xyz[:4096]; m = ds.mask[:4096]
cc = jax.jit(lambda: cell_candidates(tab, q, m))
print("cell_candidates 4096:", round(t(lambda: cc()[0]), 4), flush=True)
blk = jax.jit(lambda: _pca_cell_block(tab, q, m, 0.5))
print("pca_cell_block 4096:", round(t(lambda: blk().curvature), 4), flush=True)
cov = jnp.tile(jnp.eye(3)[None], (4096, 1, 1)).astype(jnp.float32)
e3 = jax.jit(lambda: eigh3(cov))
print("eigh3 4096:", round(t(lambda: e3()[0]), 4), flush=True)
