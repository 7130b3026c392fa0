import numpy as np, time, jax
jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from bench import make_bench_pair
from ghicp_tpu.core.types import PointCloud
from ghicp_tpu.preprocess import voxel_downsample
from ghicp_tpu.preprocess.neighbors import (build_cell_table, _point_hash,
                                            _OFFSET_HASHES)
from ghicp_tpu.registration.pipeline import _compact

def t(f, n=30):
    r = f(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n

src, _, _ = make_bench_pair()
ds = _compact(voxel_downsample(PointCloud.from_points(src), 0.1))
tab = build_cell_table(ds, cell=0.5, max_cells=65536, cap=40)
q = ds.xyz[:4096]; m = ds.mask[:4096]

@jax.jit
def lookup_only(q):
    qh = _point_hash(q, tab.min_xyz, tab.cell)
    nh = qh[:, None] + jnp.asarray(_OFFSET_HASHES)[None, :]
    cid = jnp.searchsorted(tab.hashes, nh).astype(jnp.int32)
    return jnp.minimum(cid, tab.hashes.shape[0] - 1)

cid = lookup_only(q)

@jax.jit
def gather_only(cid):
    return tab.xyz[cid]

@jax.jit
def mask_compute(cxyz, q):
    d = cxyz.reshape(4096, -1, 3) - q[:, None, :]
    d2 = jnp.sum(d * d, axis=-1)
    return jnp.sum((d2 <= 0.25), axis=1)

cx = gather_only(cid)
print("searchsorted lookup [4096,27]:", round(t(lambda: lookup_only(q))*1000, 2), "ms", flush=True)
print("block gather [4096,27,40,3]: ", round(t(lambda: gather_only(cid))*1000, 2), "ms", flush=True)
print("mask+count compute:          ", round(t(lambda: mask_compute(cx, q))*1000, 2), "ms", flush=True)
