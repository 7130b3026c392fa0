"""Engine-iteration decomposition at bench scale (8192x8192)."""
import sys
sys.path.insert(0, "/root/repo")
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from ghicp_tpu.core.comm import LOCAL
from ghicp_tpu.matching.cost import blend_bsc, euclidean_matrix
from ghicp_tpu.matching.auction import auction_match
from ghicp_tpu.registration.estimator import estimate


def t(f, n=10):
    r = f(); jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = f()
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


S = C = 8192
valid = 6600
rng = np.random.default_rng(0)
kp_s = jnp.asarray(rng.uniform(0, 25, (S, 3)).astype(np.float32))
kp_t = jnp.asarray(rng.uniform(0, 25, (C, 3)).astype(np.float32))
mask_s = jnp.asarray(np.arange(S) < valid)
mask_t = jnp.asarray(np.arange(C) < valid)
fd = jnp.asarray(rng.integers(40, 200, (S, C)).astype(np.float32))
scale = jnp.float32(0.005 * 85.0)

ed_f = jax.jit(lambda a, b: euclidean_matrix(a, b, scale))
print("euclidean_matrix:", t(lambda: ed_f(kp_s, kp_t)), flush=True)
ed = ed_f(kp_s, kp_t)

blend_f = jax.jit(lambda e, f: blend_bsc(
    e, f, mask_s, mask_t, jnp.float32(20.0), jnp.float32(0.9),
    jnp.float32(90.0), jnp.float32(30.0), jnp.float32(1.0), jnp.float32(1.0),
    scale, 6.0, 2.0))
print("blend_bsc:", t(lambda: blend_f(ed, fd)), flush=True)
cost = blend_f(ed, fd)

am = jax.jit(lambda cd, pen: auction_match(
    cd, pen, mask_s, mask_t, eps_final=0.01, max_rounds=48,
    rel_eps=1.0 / 64.0, quantize_bf16=True, use_round_kernel=True,
    n_phases=4))
out = am(cost.cd, cost.penalty)
print("auction_match (cold-ish prices):",
      t(lambda: am(cost.cd, cost.penalty)),
      "rounds:", int(out.rounds), flush=True)

w = out.match.w
tgt_pts = kp_t[out.match.tgt_idx]
est_f = jax.jit(lambda a, b, ww: estimate(a, b, ww, dof=6, comm=LOCAL))
print("estimate (SVD):", t(lambda: est_f(kp_s, tgt_pts, w)), flush=True)
