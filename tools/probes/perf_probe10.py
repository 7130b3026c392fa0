"""Direct GS-phase instrumentation on a realistic tie-heavy benefit matrix."""
import sys
sys.path.insert(0, "/root/repo")
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from ghicp_tpu.ops.auction_rounds import auction_phase_gs_pallas

S = C = 8192
valid = 6600
rng = np.random.default_rng(0)

# Iteration-0-like cost: integer min-Hamming FD in [30, 200], heavy ties;
# ~overlap structure: each row has a "true" partner with low cost.
fd = rng.integers(60, 200, (valid, valid)).astype(np.float32)
true_j = rng.permutation(valid)
fd[np.arange(valid), true_j] = rng.integers(30, 60, valid)
penalty = 150.0
b = np.full((S, C), -3.0e38, np.float32)
gate = fd < penalty
b[:valid, :valid] = np.where(gate, -fd, -3.0e38)
bj = jnp.asarray(b).astype(jnp.bfloat16)

sink = -penalty
spread = 120.0
eps_final = spread / 64.0

p = jnp.zeros((C,), jnp.float32)
owner = jnp.full((C,), -1, jnp.int32)
sunk = jnp.zeros((S,), jnp.int32)
open_ = jnp.ones((S,), jnp.int32)

eps_now = spread / 8.0
remaining = 48
for k in range(4):
    esc_after = max(remaining // 2, 1)
    esc_period = max(remaining // 8, 1)
    t0 = time.perf_counter()
    p, owner, sunk, r, _g = auction_phase_gs_pallas(
        bj, p, owner, sunk, open_, eps_now, sink, remaining,
        ts=128, esc_after=esc_after, esc_period=esc_period)
    jax.block_until_ready(p)
    dt = time.perf_counter() - t0
    owned = np.zeros(S, bool)
    o = np.asarray(owner)
    owned[o[o >= 0]] = True
    n_open = S - owned.sum() - int((np.asarray(sunk) == 1 & ~owned).sum())
    # recompute open like the solver would for next phase
    open_np = (~owned) & (np.asarray(sunk) == 0)
    print(f"phase {k}: eps={eps_now:.3f} rounds={int(r)}/{remaining} "
          f"open_after={open_np.sum()} sunk={int(np.asarray(sunk).sum())} "
          f"time={dt*1e3:.1f}ms", flush=True)
    remaining -= int(r)
    if remaining <= 0:
        break
    eps_now = max(eps_now / 5.0, eps_final)
    open_ = jnp.asarray(open_np.astype(np.int32))
    # (skip CS repair here — just watching raw phase dynamics)

# matched quality vs scipy on the same problem
matched = (o >= 0) & (np.arange(C) < valid)
print("matched cols:", matched.sum(), "of", valid)
