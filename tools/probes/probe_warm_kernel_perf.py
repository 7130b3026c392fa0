"""Stage-wise device timing of the single-launch warm kernel vs the
two-launch (fused_benefit + GS) path, at bench shapes (8192^2 bf16).

Chains K launches inside ONE jitted fori_loop with data feedback, so the
tunnel's fixed dispatch cost amortizes and execution dedup can't trigger
(NOTES: isolated microbenchmarks through the tunnel are untrustworthy).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from ghicp_tpu.ops.auction_rounds import (auction_phase_gs_pallas,
                                          auction_warm_fused_pallas)
from ghicp_tpu.ops.cost_kernel import fused_benefit

S = T = 8192
K = 50
rng = np.random.default_rng(0)
kps = jnp.asarray(rng.uniform(-12, 12, (S, 3)), jnp.float32)
kpt = jnp.asarray(rng.uniform(-12, 12, (T, 3)), jnp.float32)
fd = jnp.asarray(rng.integers(0, 200, (S, T)), jnp.bfloat16)
ms = jnp.ones((S,), bool)
mt = jnp.ones((T,), bool)
wed, wfd, scale = 0.95, 0.05, 0.12
pen = 5.0

# A realistic warm state: one converged solve through the kernel.
p0 = jnp.zeros((T,), jnp.float32)
o0 = jnp.full((T,), -1, jnp.int32)
p1, owner1, sunk1, r1, gcol1, stats1 = auction_warm_fused_pallas(
    kps, kpt, fd, ms, mt, wed, wfd, scale, p0, o0,
    jnp.full((S,), -1, jnp.int32), jnp.zeros((S,), jnp.int32),
    jnp.zeros((S,), bool), -pen, 0.01, 1.0 / 64, 0.0, 40,
    ts=256, esc_after=10, esc_period=3)
acol1 = np.full(S, -1, np.int32)
own_np = np.asarray(owner1)
for c in range(T):
    if own_np[c] >= 0:
        acol1[own_np[c]] = c
acol1_j = jnp.asarray(acol1)
ownok = acol1 >= 0
print(f"warm state: owned={int((own_np>=0).sum())} rounds={int(r1)}",
      flush=True)


def time_chain(fn, label):
    @jax.jit
    def chain(p):
        def body(i, p):
            return fn(p + 1e-6 * i)
        return jax.lax.fori_loop(0, K, body, p)

    out = chain(p1)               # compile
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(p1 * 1.0001)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best / K * 1000:.3f} ms/launch", flush=True)


for tsv in (256, 512):
    for stage, label in ((1, f"sweep0 only ts={tsv}"),
                         (0, f"full warm kernel ts={tsv}")):
        def fn(p, stage=stage, tsv=tsv):
            pp, ow, sk, r, gc, st = auction_warm_fused_pallas(
                kps, kpt, fd, ms, mt, wed, wfd, scale, p, owner1, acol1_j,
                sunk1, jnp.asarray(ownok), -pen, 0.01, 1.0 / 64, 0.0, 1,
                ts=tsv, esc_after=1, esc_period=1, probe_stage=stage)
            return pp
        time_chain(fn, label)


def fn_fused(p):
    b, cnt, s1, s2, cm, edm, bm, v1, vsel = fused_benefit(
        kps, kpt, fd, ms, mt, wed, wfd, scale, ts=128,
        p_defl=p, acol0=acol1_j, with_stats=False)
    return v1[:T] * 0.0 + p + bm * 0.0


time_chain(fn_fused, "old: fused_benefit (lean)")


def fn_gs(p):
    b = fd  # stand-in bf16 matrix stream (same traffic as benefit read)
    pp, ow, sk, r, gc = auction_phase_gs_pallas(
        b, p, owner1, jnp.zeros((S,), jnp.int32),
        jnp.zeros((S,), jnp.int32).at[:512].set(1), 0.05, -pen,
        jnp.int32(1), ts=256, inner_cap=1, esc_after=0, esc_period=1,
        complete_open=1)
    return pp


time_chain(fn_gs, "old: GS kernel (1 sweep, 512 open rows)")


