"""Time individual per-iteration pieces at bench scale (6656 x 6656).

Defeats the axon transport's identical-execution dedup by perturbing one
input scalar per rep and keeping a data dependence into the fetched result.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

S = C = 6656
REPS = 20


def timeit(name, fn, *args):
    # warm/compile
    out = fn(jnp.float32(0.0), *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for i in range(REPS):
        out = fn(acc + jnp.float32(i) * 1e-6, *args)
        acc = out if out.ndim == 0 else jnp.ravel(out)[0].astype(jnp.float32)
    jax.block_until_ready(acc)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:28s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    kps = jnp.asarray(rng.uniform(0, 25, (S, 3)), jnp.float32)
    kpt = jnp.asarray(rng.uniform(0, 25, (C, 3)), jnp.float32)
    fd = jnp.asarray(rng.integers(0, 200, (S, C)), jnp.bfloat16)
    mask = jnp.ones((S,), bool)
    penalty = jnp.float32(5.0)

    from ghicp_tpu.matching.auction import (auction_match_benefits,
                                            auction_assign)
    from ghicp_tpu.ops.cost_kernel import fused_benefit

    @jax.jit
    def f_fused(x, kps, kpt, fd):
        b, cnt, s1, s2, _, edm, _bm, _v1, _vs = fused_benefit(
            kps + x, kpt, fd, mask, mask, jnp.float32(0.7), jnp.float32(0.3),
            jnp.float32(0.2), ts=128)
        return s1

    timeit("fused_benefit", f_fused, kps, kpt, fd)

    b0 = -(jnp.abs(kps[:, :1] - kpt[:, 0][None, :]) * 2.0
           + 0.3 * fd.astype(jnp.float32)).astype(jnp.bfloat16)

    def mk_auction(budget, phases):
        @jax.jit
        def f(x, b):
            r = auction_match_benefits(
                b + x.astype(jnp.bfloat16), penalty, mask, mask,
                eps_final=0.01, max_rounds=budget, rel_eps=1.0 / 64,
                use_round_kernel=True, n_phases=phases)
            return r.energy
        return f

    timeit("auction b16 ph2 (wrapper)", mk_auction(16, 2), b0)
    timeit("auction b16 ph1 (wrapper)", mk_auction(16, 1), b0)
    timeit("auction b1  ph1 (wrapper)", mk_auction(1, 1), b0)

    # kernel phase alone (no wrapper, no repair/completion)
    from ghicp_tpu.ops.auction_rounds import auction_phase_gs_pallas

    def mk_phase(budget):
        @jax.jit
        def f(x, b):
            p0 = jnp.zeros((C,), jnp.float32)
            owner0 = jnp.full((C,), -1, jnp.int32)
            sunk0 = jnp.zeros((S,), jnp.int32)
            open0 = jnp.ones((S,), jnp.int32)
            p, owner, sunk, r, _g = auction_phase_gs_pallas(
                b + x.astype(jnp.bfloat16), p0, owner0, sunk0, open0,
                jnp.float32(0.05), -penalty, jnp.int32(budget), ts=128,
                inner_cap=1, esc_after=4, esc_period=1)
            return p[0]
        return f

    timeit("gs kernel phase b16", mk_phase(16), b0)
    timeit("gs kernel phase b1", mk_phase(1), b0)

    # greedy completion block alone (as in auction_match_benefits tail)
    @jax.jit
    def f_greedy(x, b):
        p = jnp.zeros((C,), jnp.float32) + x
        bf = b.astype(jnp.float32)
        v = bf - p[None, :]
        v1 = jnp.max(v, axis=1)
        j1 = jnp.argmax(v, axis=1).astype(jnp.int32)
        rows = jnp.arange(S)
        real = mask & (bf[rows, j1] > -penalty)
        return jnp.sum(jnp.where(real, -bf[rows, j1], 0.0)) + v1[0]

    timeit("greedy completion passes", f_greedy, b0)

    # CS repair (reopen_violators-equivalent single config): 4 sweeps
    @jax.jit
    def f_repair(x, b):
        p = jnp.zeros((C,), jnp.float32) + x
        acol = jnp.arange(S, dtype=jnp.int32) % C
        owner = jnp.arange(C, dtype=jnp.int32)
        rows = jnp.arange(S)

        def sweep(_, st):
            owner, acol, p = st
            v = b.astype(jnp.float32) - p[None, :]
            v1 = jnp.max(jnp.maximum(v, -penalty), axis=1)
            cur = jnp.where((acol >= 0) & (acol < C), acol, 0)
            ok = (acol < 0) | (v[rows, cur] >= v1 - 0.01)
            reopened = jnp.where(~ok & (acol >= 0) & (acol < C), acol, C)
            owner = owner.at[reopened].set(-1, mode="drop")
            acol = jnp.where(ok, acol, -1)
            p = jnp.where(owner < 0, 0.0, p)
            return owner, acol, p

        owner, acol, p = jax.lax.fori_loop(0, 4, sweep, (owner, acol, p))
        return p[0]

    timeit("CS repair (4 sweeps)", f_repair, b0)


if __name__ == "__main__":
    main()
