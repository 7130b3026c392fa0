"""Whole-phase auction kernel (ops/auction_rounds.py): interpret-mode
parity against the jnp reference, and engine-level equivalence of the
round-kernel dispatch path."""
import numpy as np
import jax.numpy as jnp

from ghicp_tpu.ops.auction_rounds import (auction_rounds_pallas,
                                          auction_rounds_ref)


def test_rounds_kernel_matches_ref():
    rng = np.random.default_rng(0)
    S, C = 512, 640
    b = rng.uniform(-4, 0, (S, C)).astype(np.float32)
    b[rng.random((S, C)) < 0.3] = -3e38
    p0 = jnp.zeros(C, jnp.float32)
    o0 = jnp.full((C,), -1, jnp.int32)
    s0 = jnp.zeros(S, jnp.int32)
    for n_rounds in (1, 7, 40):
        a = auction_rounds_pallas(jnp.asarray(b), p0, o0, s0, 0.05, -2.0,
                                  n_rounds, ts=256, interpret=True)
        r = auction_rounds_ref(jnp.asarray(b), p0, o0, s0, 0.05, -2.0,
                               n_rounds)
        for x, y in zip(a, r):
            assert np.array_equal(np.asarray(x), np.asarray(y))


def test_rounds_kernel_warm_state():
    """Carried (p, owner, sunk) state must continue identically."""
    rng = np.random.default_rng(1)
    S, C = 256, 384
    b = jnp.asarray(rng.uniform(-4, 0, (S, C)).astype(np.float32))
    p0 = jnp.zeros(C, jnp.float32)
    o0 = jnp.full((C,), -1, jnp.int32)
    s0 = jnp.zeros(S, jnp.int32)
    # 10 rounds in one call == 2 calls of 5 rounds with carried state.
    a = auction_rounds_ref(b, p0, o0, s0, 0.1, -2.0, 10)
    m = auction_rounds_ref(b, p0, o0, s0, 0.1, -2.0, 5)
    m = auction_rounds_ref(b, *m, 0.1, -2.0, 5)
    for x, y in zip(a, m):
        assert np.array_equal(np.asarray(x), np.asarray(y))
