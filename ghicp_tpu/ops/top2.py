"""Row-wise top-2 of (b - p): the auction bidding round's hot reduction.

The XLA formulation in :mod:`ghicp_tpu.matching.auction` makes three passes
over the [S, C] benefit matrix per bidding round (argmax, gather, masked
re-max).  This Pallas kernel fuses them into a single HBM sweep: each row
tile streams its column tiles once, keeping the running (v1, j1, v2) in
VMEM scratch — per-round HBM traffic drops to one read of ``b``.

Used when the backend is a real TPU; the jnp reference path (identical
semantics, verified in tests) serves CPU and as the fallback.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG = -3.0e38  # python float: pallas kernels cannot capture traced constants


def top2_rows_ref(b: Array, p: Array):
    """Reference implementation: (v1, j1, v2) per row of (b - p)."""
    v = b - p[None, :]
    j1 = jnp.argmax(v, axis=1).astype(jnp.int32)
    v1 = jnp.take_along_axis(v, j1[:, None], axis=1)[:, 0]
    cols = jnp.arange(b.shape[1], dtype=jnp.int32)
    v2 = jnp.max(jnp.where(cols[None, :] == j1[:, None], _NEG, v), axis=1)
    return v1, j1, v2


def _top2_kernel(b_ref, p_ref, v1_ref, j1_ref, v2_ref, *, tc: int):
    C = b_ref.shape[1]
    n_chunks = C // tc
    ts = b_ref.shape[0]

    def body(k, carry):
        v1, j1, v2 = carry
        off = k * tc
        v = b_ref[:, pl.ds(off, tc)] - p_ref[0, pl.ds(off, tc)]
        cols = jax.lax.broadcasted_iota(jnp.int32, (ts, tc), 1) + off
        m1 = jnp.max(v, axis=1)
        a1 = jnp.argmax(v, axis=1).astype(jnp.int32) + off
        m2 = jnp.max(jnp.where(cols == a1[:, None], _NEG, v), axis=1)
        # Merge chunk top-2 into running top-2:
        # second best overall = max(min(v1, m1), v2, m2).
        new_v1 = jnp.maximum(v1, m1)
        new_j1 = jnp.where(m1 > v1, a1, j1)
        new_v2 = jnp.maximum(jnp.minimum(v1, m1), jnp.maximum(v2, m2))
        return new_v1, new_j1, new_v2

    init = (jnp.full((ts,), _NEG, jnp.float32),
            jnp.zeros((ts,), jnp.int32),
            jnp.full((ts,), _NEG, jnp.float32))
    v1, j1, v2 = jax.lax.fori_loop(0, n_chunks, body, init)
    v1_ref[:] = v1
    j1_ref[:] = j1
    v2_ref[:] = v2


@functools.partial(jax.jit, static_argnames=("ts", "tc"))
def top2_rows_pallas(b: Array, p: Array, ts: int = 256, tc: int = 512):
    """Pallas top-2: b [S, C] (S % ts == 0, C % tc == 0), p [C]."""
    S, C = b.shape
    grid = (S // ts,)
    p2 = p.reshape(1, C)
    out = pl.pallas_call(
        functools.partial(_top2_kernel, tc=tc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ts, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ts,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts,), lambda i: (i,), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S,), jnp.float32),
            jax.ShapeDtypeStruct((S,), jnp.int32),
            jax.ShapeDtypeStruct((S,), jnp.float32),
        ),
    )(b, p2)
    return out


def top2_rows(b: Array, p: Array, use_pallas: bool = False):
    """Dispatch: Pallas on TPU-compatible shapes, jnp reference otherwise."""
    S, C = b.shape
    if use_pallas and S % 256 == 0 and C % 512 == 0:
        return top2_rows_pallas(b, p)
    return top2_rows_ref(b, p)
