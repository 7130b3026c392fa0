"""Hamming distance matrices between packed binary features.

TPU-native replacement for the XOR + 256-entry popcount LUT loop of the
reference (``src/stereo_binary_feature.cpp:16-104``) applied across all
source x target keypoint pairs (``src/ghicp_reg.cpp:174-187``).

Two interchangeable paths:

* ``hamming_matrix_popcount`` — uint32 XOR + ``jax.lax.population_count``,
  tiled over source blocks (VPU path; exact, memory-light).
* ``hamming_matrix_mxu`` — the MXU path: with a, b in {0,1}^n,
  ``ham(a,b) = |a| + |b| - 2 a.b``, so the whole distance matrix is one
  [S,n]x[n,T] matmul on the systolic array plus rank-1 corrections.  Inputs
  are exact small integers, accumulated in float32, so the result is exact.

``min_hamming_fd`` builds the GH-ICP feature-distance matrix: minimum over
the source's flipped-LCS variants vs the target's single variant
(ghicp_reg.cpp:174-187).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ghicp_tpu.features.bsc import unpack_bits

Array = jax.Array


def hamming_matrix_popcount(a_packed: Array, b_packed: Array,
                            block: int = 1024) -> Array:
    """[S, T] int32 Hamming distances from [S, W], [T, W] uint32 lanes."""
    S = a_packed.shape[0]
    pad = (-S) % block
    a = jnp.pad(a_packed, ((0, pad), (0, 0)))

    def body(ab):
        x = ab[:, None, :] ^ b_packed[None, :, :]            # [blk, T, W]
        return jnp.sum(jax.lax.population_count(x), axis=-1,
                       dtype=jnp.int32)

    out = jax.lax.map(body, a.reshape(-1, block, a.shape[-1]))
    return out.reshape(-1, b_packed.shape[0])[:S]


def hamming_matrix_mxu(a_packed: Array, b_packed: Array, n_bits: int) -> Array:
    """[S, T] float32 Hamming distances via one MXU matmul."""
    a = unpack_bits(a_packed, n_bits)                        # [S, n] {0,1} f32
    b = unpack_bits(b_packed, n_bits)
    na = jnp.sum(a, axis=-1)                                 # [S]
    nb = jnp.sum(b, axis=-1)                                 # [T]
    ab = jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [S, T]
    return na[:, None] + nb[None, :] - 2.0 * ab


@functools.partial(jax.jit, static_argnames=("n_bits", "use_mxu"))
def min_hamming_fd(src_packed: Array, tgt_packed: Array, n_bits: int,
                   use_mxu: bool = True) -> Array:
    """FD[i, j] = min over source variants v of ham(src[v, i], tgt[0, j]).

    src_packed: [V, S, W]; tgt_packed: [1 or V', T, W]; target uses only its
    first variant, like the reference (ghicp_reg.cpp:178-186).
    Returns [S, T] float32.
    """
    tgt = tgt_packed[0]

    def per_variant(sv):
        if use_mxu:
            return hamming_matrix_mxu(sv, tgt, n_bits)
        return hamming_matrix_popcount(sv, tgt).astype(jnp.float32)

    fds = jax.vmap(per_variant)(src_packed)                  # [V, S, T]
    return jnp.min(fds, axis=0)
