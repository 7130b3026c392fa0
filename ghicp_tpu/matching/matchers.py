"""Nearest-neighbor correspondence matchers (penalty-gated NN, reciprocal NN).

TPU-native equivalents of ``findcorrespondenceNN`` / ``findcorrespondenceNNR``
(reference ``src/ghicp_reg.cpp:700-769`` / ``:605-698``): the reference's
per-row serial scans become masked argmin reductions over the dense cost
matrix.  Both return the same fixed-shape match encoding used throughout the
engine:

  tgt_idx : [S] int32 — matched target per source row (undefined where w = 0)
  w       : [S] float32 — 1.0 for matched rows, 0.0 otherwise
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ghicp_tpu.core.comm import LOCAL, Comm

Array = jax.Array


class MatchResult(NamedTuple):
    tgt_idx: Array   # [S] int32
    w: Array         # [S] float32 1/0
    n_matches: Array # scalar int32


def nn_match(cd: Array, penalty: Array, mask_s: Array, mask_t: Array,
             comm: Comm = LOCAL) -> MatchResult:
    """Closest target per source, kept only if below the penalty gate
    (ghicp_reg.cpp:700-769).  Row-local, so sharding rows is free."""
    j = jnp.argmin(cd, axis=1).astype(jnp.int32)
    mincd = jnp.min(cd, axis=1)
    w = (mask_s & (mincd < penalty)).astype(jnp.float32)
    return MatchResult(tgt_idx=j, w=w,
                       n_matches=comm.psum(jnp.sum(w)).astype(jnp.int32))


def nnr_match(cd: Array, mask_s: Array, mask_t: Array,
              comm: Comm = LOCAL) -> MatchResult:
    """Reciprocal nearest neighbors, no gate (ghicp_reg.cpp:605-698).

    With sharded rows, the per-target column argmin resolves globally via a
    (pmin value, pmax row-id) pair over the mesh axis.
    """
    S = cd.shape[0]
    row_gid = comm.axis_index() * S + jnp.arange(S, dtype=jnp.int32)
    sv = jnp.argmin(cd, axis=1).astype(jnp.int32)   # [S] best target per src
    # Global best source per target column.
    colmin = comm.pmin(jnp.min(cd, axis=0))         # [T]
    at_min = cd == colmin[None, :]
    # Lowest row id at the minimum (the reference's first-hit serial scan,
    # ghicp_reg.cpp:637-646).
    big = jnp.int32(2**30)
    tv_local = jnp.min(jnp.where(at_min, row_gid[:, None], big), axis=0)
    tv = comm.pmin(tv_local)                        # [T] global row id
    mutual = tv[sv] == row_gid
    ok = mask_s & mutual & jnp.isfinite(jnp.min(cd, axis=1))
    w = ok.astype(jnp.float32)
    return MatchResult(tgt_idx=sv, w=w,
                       n_matches=comm.psum(jnp.sum(w)).astype(jnp.int32))
