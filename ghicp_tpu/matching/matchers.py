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

Array = jax.Array


class MatchResult(NamedTuple):
    tgt_idx: Array   # [S] int32
    w: Array         # [S] float32 1/0
    n_matches: Array # scalar int32


def nn_match(cd: Array, penalty: Array, mask_s: Array,
             mask_t: Array) -> MatchResult:
    """Closest target per source, kept only if below the penalty gate
    (ghicp_reg.cpp:700-769)."""
    j = jnp.argmin(cd, axis=1).astype(jnp.int32)
    mincd = jnp.min(cd, axis=1)
    w = (mask_s & (mincd < penalty)).astype(jnp.float32)
    return MatchResult(tgt_idx=j, w=w,
                       n_matches=jnp.sum(w).astype(jnp.int32))


def nnr_match(cd: Array, mask_s: Array, mask_t: Array) -> MatchResult:
    """Reciprocal nearest neighbors, no gate (ghicp_reg.cpp:605-698)."""
    sv = jnp.argmin(cd, axis=1).astype(jnp.int32)   # [S] best target per src
    tv = jnp.argmin(cd, axis=0).astype(jnp.int32)   # [T] best source per tgt
    rows = jnp.arange(cd.shape[0], dtype=jnp.int32)
    mutual = tv[sv] == rows
    # Rows whose entire cost row is +inf (padding) pick arbitrary argmin;
    # guard with validity of the chosen pair.
    ok = mask_s & mutual & jnp.isfinite(jnp.min(cd, axis=1))
    w = ok.astype(jnp.float32)
    return MatchResult(tgt_idx=sv, w=w,
                       n_matches=jnp.sum(w).astype(jnp.int32))
