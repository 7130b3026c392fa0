"""Cost-matrix construction: ED, FD blending, penalty schedule.

TPU-native equivalents of the Energyfunction passes (reference
``src/ghicp_reg.cpp:114-341``).  Each is a masked dense [S, T] computation:

* ``euclidean_matrix`` — ED[i,j] = scale * ||s_i - t_j||, one MXU matmul
  (ghicp_reg.cpp:114-139; scale = 0.005*bbx_magnitude, ghicp_reg.h:40).
* ``blend_none`` — CD = ED; penalty = max(CDmean, 1.0).  The reference
  computes an RMS-based penalty first and then unconditionally overwrites it
  (ghicp_reg.cpp:230-239); we keep the effective behavior.
* ``blend_bsc`` — CD = WED*ED + WFD*FD with WFD = exp(-iter/rate)
  (ghicp_reg.cpp:245-293); penalty from (CDmean, CDstd) on the first two
  iterations, then RMS/FDM/FDstd-driven; floor 5.0.
* ``blend_fpfh`` — CD = ED / FD^(1/(iter+1)) with FD a similarity in (0,1]
  (ghicp_reg.cpp:295-341).

Masked pairs (padding rows/cols) get CD = +inf so every downstream consumer
(NN gate, reciprocal test, auction benefit floor) rejects them naturally.
All statistics (mean/std) are over valid pairs only — the reference has no
padding so this is the faithful generalization.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ghicp_tpu.core.comm import LOCAL, Comm

Array = jax.Array

_HI = jax.lax.Precision.HIGHEST


class CostResult(NamedTuple):
    cd: Array        # [S, T] blended cost, +inf at invalid pairs
    penalty: Array   # scalar penalty (outlier gate)
    cd_mean: Array   # scalar, over valid pairs
    cd_std: Array    # scalar, over valid pairs


def euclidean_matrix(src: Array, tgt: Array, scale: Array) -> Array:
    """ED[i, j] = scale * ||src_i - tgt_j||  (ghicp_reg.cpp:122)."""
    s2 = jnp.sum(src * src, axis=-1)
    t2 = jnp.sum(tgt * tgt, axis=-1)
    st = jnp.matmul(src, tgt.T, precision=_HI)
    d2 = jnp.maximum(s2[:, None] + t2[None, :] - 2.0 * st, 0.0)
    return scale * jnp.sqrt(d2)


def _pair_mask(mask_s: Array, mask_t: Array) -> Array:
    return mask_s[:, None] & mask_t[None, :]


def _masked_stats(x: Array, m: Array, comm: Comm = LOCAL):
    """Global mean/std over valid pairs; one psum pair when row-sharded."""
    mf = m.astype(jnp.float32)
    n = jnp.maximum(comm.psum(jnp.sum(mf)), 1.0)
    s1 = comm.psum(jnp.sum(jnp.where(m, x, 0.0)))
    s2 = comm.psum(jnp.sum(jnp.where(m, x * x, 0.0)))
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    return mean, jnp.sqrt(var)


def blend_none(ed: Array, mask_s: Array, mask_t: Array,
               comm: Comm = LOCAL) -> CostResult:
    """No-feature cost (ghicp_reg.cpp:216-243)."""
    m = _pair_mask(mask_s, mask_t)
    mean, std = _masked_stats(ed, m, comm)
    penalty = jnp.maximum(mean, 1.0)
    cd = jnp.where(m, ed, jnp.inf)
    return CostResult(cd=cd, penalty=penalty, cd_mean=mean, cd_std=std)


def bsc_penalty(mean: Array, std: Array, iteration: Array, rms: Array,
                fdm: Array, fdstd: Array, para1: Array, para2: Array,
                scale: Array, wed: Array, wfd: Array,
                penalty_initial: float) -> Array:
    """BSC penalty schedule from CD statistics (ghicp_reg.cpp:279-293);
    shared by the XLA blend and the fused cost kernel path."""
    pen_late = rms * para1 * scale * wed + (fdm + para2 * fdstd) * wfd
    pen_early = mean - penalty_initial * std
    penalty = jnp.where(iteration > 1, pen_late, pen_early)
    return jnp.maximum(penalty, 5.0)


def blend_bsc(ed: Array, fd: Array, mask_s: Array, mask_t: Array,
              iteration: Array, rms: Array, fdm: Array, fdstd: Array,
              para1: Array, para2: Array, scale: Array,
              weight_changing_rate: float, penalty_initial: float,
              comm: Comm = LOCAL) -> CostResult:
    """Hybrid BSC cost + penalty schedule (ghicp_reg.cpp:245-293)."""
    m = _pair_mask(mask_s, mask_t)
    wfd = jnp.exp(-iteration.astype(jnp.float32) / weight_changing_rate)
    wed = 1.0 - wfd
    cd = wed * ed + wfd * fd
    mean, std = _masked_stats(cd, m, comm)
    penalty = bsc_penalty(mean, std, iteration, rms, fdm, fdstd,
                          para1, para2, scale, wed, wfd, penalty_initial)
    return CostResult(cd=jnp.where(m, cd, jnp.inf), penalty=penalty,
                      cd_mean=mean, cd_std=std)


def blend_fpfh(ed: Array, fd_sim: Array, mask_s: Array, mask_t: Array,
               iteration: Array, rms: Array, para1: Array, para2: Array,
               scale: Array, penalty_initial: float,
               comm: Comm = LOCAL) -> CostResult:
    """FPFH cost CD = ED / FD^(1/(iter+1)) (ghicp_reg.cpp:295-341).

    FD here is a *similarity* in (0, 1]; small floor avoids division blowup
    for totally-dissimilar histograms.
    """
    m = _pair_mask(mask_s, mask_t)
    k = 1.0 / (iteration.astype(jnp.float32) + 1.0)
    cd = ed / jnp.power(jnp.maximum(fd_sim, 1e-6), k)
    mean, std = _masked_stats(cd, m, comm)
    pen_late = rms * para1 * scale * para2
    pen_early = mean / penalty_initial
    penalty = jnp.where(iteration > 1, pen_late, pen_early)
    return CostResult(cd=jnp.where(m, cd, jnp.inf), penalty=penalty,
                      cd_mean=mean, cd_std=std)
