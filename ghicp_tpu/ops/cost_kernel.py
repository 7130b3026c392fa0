"""Fused cost->benefit kernel: ED + blend + stats in ONE sweep.

Per GH-ICP iteration the XLA path materializes the full [S, C] Euclidean
matrix, the blended CD, the penalty gate and the bf16 benefit matrix as
separate HBM tensors (~1.9GB of traffic at 8192^2, reference passes
ghicp_reg.cpp:114-341).  This kernel fuses them: per row tile it computes
ED on the MXU from the keypoint coordinates ([ts,3] @ [3,C] cross term),
blends with the streamed bf16 FD stripe, and emits

  b = -(W_ED * ED + W_FD * FD)        (bf16; -inf at masked pairs)

plus per-tile partial sums (count, sum, sum^2, max of CD over valid pairs)
for the penalty schedule and the epsilon spread.  HBM traffic drops to one
FD read + one b write (~268MB).

The penalty gate needs NO mask tensor: KM's "pair is real iff CD < penalty"
(ghicp_reg.cpp:348-365) is exactly "benefit > sink" with sink = -penalty,
which the auction's outside-option test already applies to every bid and
the greedy completion to every leftover row — so the benefit matrix alone
carries the gate.

Numerics: callers should center both keypoint sets by a common offset
(distances are translation-invariant) so the |x|^2 norms stay O(extent^2/4)
and the norm-expansion cancellation keeps ED accurate in f32.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG = -3.0e38


def _kernel(scal_ref, kps_ref, kpt_ref, fd_ref, ms_ref, mt_ref, p_ref,
            ac_ref, b_out, part_out, v1_out, vsel_out, *, ts: int,
            mult_blend: bool, with_stats: bool = True):
    i = pl.program_id(0)
    wed = scal_ref[0]
    wfd = scal_ref[1]
    scale = scal_ref[2]

    @pl.when(i == 0)
    def _init():
        # Stats accumulate directly into the (whole-array, sequential-grid)
        # output block; cd/ed are nonnegative so 0 is a valid max identity
        # for rows 0-4.  Row 5 accumulates max(-cd) and needs -inf.
        part_out[:, :] = jnp.zeros_like(part_out)
        part_out[5, :] = jnp.full_like(part_out[5, :], _NEG)
    s = kps_ref[:, :]                                    # [ts, 8]
    t = kpt_ref[:, :]                                    # [C, 8]
    d = jax.lax.dot_general(s, t, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    s2 = jnp.sum(s * s, axis=1)
    t2 = jnp.sum(t * t, axis=1)
    d2 = jnp.maximum(s2[:, None] + t2[None, :] - 2.0 * d, 0.0)
    ed = scale * jnp.sqrt(d2)
    if mult_blend:
        # FPFH/RoPS lane (ghicp_reg.cpp:295-341): fd is a similarity in
        # (0, 1]; cd = ed / fd^k with k passed in the wfd slot.
        fdv = jnp.maximum(fd_ref[:, :].astype(jnp.float32), 1e-6)
        cd = ed * jnp.exp(-wfd * jnp.log(fdv))
    else:
        cd = wed * ed + wfd * fd_ref[:, :].astype(jnp.float32)
    # (i1 cannot grow a minor dim in Mosaic — grow the int32 mask instead.)
    m = (ms_ref[i, :][:, None] > 0) & (mt_ref[0, :][None, :] > 0)
    b = jnp.where(m, -cd, _NEG)
    b_out[:, :] = b.astype(b_out.dtype)
    # Warm-start CS hints in the same sweep (the auction's keep test
    # otherwise costs a second full-matrix pass):
    #   v1   = per-row max of (b - p)   over the deflated prices,
    #   vsel = the kept column's (b - p) via a one-hot masked max
    #          (-inf when the row has no kept column: acol0 < 0 or >= C
    #          never matches a real column id).
    v = b - p_ref[0, :][None, :]
    v1_out[i, :] = jnp.max(v, axis=1)
    acv = ac_ref[i, :]
    cols = jax.lax.broadcasted_iota(jnp.int32, (ts, v.shape[1]), 1)
    keep_oh = cols == jnp.where((acv >= 0) & (acv < v.shape[1]), acv, -1)[
        :, None]
    vsel_out[i, :] = jnp.max(jnp.where(keep_oh, v, _NEG), axis=1)
    # (Scalar VMEM stores are unsupported — each stat occupies a full
    # broadcast row of the [8, 128] accumulator; callers read lane 0.)
    if with_stats:
        # Penalty-schedule statistics — only consumed while the schedule
        # is in its CD-stats phase (iterations 0-1, ghicp_reg.cpp:279-293);
        # the stats-free variant skips these ~5 VPU passes per tile.
        cnt = jnp.sum(m.astype(jnp.float32))
        cdm = jnp.where(m, cd, 0.0)
        part_out[0, :] = part_out[0, :] + cnt
        part_out[1, :] = part_out[1, :] + jnp.sum(cdm)
        part_out[2, :] = part_out[2, :] + jnp.sum(cdm * cd)
        part_out[3, :] = jnp.maximum(part_out[3, :], jnp.max(cdm))
    part_out[4, :] = jnp.maximum(part_out[4, :],
                                 jnp.max(jnp.where(m, ed, 0.0)))
    # cd_min over valid pairs (negated so the zero-initialized accumulator
    # is a valid identity): the auction derives its epsilon spread as
    # penalty - cd_min without another full-matrix pass.
    part_out[5, :] = jnp.maximum(part_out[5, :],
                                 jnp.max(jnp.where(m, -cd, _NEG)))


@functools.partial(jax.jit, static_argnames=("ts", "interpret", "out_dtype",
                                             "mult_blend", "with_stats"))
def fused_benefit(kp_s: Array, kp_t: Array, fd: Array, mask_s: Array,
                  mask_t: Array, wed, wfd, scale, ts: int = 256,
                  interpret: bool = False, out_dtype=jnp.bfloat16,
                  p_defl: Optional[Array] = None,
                  acol0: Optional[Array] = None,
                  mult_blend: bool = False, with_stats: bool = True):
    """One-sweep benefit matrix + CD statistics + warm-start CS hints.

    kp_s [S,3], kp_t [C,3] f32 (center them by a common offset first);
    fd [S,C] (bf16 or f32); masks bool.  Returns (b [S,C] ``out_dtype``,
    cd_count, cd_sum, cd_sumsq, cd_max, ed_max, b_max, v1 [S], vsel [S])
    with stats over valid pairs (b_max = -cd_min feeds the auction's
    epsilon spread).  ``p_defl`` [C] (deflated, owner-zeroed prices) and
    ``acol0`` [S] (previous assignment) feed the hint outputs
    v1 = rowmax(b - p_defl) and vsel = (b - p_defl) at the kept column
    (-inf where acol0 is not a real column) — the auction's warm-start
    keep test then needs no second full-matrix pass.  Hints are computed
    from the f32 benefits (pre ``out_dtype`` quantization); the bf16
    error (~2^-8 relative) sits far below the rel_eps floor the epsilon
    bound already tolerates.  ``mult_blend`` switches the CD formula to
    the FPFH/RoPS lane ``ed / max(fd, 1e-6)^k`` with the exponent k
    passed in the ``wfd`` slot, ``wed`` unused (ghicp_reg.cpp:295-341).
    S % ts == 0; C % 128 == 0.
    """
    S, C = fd.shape
    n_tiles = S // ts
    kps8 = jnp.pad(kp_s, ((0, 0), (0, 5)))
    kpt8 = jnp.pad(kp_t, ((0, 0), (0, 5)))
    scal = jnp.stack([jnp.asarray(wed, jnp.float32),
                      jnp.asarray(wfd, jnp.float32),
                      jnp.asarray(scale, jnp.float32)])
    if p_defl is None:
        p_defl = jnp.zeros((C,), jnp.float32)
    if acol0 is None:
        acol0 = jnp.full((S,), -1, jnp.int32)
    b_spec = pl.BlockSpec((ts, C), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    b_shape = jax.ShapeDtypeStruct((S, C), out_dtype)
    b, parts, v1, vsel = pl.pallas_call(
        functools.partial(_kernel, ts=ts, mult_blend=mult_blend,
                          with_stats=with_stats),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # scalars [3]
            pl.BlockSpec((ts, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # kp_s tile
            pl.BlockSpec((C, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),              # kp_t full
            pl.BlockSpec((ts, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # fd stripe
            pl.BlockSpec((n_tiles, ts), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),              # mask_s i32
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),              # mask_t i32
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),              # p_defl
            pl.BlockSpec((n_tiles, ts), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),              # acol0 i32
        ],
        out_specs=(
            b_spec,
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, ts), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, ts), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            b_shape,
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, ts), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, ts), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            # Pipelined fd/b stripes + the f32 ed/cd intermediates peak
            # ~27MB at ts=128, C=8192; physical VMEM is far larger than
            # the default scoped soft cap.
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(scal, kps8, kpt8, fd,
      mask_s.astype(jnp.int32).reshape(n_tiles, ts),
      mask_t.astype(jnp.int32).reshape(1, C),
      p_defl.reshape(1, C), acol0.astype(jnp.int32).reshape(n_tiles, ts))
    return (b, parts[0, 0], parts[1, 0], parts[2, 0],
            parts[3, 0], parts[4, 0], parts[5, 0],
      v1.reshape(S), vsel.reshape(S))


def fused_benefit_ref(kp_s, kp_t, fd, mask_s, mask_t, wed, wfd, scale,
                      out_dtype=jnp.bfloat16, p_defl=None, acol0=None,
                      mult_blend=False):
    """jnp reference (parity tests; same norm-expansion ED path)."""
    S, C = fd.shape
    d = jnp.matmul(kp_s, kp_t.T, precision=jax.lax.Precision.HIGHEST)
    s2 = jnp.sum(kp_s * kp_s, axis=1)
    t2 = jnp.sum(kp_t * kp_t, axis=1)
    d2 = jnp.maximum(s2[:, None] + t2[None, :] - 2.0 * d, 0.0)
    ed = jnp.asarray(scale, jnp.float32) * jnp.sqrt(d2)
    if mult_blend:
        cd = ed * jnp.exp(-wfd * jnp.log(
            jnp.maximum(fd.astype(jnp.float32), 1e-6)))
    else:
        cd = wed * ed + wfd * fd.astype(jnp.float32)
    m = mask_s[:, None] & mask_t[None, :]
    bf = jnp.where(m, -cd, _NEG)
    b = bf.astype(out_dtype)
    mf = m.astype(jnp.float32)
    if p_defl is None:
        p_defl = jnp.zeros((C,), jnp.float32)
    if acol0 is None:
        acol0 = jnp.full((S,), -1, jnp.int32)
    v = bf - p_defl[None, :]
    v1 = jnp.max(v, axis=1)
    real0 = (acol0 >= 0) & (acol0 < C)
    vsel = jnp.where(real0, v[jnp.arange(S), jnp.where(real0, acol0, 0)],
                     _NEG)
    return (b, jnp.sum(mf), jnp.sum(jnp.where(m, cd, 0.0)),
            jnp.sum(jnp.where(m, cd * cd, 0.0)),
            jnp.max(jnp.where(m, cd, 0.0)),
            jnp.max(jnp.where(m, ed, 0.0)),
            jnp.max(jnp.where(m, -cd, _NEG)), v1, vsel)
