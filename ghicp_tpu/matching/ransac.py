"""Feature-guided RANSAC coarse alignment (TPU-parallel hypothesis sweep).

The reference ships SAC-IA coarse registration over FPFH features
(``Coarsereg_FPFHSAC``, src/common_reg.cpp:392-423) as its answer to "the
iterative loop needs a sane starting pose".  This is the TPU-native
equivalent, generalized to any feature-distance matrix (BSC Hamming or FPFH
similarity): instead of SAC-IA's serial sample loop, ALL hypotheses are
evaluated at once as one batched tensor program —

1. candidates: top-C feature-nearest target keypoints per source keypoint;
2. hypotheses: H random triples of candidate pairs (vectorized PRNG draw);
3. rigidity prefilter: a triple is worthless unless its pairwise source
   distances match its pairwise target distances (|d_s - d_t| < tau) — this
   multiplies the effective inlier rate by orders of magnitude;
4. solve: closed-form 3-point Umeyama per hypothesis (vmapped Kabsch on the
   MXU);
5. score: every hypothesis transform is applied to every candidate pair
   origin and scored by inliers within ``tau`` (one [H, M] distance sweep);
6. polish: the best hypothesis is re-estimated from its full inlier set a
   few times (IRLS-free consensus refit).

At feature inlier rates as low as 1-2% (noise-degraded descriptors on
repeated structure) a CPU SAC loop would need ~1e6 iterations and minutes;
the dense sweep is a few hundred ms on one chip.  Success is data-dependent:
the caller treats the returned inlier count as a confidence signal.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ghicp_tpu.core import transform as tf

Array = jax.Array


class RansacResult(NamedTuple):
    transform: Array   # [4,4] best source -> target rigid transform
    inliers: Array     # scalar int32: consensus size of the best hypothesis
    n_candidates: Array  # scalar int32: candidate pairs scored against


def _rigid_from_cross(M: Array, cs: Array, cd: Array) -> Array:
    """Batched rigid transforms from weighted cross-covariances.

    M: [H,3,3] cross-covariance sum_k w_k x_k y_k^T on centered points;
    cs/cd: [H,3] centroids.  Horn's quaternion method with power iteration
    for the dominant eigenvector — a batched ``jnp.linalg.svd`` on [H,3,3]
    lowers to a QR custom call whose scoped VMEM explodes at H ~ 1e5; the
    4x4 power iteration is plain batched matmuls.
    """
    # Horn's 4x4 N matrix
    Sxx, Sxy, Sxz = M[:, 0, 0], M[:, 0, 1], M[:, 0, 2]
    Syx, Syy, Syz = M[:, 1, 0], M[:, 1, 1], M[:, 1, 2]
    Szx, Szy, Szz = M[:, 2, 0], M[:, 2, 1], M[:, 2, 2]
    N = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
        jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
    ], axis=1)                                            # [H,4,4]
    # shift to make the dominant eigenvalue the largest in magnitude
    shift = jnp.sum(jnp.abs(M), axis=(1, 2)) + 1e-6       # [H]
    Ns = N + shift[:, None, None] * jnp.eye(4, dtype=N.dtype)
    q = jnp.ones((N.shape[0], 4), N.dtype)

    def it(q, _):
        q = jnp.einsum("hij,hj->hi", Ns, q)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-20)
        return q, 0

    q, _ = jax.lax.scan(it, q, jnp.arange(30))
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], axis=1)                                            # [H,3,3]
    t = cd - jnp.einsum("hij,hj->hi", R, cs)
    T = jnp.tile(jnp.eye(4, dtype=R.dtype), (R.shape[0], 1, 1))
    T = T.at[:, :3, :3].set(R).at[:, :3, 3].set(t)
    return T


def _rigid_from_triples(src: Array, dst: Array) -> Array:
    """Batched rigid transforms from 3-point sets ([H,3,3] -> [H,4,4])."""
    cs = jnp.mean(src, axis=1)                            # [H,3]
    cd = jnp.mean(dst, axis=1)
    X = src - cs[:, None]
    Y = dst - cd[:, None]
    M = jnp.einsum("hki,hkj->hij", X, Y)
    return _rigid_from_cross(M, cs, cd)


@functools.partial(jax.jit, static_argnames=("n_hyp", "n_cand", "seed"))
def ransac_coarse_align(kp_s: Array, mask_s: Array, kp_t: Array,
                        mask_t: Array, fd: Array | None, tau: float,
                        n_hyp: int = 1 << 17, n_cand: int = 2,
                        seed: int = 0, frames_s: Array | None = None,
                        frames_t: Array | None = None,
                        cand: Array | None = None,
                        cand_ok: Array | None = None) -> RansacResult:
    """Estimate a coarse rigid transform from feature correspondences.

    kp_s/kp_t: [S,3]/[T,3] keypoints; fd: [S,T] feature DISTANCE (smaller =
    more similar; +inf/large at invalid pairs works).  ``tau``: inlier
    radius in meters (~2-3 voxels).  Returns the best transform and its
    consensus size.

    ``frames_s``/``frames_t`` ([S,3,3]/[T,3,3], rows = LCS axes from
    :func:`ghicp_tpu.features.bsc.bsc_frames`): enables EXHAUSTIVE
    single-correspondence hypotheses — one candidate pair plus its two
    local frames fixes a full 6-DoF pose (T_R = Rt^T D Rs over the 4 PCA
    sign classes D).  At low candidate precision (~1-2% true pairs) random
    triples need a lucky draw (p^3); the frame hypotheses enumerate every
    candidate pair once, so every true pair votes regardless of luck.
    """
    S = kp_s.shape[0]
    big = jnp.float32(3.0e38)
    if cand is None:
        # top-C candidates per source row (feature-nearest targets) from
        # the dense FD matrix; the streaming pipeline passes precomputed
        # (cand, cand_ok) from stream_feature_candidates instead.
        fdm = jnp.where(mask_s[:, None] & mask_t[None, :], fd, big)
        neg, cand = jax.lax.top_k(-fdm, n_cand)         # [S, C]
        cand_ok = (-neg < big) & mask_s[:, None]        # [S, C]
    else:
        n_cand = cand.shape[1]
    # Candidate pair list for scoring: ALL n_cand feature-nearest targets
    # per source row.  Scoring against only the top-1 candidate collapses
    # at sparse keypoint counts (true counterparts rarely rank first when
    # descriptor noise rivals the inter-keypoint feature margins — at the
    # bench's NMS-1.0 verdict config the top-1 true-pair count is below
    # the wrong-pose noise floor and RANSAC returned garbage, round-5
    # diagnosis); under ANY true pose the counterpart is within tau no
    # matter its feature rank, so the any-candidate test recovers every
    # candidate-listed true pair as a vote.
    src_pts = kp_s                                       # [S, 3]
    dst_all = kp_t[cand]                                 # [S, C, 3]
    pair_ok = cand_ok[:, 0]
    row_ok = jnp.any(cand_ok, axis=1)

    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    rows = jax.random.randint(k1, (n_hyp, 3), 0, S)      # [H, 3]
    # Triples draw from the TOP-2 candidates only: a random triple is true
    # with probability p^3, and candidate precision decays with feature
    # rank, so widening the triple pool to all n_cand candidates DILUTES
    # hypothesis generation (measured: RoPS, which has no frame
    # hypotheses to fall back on, dropped from 90 consensus inliers to 2
    # when triples sampled 4 candidates).  The any-candidate CONSENSUS
    # SCORING below still benefits from the full candidate list.
    cols = jax.random.randint(k2, (n_hyp, 3), 0, min(2, n_cand))

    s3 = kp_s[rows]                                      # [H, 3, 3]
    tgt_idx = cand[rows, cols]                           # [H, 3]
    t3 = kp_t[tgt_idx]                                   # [H, 3, 3]
    ok3 = jnp.all(cand_ok[rows, cols], axis=1)
    ok3 &= (rows[:, 0] != rows[:, 1]) & (rows[:, 0] != rows[:, 2]) \
        & (rows[:, 1] != rows[:, 2])

    # rigidity prefilter: pairwise length preservation within 2*tau
    def plen(p):
        return jnp.stack([
            jnp.linalg.norm(p[:, 0] - p[:, 1], axis=-1),
            jnp.linalg.norm(p[:, 0] - p[:, 2], axis=-1),
            jnp.linalg.norm(p[:, 1] - p[:, 2], axis=-1)], axis=1)
    rig = jnp.all(jnp.abs(plen(s3) - plen(t3)) < 2.0 * tau, axis=1)
    # degenerate (near-collinear) triples solve badly: require triangle
    # height above tau
    e1 = s3[:, 1] - s3[:, 0]
    e2 = s3[:, 2] - s3[:, 0]
    area2 = jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)
    base = jnp.maximum(jnp.linalg.norm(e1, axis=-1), 1e-6)
    nondeg = (area2 / base) > tau
    ok3 &= rig & nondeg

    Ts = _rigid_from_triples(s3, t3)                     # [H, 4, 4]

    if frames_s is not None and frames_t is not None:
        # Frame hypotheses: all (source row, candidate, sign-class) poses.
        # rows of frames = axes; local = R (x - kp)  =>  aligning local
        # geometries gives R_hyp = Rt^T D Rs, t = kp_t - R_hyp kp_s.
        Dm = jnp.asarray(np.stack([np.diag(d).astype(np.float32) for d in
                                   ((1, 1, 1), (-1, -1, 1),
                                    (1, -1, -1), (-1, 1, -1))]))  # [4,3,3]
        Rs = frames_s                                    # [S,3,3]
        Rt_sel = frames_t[cand]                          # [S,C,3,3]
        # [S,C,4,3,3] = Rt^T @ D @ Rs
        Rh = jnp.einsum("scji,vjk,skl->scvil", Rt_sel, Dm, Rs)
        th = kp_t[cand][:, :, None, :] - jnp.einsum(
            "scvij,sj->scvi", Rh, kp_s)                  # [S,C,4,3]
        HF = S * n_cand * 4
        Tf = jnp.zeros((HF, 4, 4), jnp.float32)
        Tf = Tf.at[:, :3, :3].set(Rh.reshape(HF, 3, 3))
        Tf = Tf.at[:, :3, 3].set(th.reshape(HF, 3))
        Tf = Tf.at[:, 3, 3].set(1.0)
        okf = jnp.repeat(cand_ok.reshape(-1), 4)
        Ts = jnp.concatenate([Ts, Tf], axis=0)
        ok3 = jnp.concatenate([ok3, okf], axis=0)
    # Pad the hypothesis list to a whole number of scoring chunks (also
    # covers n_hyp below one chunk, e.g. reduced sweeps on CPU).
    pad = (-Ts.shape[0]) % 8192
    if pad:
        Ts = jnp.pad(Ts, ((0, pad), (0, 0), (0, 0)))
        ok3 = jnp.pad(ok3, (0, pad))
    n_total = Ts.shape[0]

    # score on a fixed subsample of the candidate pair list (the full list
    # would be [H, S] ~ GBs; the consensus signal survives subsampling) —
    # hypotheses swept in chunks to bound the [chunk, M] intermediate.
    M = min(2048, S)
    k3, _ = jax.random.split(k2)
    sub = jax.random.permutation(k3, S)[:M]
    sub_src = src_pts[sub]                               # [M, 3]
    sub_dst = dst_all[sub]                               # [M, C, 3]
    sub_cok = cand_ok[sub]                               # [M, C]
    sub_ok = row_ok[sub]

    chunk = 8192

    def score_chunk(_, Tc):
        R = Tc[:, :3, :3]
        tr = Tc[:, :3, 3]
        proj = jnp.einsum("hij,mj->hmi", R, sub_src) + tr[:, None, :]
        # nearest candidate per (hypothesis, row), unrolled over the small
        # static candidate axis (a [h, M, C, 3] broadcast would be GBs)
        d2 = jnp.float32(3.0e38)
        for c in range(n_cand):
            d2c = jnp.sum((proj - sub_dst[None, :, c, :]) ** 2, axis=-1)
            d2 = jnp.minimum(d2, jnp.where(sub_cok[None, :, c], d2c, 3.0e38))
        tc = 2.0 * tau
        inl = (d2 < tc * tc) & sub_ok[None, :]
        return 0, jnp.sum(inl, axis=1)

    _, scores = jax.lax.scan(score_chunk,
                             0, Ts.reshape(n_total // chunk, chunk, 4, 4))
    # Coarse-tau sweep tolerates hypothesis sloppiness (frame noise rotates
    # a single-pair pose by ~5-15 deg); the polish stage tightens.
    score = jnp.where(ok3, scores.reshape(n_total), 0)

    # top-K polish: refit each finalist on its inliers with widening-then-
    # tightening tau, then pick the best final consensus.
    K = 64
    _, top_idx = jax.lax.top_k(score, K)
    Tk = Ts[top_idx]                                     # [K,4,4]

    def _nearest(p, dst, cok):
        """Per row: nearest valid candidate target under the current pose.
        p [..., M, 3]; dst [M, C, 3]; cok [M, C] -> (d2 [..., M],
        dst_sel [..., M, 3]).  Unrolled over the small static candidate
        axis (a broadcast [.., M, C, 3] intermediate would be GBs)."""
        d2 = None
        dst_sel = None
        for c in range(n_cand):
            d2c = jnp.sum((p - dst[:, c, :]) ** 2, axis=-1)
            d2c = jnp.where(cok[:, c], d2c, 3.0e38)
            if d2 is None:
                d2 = d2c
                dst_sel = jnp.broadcast_to(dst[:, c, :], p.shape)
            else:
                better = d2c < d2
                dst_sel = jnp.where(better[..., None], dst[:, c, :],
                                    dst_sel)
                d2 = jnp.minimum(d2, d2c)
        return d2, dst_sel

    def refit(Tc, tau_r):
        p = jnp.einsum("kij,mj->kmi", Tc[:, :3, :3], sub_src) \
            + Tc[:, :3, 3][:, None, :]
        d2, dst_sel = _nearest(p, sub_dst, sub_cok)       # [K,M], [K,M,3]
        w = ((d2 < tau_r * tau_r) & sub_ok[None]).astype(jnp.float32)
        # batched weighted Horn refit
        wsum = jnp.maximum(jnp.sum(w, 1, keepdims=True), 1e-6)
        cs = jnp.einsum("km,mi->ki", w, sub_src) / wsum
        cd = jnp.einsum("km,kmi->ki", w, dst_sel) / wsum
        X = sub_src[None] - cs[:, None]
        Y = dst_sel - cd[:, None]
        return _rigid_from_cross(
            jnp.einsum("km,kmi,kmj->kij", w, X, Y), cs, cd)

    for tau_r in (3.0 * tau, 1.5 * tau, tau):
        Tk = refit(Tk, tau_r)

    pk = jnp.einsum("kij,mj->kmi", Tk[:, :3, :3], sub_src) \
        + Tk[:, :3, 3][:, None, :]
    d2k, _ = _nearest(pk, sub_dst, sub_cok)
    inl_k = jnp.sum(((d2k < tau * tau)
                     & sub_ok[None]).astype(jnp.int32), axis=1)
    kbest = jnp.argmax(inl_k)
    T_best = Tk[kbest]

    # final polish over the FULL candidate pair list
    from ghicp_tpu.registration.estimator import kabsch_6dof

    def polish(T_cur, _):
        p = tf.apply(T_cur, src_pts)
        d2, dst_sel = _nearest(p, dst_all, cand_ok)
        w = ((d2 < tau * tau) & row_ok).astype(jnp.float32)
        return kabsch_6dof(src_pts, dst_sel, w), 0

    T_best, _ = jax.lax.scan(polish, T_best, jnp.arange(2))
    p = tf.apply(T_best, src_pts)
    d2f, _ = _nearest(p, dst_all, cand_ok)
    final_inl = jnp.sum(((d2f < tau * tau)
                         & row_ok).astype(jnp.int32))
    return RansacResult(transform=T_best, inliers=final_inl,
                        n_candidates=jnp.sum(pair_ok.astype(jnp.int32)))
