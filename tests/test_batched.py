"""Batched multi-pair registration: vmapped engine matches per-pair runs."""
import jax.numpy as jnp
import numpy as np
import pytest

from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,
                                   GHICPConfig)
from ghicp_tpu.registration.ghicp import (ghicp_register,
                                          ghicp_register_batched)


def _pair(seed, S=128, T=128):
    rng = np.random.default_rng(seed)
    tgt = rng.uniform(0, 10, (T, 3)).astype(np.float32)
    theta = np.deg2rad(rng.uniform(3, 9))
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], np.float32)
    t = rng.uniform(-0.5, 0.5, 3).astype(np.float32)
    src = ((tgt - t) @ R + rng.normal(0, 0.005, (T, 3))).astype(np.float32)
    return src, tgt


@pytest.mark.parametrize("corr", [CorrespondenceType.NNR,
                                  CorrespondenceType.KM])
def test_batched_matches_sequential(corr):
    cfg = GHICPConfig(feature=FeatureType.NONE, correspondence=corr,
                      estimated_overlap=0.9, max_iterations=10,
                      auction_max_rounds=500)
    pairs = [_pair(s) for s in range(3)]
    kp_s = jnp.asarray(np.stack([p[0] for p in pairs]))
    kp_t = jnp.asarray(np.stack([p[1] for p in pairs]))
    masks = jnp.ones((3, 128), bool)
    fd = jnp.zeros((3, 128, 128), jnp.float32)
    bbx = jnp.full((3,), 30.0, jnp.float32)

    batched = ghicp_register_batched(kp_s, masks, kp_t, masks, fd, bbx, cfg)
    for i in range(3):
        single = ghicp_register(kp_s[i], masks[i], kp_t[i], masks[i],
                                fd[i], bbx[i], cfg)
        np.testing.assert_allclose(np.asarray(batched.transform[i]),
                                   np.asarray(single.transform),
                                   atol=5e-3)
        # Both recover the pair's transform well.
        assert float(batched.final_rmse[i]) < 0.1


def test_batched_sharded_pairs_keep_kernels():
    """ghicp_register_batched_sharded: one pair per device under shard_map,
    Pallas fast paths ON (interpret off-TPU) — matches per-pair single
    runs (VERDICT r3 task 2c: batched layouts must not force the kernels
    off)."""
    import jax

    import ghicp_tpu.registration.ghicp as eng
    from ghicp_tpu.registration.ghicp import ghicp_register_batched_sharded
    from ghicp_tpu.shard.spmd import make_mesh

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    P, S = 8, 128
    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      estimated_overlap=0.9, max_iterations=8,
                      auction_max_rounds=500)
    pairs = [_pair(s, S=S, T=S) for s in range(P)]
    kp_s = jnp.asarray(np.stack([p[0] for p in pairs]))
    kp_t = jnp.asarray(np.stack([p[1] for p in pairs]))
    masks = jnp.ones((P, S), bool)
    rng = np.random.default_rng(7)
    fd = jnp.asarray(rng.integers(0, 200, (P, S, S)).astype(np.float32))
    bbx = jnp.full((P,), 30.0, jnp.float32)

    old_f = eng._FUSED_INTERPRET
    eng._FUSED_INTERPRET = True
    try:
        batched = ghicp_register_batched_sharded(
            kp_s, masks, kp_t, masks, fd, bbx, cfg, make_mesh(8))
        jax.block_until_ready(batched.transform)
        for i in range(P):
            single = ghicp_register(kp_s[i], masks[i], kp_t[i], masks[i],
                                    fd[i], bbx[i], cfg)
            np.testing.assert_allclose(np.asarray(batched.transform[i]),
                                       np.asarray(single.transform),
                                       atol=5e-3)
    finally:
        eng._FUSED_INTERPRET = old_f
