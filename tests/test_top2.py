"""Parity test for the Pallas fused top-2 kernel (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np

from ghicp_tpu.ops.top2 import top2_rows_pallas, top2_rows_ref


def test_top2_pallas_matches_reference():
    from jax.experimental.pallas import tpu as pltpu
    rng = np.random.default_rng(0)
    S, C = 512, 1024
    b = rng.normal(size=(S, C)).astype(np.float32) * 10
    # Plant exact ties to check tie-breaking (first/lowest column wins).
    b[7, 100] = b[7, 900] = b[7].max() + 5
    p = rng.normal(size=(C,)).astype(np.float32)
    p[100] = p[900] = 0.0  # keep the tie exact in (b - p) space
    v1r, j1r, v2r = top2_rows_ref(jnp.asarray(b), jnp.asarray(p))
    with pltpu.force_tpu_interpret_mode():
        v1p, j1p, v2p = top2_rows_pallas(jnp.asarray(b), jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(v1p), np.asarray(v1r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v2p), np.asarray(v2r), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(j1p), np.asarray(j1r))
    assert int(j1p[7]) == 100
