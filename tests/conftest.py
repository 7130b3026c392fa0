"""Test configuration: force CPU backend with 8 virtual devices so sharded
code paths (mesh/pjit/shard_map) are exercised without TPU hardware
(SURVEY.md §4).  Must override, not setdefault: the environment presets
JAX_PLATFORMS=axon (the TPU tunnel)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax before this conftest runs, freezing the
# env-var snapshot — the dynamic config still switches the platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _fresh_engine_jit_caches():
    """ADVICE r4 item 3: the kernel interpret hooks (au._KERNEL_INTERPRET,
    gh._FUSED_INTERPRET, gh._STREAM_INTERPRET) are module globals read at
    trace time, NOT part of the jit cache key — a trace cached by an
    earlier test module under a different hook state is silently reused,
    making knife-edge engine trajectories test-ORDER dependent (observed:
    streaming-vs-dense success flips only in full-suite runs).  Clearing
    the affected jitted entry points per module keeps within-module reuse
    (the expensive compiles) while removing the cross-module leak."""
    from ghicp_tpu.matching import auction as au
    from ghicp_tpu.ops import auction_rounds as ar
    from ghicp_tpu.ops import cost_kernel as ck
    from ghicp_tpu.ops import stream_kernel as sk
    from ghicp_tpu.registration import ghicp as gh
    for fn in (au.auction_match, au.auction_match_benefits,
               gh._ghicp_chunk, gh.ghicp_register, gh._final_resolve_jit,
               gh.ghicp_register_batched, ck.fused_benefit,
               ar.auction_phase_gs_pallas, ar.auction_phase_pallas,
               ar.auction_rounds_pallas, ar.auction_warm_fused_pallas,
               sk.stream_sweep):
        try:
            fn.clear_cache()
        except Exception:
            pass
    yield
