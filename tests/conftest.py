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
