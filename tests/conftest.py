"""Test harness config: force CPU with 8 virtual devices so pjit/collective
tests run without TPU hardware (the JAX-native fake backend, SURVEY.md §4).

The hosting environment pins JAX_PLATFORMS to a TPU plugin that ignores the
env var, so the platform is forced through jax.config before any backend
initializes. Parity tests need fp32 matmuls — the TPU's default bf16 matmul
precision would swamp the 1e-5 tolerances.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
