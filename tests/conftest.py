"""Test config: force CPU with 8 virtual devices so sharding tests run
without TPU hardware, and f64 is native (fast + full-precision
transcendentals) for numeric certification.

Note: this environment pre-registers an 'axon' TPU PJRT plugin via
sitecustomize and pins jax_platforms=axon; plain JAX_PLATFORMS env vars are
therefore ineffective here — the jax.config.update below is what actually
selects CPU.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# SLAM_TPU_TESTS=1 skips the CPU pin so the TPU-gated device-path tests
# (test_pallas, test_device_paths, ...) can run on the real chip
if os.environ.get("SLAM_TPU_TESTS", "") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
