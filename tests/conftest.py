"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

Note: this container's sitecustomize imports jax and registers the 'axon' TPU
platform before any user code runs, so setting JAX_PLATFORMS via os.environ is
too late — use jax.config.update instead (backends initialize lazily)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

# VPT_TPU_TESTS=1 keeps the real TPU backend (tests/test_golden.py renders
# against the reference goldens on hardware); default is the virtual 8-CPU
# mesh so the suite runs anywhere.
if os.environ.get("VPT_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
