"""Test configuration: force an 8-device virtual CPU mesh for all tests.

Multi-chip sharding logic is validated on virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), an option the torch
reference never had (SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Parity tests against the torch reference need true fp32 matmuls/convs;
# the platform default is bf16-accumulated.
jax.config.update("jax_default_matmul_precision", "highest")
