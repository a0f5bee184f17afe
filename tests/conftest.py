"""Test configuration: force an 8-device virtual CPU mesh for all tests.

Multi-chip sharding logic is validated on virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), an option the torch
reference never had (SURVEY.md §4).

Note: the environment pins JAX_PLATFORMS to a remote TPU plugin, so the
env var alone is not enough — the platform must be forced through
jax.config before any backend initialises.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Parity tests against the torch reference need true fp32 matmuls/convs;
# the TPU-tunnel default is bf16-accumulated.
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_cpu_jit_accumulation():
    """Drop compiled executables between test modules.

    Very long single-process suite runs have (rarely) segfaulted inside
    XLA:CPU's JIT after hundreds of accumulated compilations — the flake
    scripts/run_suite_sharded.sh was built around. Clearing JAX's
    compilation caches at module boundaries bounds the live-executable
    count a single process accumulates (the strongest correlate of the
    crash) at the cost of some recompiles, keeping the plain
    ``pytest tests/ -q`` single-process run reliable."""
    yield
    jax.clear_caches()
