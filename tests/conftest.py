"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

The reference has no tests at all (SURVEY.md §4); this conftest is the
"fake backend" layer the TPU build uses instead: every multi-chip sharding
path is exercised on 8 virtual CPU devices.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env may pre-set an axon TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# Parity tests compare against float64-free numpy/torch references; JAX's
# default CPU matmul precision is lower (bf16-ish passes) and fails them.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)
