"""Test harness: an 8-device virtual CPU mesh alongside whatever the real
backend is.

The reference has no tests at all (SURVEY.md §4); this conftest is the
"fake backend" layer the TPU build uses instead: every multi-chip sharding
path is exercised on 8 virtual CPU devices.

Note: this environment registers a TPU PJRT plugin in `sitecustomize` before
conftest runs, so JAX_PLATFORMS cannot be overridden here. Instead we keep
the CPU backend available with 8 virtual devices (XLA reads XLA_FLAGS lazily
at first CPU-client init) and pin the *default device* to CPU so tests run
fast and deterministically; mesh tests must build their mesh from
`jax.devices("cpu")` (use the `cpu_devices` fixture).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# NOTE: the persistent compilation cache is deliberately NOT enabled here —
# deserialized CPU-backend executables abort on replay in this jax build
# (dclip_tpu.core.cache docstring), and tests compile CPU programs.

# Parity tests compare against float64-free numpy/torch references; JAX's
# default matmul precision is lower (bf16-ish passes) and fails them.
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import pytest  # noqa: E402

# Per-test deadline watchdog: bounds a wedged (uninterruptible) compile to
# one test's DCLIP_TEST_DEADLINE budget instead of eating the whole
# invocation. Importing the hook registers it for this conftest's scope.
from deadline_plugin import pytest_runtest_protocol  # noqa: E402,F401


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "XLA_FLAGS must force 8 virtual CPU devices"
    return devs[:8]
