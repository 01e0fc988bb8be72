"""One place to answer "are we executing on a TPU?".

The tunneled client may register its platform as "tpu" or (in other
deployments) under the plugin name "axon"; hand-rolled checks had started
to diverge between bench, the eval encoder, and the CLI loader. Mesh-based
code should keep using `mesh.devices.flat[0].platform` (the mesh can be
CPU while the default backend is TPU); this helper is for default-device
decisions only.
"""
from __future__ import annotations

TPU_PLATFORMS = ("tpu", "axon")


def default_is_tpu() -> bool:
    """True when the default JAX device is a TPU (never raises)."""
    try:
        import jax

        return jax.devices()[0].platform in TPU_PLATFORMS
    except Exception:
        return False


def is_tpu_platform(platform: str) -> bool:
    return platform in TPU_PLATFORMS
