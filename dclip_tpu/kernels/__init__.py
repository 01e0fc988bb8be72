"""Pallas TPU kernels for the hot paths (north-star items in BASELINE.json).

Each kernel has an XLA reference twin in `dclip_tpu.ops` / `dclip_tpu.models`
and is parity-tested against it (interpret mode on CPU, compiled on TPU).
"""
from dclip_tpu.kernels.cross_attention import (
    cross_attention_fused,
    cross_attention_trainable,
)

_PALLAS_OK: dict = {}


def pallas_available() -> bool:
    """Compile + run one trivial Pallas kernel on the default TPU device.

    Gates the auto-enabled fast path: on tunneled/remote TPU backends the
    Pallas compile helper can fail transiently (HTTP 500), in which case
    trainers fall back to the XLA twins instead of crashing mid-init. One
    retry, result cached per process. Set DCLIP_DISABLE_PALLAS=1 to force
    the XLA paths."""
    import os

    if "ok" in _PALLAS_OK:
        return _PALLAS_OK["ok"]
    if os.environ.get("DCLIP_DISABLE_PALLAS"):
        _PALLAS_OK["ok"] = False
        return False
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def _copy(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] * 2.0

    ok = False
    for _ in range(2):
        try:
            x = jnp.ones((8, 128), jnp.float32)
            out = pl.pallas_call(
                _copy, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
            )(x)
            ok = bool(np.allclose(np.asarray(out), 2.0))
            if ok:
                break
        except Exception:
            ok = False
    _PALLAS_OK["ok"] = ok
    return ok
from dclip_tpu.kernels.topk import topk_streamed
from dclip_tpu.kernels.distill_loss import (
    MAX_FUSED_BATCH,
    fused_distillation_loss,
    make_fused_distillation_loss,
)

__all__ = [
    "cross_attention_fused",
    "cross_attention_trainable",
    "pallas_available",
    "fused_distillation_loss",
    "make_fused_distillation_loss",
    "MAX_FUSED_BATCH",
    "topk_streamed",
]
