"""Pallas TPU kernels for the hot paths (north-star items in BASELINE.json).

Each kernel has an XLA reference twin in `dclip_tpu.ops` / `dclip_tpu.models`
and is parity-tested against it (interpret mode on CPU, compiled on TPU).
"""
from dclip_tpu.kernels.cross_attention import (
    cross_attention_fused,
    cross_attention_trainable,
)

_PALLAS_OK: dict = {}


def _pallas_probe_once() -> bool:
    """Compile + run one trivial Pallas kernel on the default device."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def _copy(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] * 2.0

    x = jnp.ones((8, 128), jnp.float32)
    out = pl.pallas_call(
        _copy, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(x)
    return bool(np.allclose(np.asarray(out), 2.0))


def pallas_available() -> bool:
    """Probe whether compiled Pallas works on the default TPU device.

    Gates the auto-enabled fast path: on tunneled/remote TPU backends the
    Pallas compile helper can fail transiently (HTTP 500) or HANG, so the
    probe runs in a watchdog thread with a deadline
    (DCLIP_PALLAS_PROBE_TIMEOUT seconds, default 120) — a trainer
    construction must never wedge on a flaky compile service; it falls
    back to the XLA twins instead. One retry on clean failure; result
    cached per process. DCLIP_DISABLE_PALLAS=1 forces the XLA paths."""
    import os
    import threading

    if "ok" in _PALLAS_OK:
        return _PALLAS_OK["ok"]
    if os.environ.get("DCLIP_DISABLE_PALLAS"):
        _PALLAS_OK["ok"] = False
        return False
    deadline = float(os.environ.get("DCLIP_PALLAS_PROBE_TIMEOUT", "120"))

    ok = False
    for _ in range(2):
        result: dict = {}

        def probe(result=result):
            try:
                result["ok"] = _pallas_probe_once()
            except Exception:
                result["ok"] = False

        t = threading.Thread(target=probe, daemon=True)
        t.start()
        t.join(timeout=deadline)
        if t.is_alive():
            # Hung remote compile: leave the daemon thread behind and use
            # the XLA paths; don't retry (the service is wedged).
            print(
                f"use_pallas probe timed out after {deadline:.0f}s; "
                "falling back to XLA kernels"
            )
            ok = False
            break
        ok = result.get("ok", False)
        if ok:
            break
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
