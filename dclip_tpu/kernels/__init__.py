"""Pallas TPU kernels for the hot paths (north-star items in BASELINE.json).

Each kernel has an XLA reference twin in `dclip_tpu.ops` / `dclip_tpu.models`
and is parity-tested against it (interpret mode on CPU, compiled on TPU).
"""
from dclip_tpu.kernels.attn_block_trainable import (
    attention_block_trainable,
    attn_block_fit,
)
from dclip_tpu.kernels.cross_attention import (
    cross_attention_fused,
    cross_attention_trainable,
)
from dclip_tpu.kernels.vit_attention import (
    self_attention_fused,
    self_attention_trainable,
)
from dclip_tpu.kernels.mlp_trainable import (
    mlp_block_trainable,
    mlp_trainable_fit,
)
from dclip_tpu.kernels.vit_block import (
    attention_block_fused,
    encoder_forward_fused,
    fused_image_features,
    mlp_block_fused,
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
    import json
    import os
    import threading
    import time

    if "ok" in _PALLAS_OK:
        return _PALLAS_OK["ok"]
    if os.environ.get("DCLIP_DISABLE_PALLAS"):
        _PALLAS_OK["ok"] = False
        return False
    if os.environ.get("DCLIP_FORCE_PALLAS"):
        # Skip probe AND memo. The probe's watchdog false-negatives under
        # TPU-client lock contention (a concurrent process holding the
        # tunnel makes a healthy compile look wedged); callers that carry
        # their own deadline + XLA-retry safety net (bench.py's parent)
        # must not let a contended probe route them to the fallback path.
        _PALLAS_OK["ok"] = True
        return True
    deadline = float(os.environ.get("DCLIP_PALLAS_PROBE_TIMEOUT", "120"))

    # Cross-process memo with a SHORT TTL (10 min both ways): when the
    # compile service is wedged, every fresh process would otherwise burn
    # the full probe deadline rediscovering it. A short success TTL bounds
    # the window in which a cached ok can route real compiles into a
    # service that wedged after the probe (real compiles have no watchdog);
    # the verdict is keyed by the default-device platform.
    from dclip_tpu.core.platform import default_is_tpu

    platform_key = "tpu" if default_is_tpu() else "other"
    memo_path = os.path.join(
        os.path.expanduser(
            os.environ.get("DCLIP_COMPILE_CACHE", "~/.cache/dclip_tpu_jax")
        ),
        "pallas_probe.json",
    )
    ttl = 600.0
    try:
        with open(memo_path) as f:
            memo = json.load(f)
        if memo.get("platform") == platform_key and (
            time.time() - memo["time"] < ttl
        ):
            _PALLAS_OK["ok"] = bool(memo["ok"])
            if not memo["ok"]:
                print("use_pallas auto-disabled (cached probe failure)")
            return _PALLAS_OK["ok"]
    except Exception:
        pass

    def _memoize(ok: bool) -> None:
        try:
            os.makedirs(os.path.dirname(memo_path), exist_ok=True)
            with open(memo_path, "w") as f:
                json.dump(
                    {"ok": ok, "time": time.time(), "platform": platform_key}, f
                )
        except Exception:
            pass

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
    _memoize(ok)
    return ok
from dclip_tpu.kernels.topk import topk_streamed
from dclip_tpu.kernels.distill_loss import (
    MAX_FUSED_BATCH,
    fused_distillation_loss,
    make_fused_distillation_loss,
)

__all__ = [
    "attention_block_fused",
    "attention_block_trainable",
    "attn_block_fit",
    "cross_attention_fused",
    "cross_attention_trainable",
    "encoder_forward_fused",
    "fused_image_features",
    "mlp_block_fused",
    "mlp_block_trainable",
    "mlp_trainable_fit",
    "pallas_available",
    "self_attention_fused",
    "self_attention_trainable",
    "fused_distillation_loss",
    "make_fused_distillation_loss",
    "MAX_FUSED_BATCH",
    "topk_streamed",
]
