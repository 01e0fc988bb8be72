"""Environment diagnosis: one JSON line about everything the framework
needs — backend/devices, Pallas availability (with the probe's watchdog),
persistent compile cache, native runtime, and key library versions.

    python -m dclip_tpu.cli.doctor            # full check (probes Pallas)
    python -m dclip_tpu.cli.doctor --fast     # skip the Pallas probe

Run it first on a new machine, in a crash report, or when the tunneled
TPU misbehaves (the probe distinguishes "no TPU" from "TPU wedged").
Reference counterpart: none (the reference debugs with prints).
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def collect(fast: bool = False) -> dict:
    info: dict = {"ok": True}

    import jax

    import dclip_tpu

    info["versions"] = {
        "python": sys.version.split()[0],
        "jax": jax.__version__,
        "dclip_tpu": getattr(dclip_tpu, "__version__", "dev"),
    }
    try:
        import flax

        info["versions"]["flax"] = flax.__version__
    except Exception:  # pragma: no cover
        pass

    try:
        devices = jax.devices()
        info["backend"] = jax.default_backend()
        info["devices"] = {
            "count": len(devices),
            "platform": devices[0].platform,
            "kinds": sorted({d.device_kind for d in devices}),
        }
        info["process"] = {
            "index": jax.process_index(),
            "count": jax.process_count(),
        }
    except Exception as e:  # backend init failed (e.g. wedged tunnel)
        info["ok"] = False
        info["backend_error"] = f"{type(e).__name__}: {e}"
        return info

    from dclip_tpu.core.platform import is_tpu_platform

    on_tpu = is_tpu_platform(jax.default_backend())
    info["is_tpu"] = on_tpu

    # One tiny compile+execute round trip: the most common failure on the
    # tunneled deployment is a backend that registers but hangs/errors on
    # first use.
    try:
        import jax.numpy as jnp

        x = jnp.ones((128, 128))
        info["matmul_smoke"] = float(jax.jit(lambda a: (a @ a).sum())(x))
    except Exception as e:
        info["ok"] = False
        info["matmul_error"] = f"{type(e).__name__}: {e}"
        return info

    if on_tpu and not fast:
        from dclip_tpu.kernels import pallas_available

        info["pallas_available"] = bool(pallas_available())
    elif not on_tpu:
        info["pallas_available"] = "interpret-only (non-TPU backend)"

    from dclip_tpu.core.cache import enable_persistent_compilation_cache

    try:
        d = enable_persistent_compilation_cache()
        entries = os.listdir(d) if d and os.path.isdir(d) else []
        info["compile_cache"] = {
            "dir": d,
            "entries": len(entries),
            "bytes": sum(
                os.path.getsize(os.path.join(d, f))
                for f in entries
                if os.path.isfile(os.path.join(d, f))
            ),
        }
    except Exception as e:  # pragma: no cover
        info["compile_cache"] = {"error": str(e)}

    from dclip_tpu import native

    info["native_runtime"] = {
        "available": native.available(),
    }

    return info


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--fast", action="store_true",
                   help="skip the Pallas availability probe (it can take "
                        "up to its 120s watchdog on a degraded tunnel)")
    args = p.parse_args(argv)
    info = collect(fast=args.fast)
    print(json.dumps(info, indent=2))
    return 0 if info.get("ok") else 1


if __name__ == "__main__":
    raise SystemExit(main())
