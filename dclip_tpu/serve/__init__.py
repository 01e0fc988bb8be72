"""Production serving for DCLIP-TPU.

The reference (ChuckDanz/DCLIP) stops at eval scripts; this subsystem is
the deployment surface a production user needs on TPU:

- `DynamicBatcher` — merges concurrent requests into one device batch
  (TPUs amortize dispatch + win MXU efficiency with batched fixed-shape
  calls; per-request forwards would recompile/underfill).
- `ClipService` — bucket-padded, jit-cached text/image encoders over a
  loaded CLIP student, with an optional in-memory retrieval index.
- `export_encoders` / `load_exported` — AOT serialization of the encode
  functions via `jax.export` (StableHLO), so a serving container ships a
  model artifact without the Flax module code.

CLI: `python -m dclip_tpu.cli.serve` (local HTTP JSON API).
"""
from dclip_tpu.serve.batcher import DynamicBatcher
from dclip_tpu.serve.export import export_encoders, load_exported
from dclip_tpu.serve.service import ClipService, pad_to_bucket

__all__ = [
    "ClipService",
    "DynamicBatcher",
    "export_encoders",
    "load_exported",
    "pad_to_bucket",
]
