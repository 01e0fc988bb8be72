"""dclip_tpu — TPU-native rebuild of DCLIP (ChuckDanz/DCLIP).

A JAX/Flax/Pallas/pjit framework for region-level cross-modal distillation:
a bidirectional cross-attention meta-teacher aligns detector-region CLIP
embeddings with token-level CLIP text embeddings and is distilled into a
vanilla CLIP student, boosting image<->text retrieval while retaining
zero-shot accuracy.

Layer map (TPU-first redesign of the reference's layers, SURVEY.md §1):
  core/      config dataclasses, mesh/sharding, orbax checkpointing, metrics
  models/    Flax CLIP encoders, cross-modal attention, teacher, projections
  ops/       Pallas kernels + XLA reference ops (losses, attention, top-k, image)
  parallel/  device mesh, sharding rules, collective losses
  data/      corpus/Karpathy JSON contracts, detection cache, embedding store,
             fixed-shape input pipeline
  train/     teacher trainer, distillation trainer (jitted, pjit-sharded)
  eval/      Flickr30k/COCO retrieval, ImageNet/CIFAR zero-shot
  native/    C++ host-side shard store (replaces pickle/dbm caches)
"""

__version__ = "0.1.0"
