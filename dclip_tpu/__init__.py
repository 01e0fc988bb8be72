"""dclip_tpu — TPU-native rebuild of DCLIP (ChuckDanz/DCLIP).

A JAX/Flax/Pallas/pjit framework for region-level cross-modal distillation:
a bidirectional cross-attention meta-teacher aligns detector-region CLIP
embeddings with token-level CLIP text embeddings and is distilled into a
vanilla CLIP student, boosting image<->text retrieval while retaining
zero-shot accuracy.

Layer map (TPU-first redesign of the reference's layers, SURVEY.md §1):
  core/      config dataclasses, metrics + profiling spans
  models/    Flax CLIP encoders (+HF import), cross-modal attention, teacher,
             projections, RegionTokenizer, native Flax detector
  ops/       XLA ops: losses (+global shard_map variants), aggregation,
             retrieval ranking, k-NN gate, image ops, fixed-shape NMS
  kernels/   Pallas TPU kernels (fused cross-attention, fused distill loss)
  parallel/  device mesh, TP sharding rules, multi-slice helper
  data/      CLIP BPE tokenizer, corpus/Karpathy JSON contracts, detection
             cache, embedding store, fixed-shape input pipeline
  train/     teacher + distillation trainers (jitted, mesh-sharded),
             masked optimizers, checkpoint/resume, teacher-target cache
  eval/      Flickr30k/COCO retrieval, ImageNet/CIFAR zero-shot
  native/    C++ host runtime: mmap KV store + exact top-k (ctypes)
"""

__version__ = "0.1.0"
