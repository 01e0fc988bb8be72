"""Pure jittable ops: losses, aggregation, retrieval ranking, k-NN, image ops.

Pallas-fused TPU kernels for the hot paths live in `dclip_tpu.kernels`; every
op here is the XLA reference implementation the kernels are tested against.
"""
from dclip_tpu.ops.aggregation import (
    best_text_similarity,
    fuse_global,
    patch_weights,
    temperature_aggregate,
)
from dclip_tpu.ops.knn import (
    SOURCE_CLIP,
    SOURCE_KNN,
    SOURCE_PROJECTION,
    KNNResult,
    knn_or_projection,
    knn_search,
    knn_search_sharded,
)
from dclip_tpu.ops.losses import (
    cosine_distillation,
    distillation_loss,
    distillation_loss_global,
    info_nce,
    info_nce_global,
    l2_normalize,
)
from dclip_tpu.ops.retrieval import (
    i2t_ranks,
    recall_at_k,
    retrieval_metrics,
    similarity_matrix,
    t2i_ranks,
)

__all__ = [
    "best_text_similarity",
    "fuse_global",
    "patch_weights",
    "temperature_aggregate",
    "SOURCE_CLIP",
    "SOURCE_KNN",
    "SOURCE_PROJECTION",
    "KNNResult",
    "knn_or_projection",
    "knn_search",
    "knn_search_sharded",
    "cosine_distillation",
    "distillation_loss",
    "distillation_loss_global",
    "info_nce",
    "info_nce_global",
    "l2_normalize",
    "i2t_ranks",
    "recall_at_k",
    "retrieval_metrics",
    "similarity_matrix",
    "t2i_ranks",
]
