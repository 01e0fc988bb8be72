"""Data layer: tokenizer, corpus/karpathy builders, detection cache,
HBM embedding store, fixed-shape input pipeline."""
from dclip_tpu.data.corpus import (
    CorpusPaths,
    combine_datasets,
    load_corpus,
    print_dataset_stats,
    process_coco,
    process_conceptual_captions,
    process_flickr30k,
    process_visual_genome,
)
from dclip_tpu.data.detection_cache import (
    DetectionCache,
    GridProposalDetector,
    boxes_from_corpus_item,
    build_cache,
    cache_path_for,
)
from dclip_tpu.data.embedding_store import EmbeddingStore
from dclip_tpu.data.karpathy import EXPECTED_COUNTS, prepare_karpathy_json
from dclip_tpu.data.pipeline import Batch, MultiModalPipeline, preprocess_image
from dclip_tpu.data.tokenizer import CLIPTokenizer, HashTokenizer

__all__ = [
    "CorpusPaths",
    "combine_datasets",
    "load_corpus",
    "print_dataset_stats",
    "process_coco",
    "process_conceptual_captions",
    "process_flickr30k",
    "process_visual_genome",
    "DetectionCache",
    "GridProposalDetector",
    "boxes_from_corpus_item",
    "build_cache",
    "cache_path_for",
    "EmbeddingStore",
    "EXPECTED_COUNTS",
    "prepare_karpathy_json",
    "Batch",
    "MultiModalPipeline",
    "preprocess_image",
    "CLIPTokenizer",
    "HashTokenizer",
]
