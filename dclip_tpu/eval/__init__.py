"""Evaluation harnesses: Karpathy retrieval + ImageNet/CIFAR zero-shot,
with the reference's CLI output formats."""
from dclip_tpu.eval.retrieval import (
    embed_captions,
    embed_images,
    evaluate_retrieval,
    load_eval_items,
    print_retrieval_table,
)
from dclip_tpu.eval.zero_shot import (
    CIFAR10_CLASSES,
    CIFAR_PROMPT,
    IMAGENET_PROMPT,
    embed_classnames,
    evaluate_zero_shot,
    format_cifar_results,
    format_imagenet_results,
    iterate_image_folder,
    iterate_preprocessed,
    load_cifar_batches,
    print_comparison_table,
)

__all__ = [
    "embed_captions",
    "embed_images",
    "evaluate_retrieval",
    "load_eval_items",
    "print_retrieval_table",
    "CIFAR10_CLASSES",
    "CIFAR_PROMPT",
    "IMAGENET_PROMPT",
    "embed_classnames",
    "evaluate_zero_shot",
    "format_cifar_results",
    "format_imagenet_results",
    "iterate_image_folder",
    "iterate_preprocessed",
    "load_cifar_batches",
    "print_comparison_table",
]
