"""CLI entry points, preserving the reference's public flag contracts:

- train_teacher      <- training/train_contrastive_teacher.py
- train_distill      <- training/CLIP_image_distill_training.py
- flickr30k_eval     <- eval_scripts/flickr30k_eval.py
- zero_shot_eval     <- eval_scripts/{test_zero_shot_ImageNet,CIFAR_zeroshot}.py
- build_corpus       <- json_creation/big_teacher_data.py
- karpathy           <- json_creation/karpathy_download.py
- precache           <- training/train_pickle.py
- build_index        <- training/compute_faiss.py
"""
