"""Training drivers: jitted, mesh-sharded teacher + distillation trainers,
optimizer masking, checkpoint/resume."""
from dclip_tpu.train.checkpoint import CheckpointManager, restore_state, save_state
from dclip_tpu.train.distill_trainer import DistillTrainer, TeacherTargetCache
from dclip_tpu.train.optim import (
    TrainState,
    count_trainable,
    linear_warmup_schedule,
    make_optimizer,
    make_train_step,
    param_paths,
    pattern_mask,
    student_trainable_mask,
)
from dclip_tpu.train.teacher_trainer import TeacherTrainer, masked_mean

__all__ = [
    "CheckpointManager",
    "restore_state",
    "save_state",
    "DistillTrainer",
    "TeacherTargetCache",
    "TrainState",
    "count_trainable",
    "linear_warmup_schedule",
    "make_optimizer",
    "make_train_step",
    "param_paths",
    "pattern_mask",
    "student_trainable_mask",
    "TeacherTrainer",
    "masked_mean",
]
