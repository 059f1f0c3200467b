from .dino import (
    dino_loss,
    ema_update,
    scoring_dino_loss,
    teacher_temp_schedule,
    update_center,
)
from .optim import apply_updates_with_schedules, build_optimizer, lars, per_param_clip, wd_mask
from .schedules import cosine_scheduler

__all__ = [
    "dino_loss",
    "ema_update",
    "scoring_dino_loss",
    "teacher_temp_schedule",
    "update_center",
    "apply_updates_with_schedules",
    "build_optimizer",
    "lars",
    "per_param_clip",
    "wd_mask",
    "cosine_scheduler",
]
