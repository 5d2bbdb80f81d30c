"""Denoiser training subsystem (patch pipeline, RealSN-DnCNN training,
config-guarded checkpointing)."""

from pnp_svrg_tpu.training.train_dncnn import TrainConfig, train, evaluate
from pnp_svrg_tpu.training.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    ConfigMismatch,
)

__all__ = [
    "TrainConfig",
    "train",
    "evaluate",
    "save_checkpoint",
    "load_checkpoint",
    "ConfigMismatch",
]
