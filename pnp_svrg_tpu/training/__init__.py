"""Denoiser training subsystem (patch pipeline, RealSN-DnCNN training,
config-guarded checkpointing)."""

from pnp_svrg_tpu.training.train_dncnn import TrainConfig, train, evaluate
from pnp_svrg_tpu.training.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    ConfigMismatch,
)
from pnp_svrg_tpu.training.utils import (
    batch_psnr,
    batch_ssim,
    l2_reg_normal_ortho,
    adjust_ortho_decay_rate,
    unroll_kernel,
    unroll_kernel_sparse,
)

__all__ = [
    "TrainConfig",
    "train",
    "evaluate",
    "save_checkpoint",
    "load_checkpoint",
    "ConfigMismatch",
    "batch_psnr",
    "batch_ssim",
    "l2_reg_normal_ortho",
    "adjust_ortho_decay_rate",
    "unroll_kernel",
    "unroll_kernel_sparse",
]
