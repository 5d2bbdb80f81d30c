"""Flax model zoo: DnCNN family, MMO simple_CNN, spectral normalization."""

from pnp_svrg_tpu.models.dncnn import DnCNN, MMOSimpleCNN, model_for_type
from pnp_svrg_tpu.models.spectral_norm import (
    conv_power_iteration,
    spectrally_normalize_kernel,
    bn_spectral_clamp,
    realsn_target,
    init_u,
)

__all__ = [
    "DnCNN",
    "MMOSimpleCNN",
    "model_for_type",
    "conv_power_iteration",
    "spectrally_normalize_kernel",
    "bn_spectral_clamp",
    "realsn_target",
    "init_u",
]
