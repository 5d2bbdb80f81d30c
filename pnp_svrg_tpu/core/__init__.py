"""Core abstractions: problem/denoiser protocols and shared state pytrees."""

from pnp_svrg_tpu.core.problem import (
    snr_to_sigma,
    sigma_to_snr,
    minmax_normalize,
)
from pnp_svrg_tpu.core.checks import (
    grad_full_check,
    grad_stoch_check,
    GradientCheckError,
)

__all__ = [
    "snr_to_sigma",
    "sigma_to_snr",
    "minmax_normalize",
    "grad_full_check",
    "grad_stoch_check",
    "GradientCheckError",
]
