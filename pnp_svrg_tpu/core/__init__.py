"""Core abstractions: problem/denoiser protocols and shared state pytrees."""

from pnp_svrg_tpu.core.problem import (
    snr_to_sigma,
    sigma_to_snr,
    minmax_normalize,
)

__all__ = ["snr_to_sigma", "sigma_to_snr", "minmax_normalize"]
