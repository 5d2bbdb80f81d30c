"""Numerics substrate: FFT, wavelets, metrics, sampling, resize, kernels."""

from pnp_svrg_tpu.ops.metrics import psnr, psnr_rounded, ssim, mse
from pnp_svrg_tpu.ops.sigma import estimate_sigma
from pnp_svrg_tpu.ops.wavelet import (
    dwt1,
    idwt1,
    dwt2,
    idwt2,
    wavedec2,
    waverec2,
    denoise_wavelet_bayes,
    soft_threshold,
)
from pnp_svrg_tpu.ops.fourier import fft_blur_1d, fft_blur_1d_adjoint_kernel
from pnp_svrg_tpu.ops.sampling import sample_k_mask, sample_k_indices

__all__ = [
    "psnr",
    "psnr_rounded",
    "ssim",
    "mse",
    "estimate_sigma",
    "dwt1",
    "idwt1",
    "dwt2",
    "idwt2",
    "wavedec2",
    "waverec2",
    "denoise_wavelet_bayes",
    "soft_threshold",
    "fft_blur_1d",
    "fft_blur_1d_adjoint_kernel",
    "sample_k_mask",
    "sample_k_indices",
]
