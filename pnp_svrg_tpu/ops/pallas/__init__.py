"""Pallas TPU kernels for the hot denoiser inner loops."""

from pnp_svrg_tpu.ops.pallas.nlm_kernel import nlm_denoise_pallas

__all__ = ["nlm_denoise_pallas"]
