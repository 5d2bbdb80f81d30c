"""Denoisers: the PnP proximal/prior step.

Native TPU implementations of the reference's denoiser zoo
(``denoisers/__init__.py:4-8``): wavelet-BayesShrink ("TV"), non-local
means, BM3D, and CNN denoisers (RealSN-DnCNN / MMO) as Flax modules.
"""

from pnp_svrg_tpu.denoisers.tv import TVDenoiser
from pnp_svrg_tpu.denoisers.nlm import NLMDenoiser, nlm_denoise

from pnp_svrg_tpu.denoisers.bm3d import BM3DDenoiser, BM3DParams, bm3d_denoise
from pnp_svrg_tpu.denoisers.dncnn import (
    DnCNNDenoiser,
    MMODenoiser,
    load_denoiser_params,
)

__all__ = [
    "TVDenoiser",
    "NLMDenoiser",
    "nlm_denoise",
    "BM3DDenoiser",
    "BM3DParams",
    "bm3d_denoise",
    "DnCNNDenoiser",
    "MMODenoiser",
    "load_denoiser_params",
]
