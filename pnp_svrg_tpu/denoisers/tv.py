"""Wavelet BayesShrink denoiser (the reference's "TV" denoiser).

The reference ``TVDenoiser`` is, despite its name, a *wavelet* denoiser: it
calls ``skimage.restoration.denoise_wavelet(method='BayesShrink')`` (reference
``denoisers/TV.py:21-26``). This version delegates to the native jnp
implementation in ``ops/wavelet.py``.

Sigma selection follows the reference contract: when a positive ``sigma_est``
is supplied, use ``sigma_est * sigma_modifier``; otherwise fall back to
``denoise_strength * decay**t`` where ``t`` is the 1-based call count.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from pnp_svrg_tpu.ops.wavelet import denoise_wavelet_bayes


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["denoise_strength", "sigma_modifier", "decay"],
    meta_fields=["wavelet"],
)
@dataclasses.dataclass(frozen=True)
class TVDenoiser:
    denoise_strength: jnp.ndarray = 0.0
    sigma_modifier: jnp.ndarray = 1.0
    decay: jnp.ndarray = 1.0
    wavelet: str = "db1"

    def effective_sigma(self, sigma_est: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        fallback = self.denoise_strength * self.decay**t
        return jnp.where(sigma_est > 0, sigma_est * self.sigma_modifier, fallback)

    def denoise(
        self, x: jnp.ndarray, sigma_est: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        sigma = self.effective_sigma(jnp.asarray(sigma_est, x.dtype), t)
        return denoise_wavelet_bayes(x, sigma, wavelet=self.wavelet)
