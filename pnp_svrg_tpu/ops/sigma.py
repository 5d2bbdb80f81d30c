"""Noise standard-deviation estimation (wavelet-detail MAD).

Native replacement for ``skimage.restoration.estimate_sigma`` which every
reference algorithm calls once per iteration before the denoiser (reference
``algorithms/pnp_gd.py:49``, ``pnp_svrg.py:71``). skimage's estimator takes
the level-1 ``db2`` diagonal (HH) detail band, drops exactly-zero
coefficients, and returns ``median(|HH|) / Phi^-1(3/4)``.

Implemented shape-statically for jit: zeros are masked to +inf before a sort
and the median is read at rank positions derived from the nonzero count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pnp_svrg_tpu.ops.wavelet import dwt2

# scipy.stats.norm.ppf(0.75)
_MAD_DENOM = 0.6744897501960817


def _masked_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of ``values`` where ``mask`` is True (fixed-shape, jit-safe)."""
    flat = values.ravel()
    mflat = mask.ravel()
    big = jnp.asarray(jnp.finfo(flat.dtype).max, flat.dtype)
    s = jnp.sort(jnp.where(mflat, flat, big))
    n = jnp.sum(mflat)
    lo = jnp.clip((n - 1) // 2, 0, flat.shape[0] - 1)
    hi = jnp.clip(n // 2, 0, flat.shape[0] - 1)
    med = 0.5 * (s[lo] + s[hi])
    # All-zero detail band (constant image): estimate 0, like skimage's
    # nan-free behavior on degenerate input.
    return jnp.where(n > 0, med, jnp.asarray(0.0, flat.dtype))


@jax.jit
def estimate_sigma(image: jnp.ndarray) -> jnp.ndarray:
    """Estimate AWGN sigma from level-1 db2 HH coefficients.

    Accepts (H, W) -> scalar, or any leading batch axes (..., H, W) ->
    (...)-shaped estimates (one median per image).
    """
    _, (_, _, hh) = dwt2(image, "db2")
    absd = jnp.abs(hh)
    if image.ndim == 2:
        return _masked_median(absd, absd > 0) / jnp.asarray(
            _MAD_DENOM, image.dtype
        )
    lead = absd.shape[:-2]
    flat = absd.reshape((-1,) + absd.shape[-2:])
    med = jax.vmap(lambda a: _masked_median(a, a > 0))(flat)
    return med.reshape(lead) / jnp.asarray(_MAD_DENOM, image.dtype)
