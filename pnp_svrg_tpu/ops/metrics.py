"""Image quality metrics (PSNR, SSIM) in pure JAX.

Native replacements for the skimage C/Cython metrics the reference relies on:
``peak_signal_noise_ratio`` (reference ``problems/problem.py:33-35``) and
``batch_SSIM`` in the training utilities (reference
``DeepDenoisers/training/utilities/utils.py:36-44``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.mean(d * d)


@functools.partial(jax.jit, static_argnames=("data_range",))
def psnr(
    image_true: jnp.ndarray, image_test: jnp.ndarray, data_range: float = 1.0
) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB.

    ``data_range`` defaults to 1.0 — the value skimage infers for float images
    with nonnegative ground truth in [0, 1], which is what every reference
    problem produces (images min-max normalized at load,
    reference ``problems/problem.py:23``).
    """
    return 10.0 * jnp.log10((data_range * data_range) / mse(image_true, image_test))


def psnr_rounded(image_true, image_test, data_range: float = 1.0):
    """PSNR rounded to 2 decimals — the reference's reporting convention
    (reference ``problems/problem.py:35``)."""
    return jnp.round(psnr(image_true, image_test, data_range), 2)


def _gaussian_kernel1d(sigma: float, truncate: float = 3.5) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _filter2d_separable(img: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    """Separable 2-D correlation with reflect padding over last two axes."""
    r = (len(k) - 1) // 2
    kj = jnp.asarray(k, img.dtype)
    lead = img.shape[:-2]
    x = img.reshape((-1, 1) + img.shape[-2:])
    x = jnp.pad(x, [(0, 0), (0, 0), (r, r), (r, r)], mode="reflect")
    kr = kj.reshape(1, 1, -1, 1)
    kc = kj.reshape(1, 1, 1, -1)
    dn = ("NCHW", "OIHW", "NCHW")
    # HIGHEST precision: TPU convs default to bf16 accumulation, and SSIM's
    # variance terms are catastrophic cancellations (f(a^2) - mu^2) — with
    # default precision the TPU returned SSIM "means" of 1.27 and 7.9 for a
    # metric bounded by 1.
    hi = jax.lax.Precision.HIGHEST
    x = jax.lax.conv_general_dilated(
        x, kr, (1, 1), "VALID", dimension_numbers=dn, precision=hi
    )
    x = jax.lax.conv_general_dilated(
        x, kc, (1, 1), "VALID", dimension_numbers=dn, precision=hi
    )
    return x.reshape(lead + x.shape[-2:])


@functools.partial(jax.jit, static_argnames=("data_range",))
def ssim(
    image_true: jnp.ndarray,
    image_test: jnp.ndarray,
    data_range: float = 1.0,
) -> jnp.ndarray:
    """Structural similarity with skimage's ``gaussian_weights=True`` defaults
    (sigma=1.5, truncate=3.5, K1=0.01, K2=0.03, sample covariance off)."""
    a = image_true.astype(jnp.float32)
    b = image_test.astype(jnp.float32)
    k = _gaussian_kernel1d(1.5)
    f = lambda z: _filter2d_separable(z, k)
    mu_a, mu_b = f(a), f(b)
    var_a = f(a * a) - mu_a * mu_a
    var_b = f(b * b) - mu_b * mu_b
    cov = f(a * b) - mu_a * mu_b
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a * mu_a + mu_b * mu_b + c1) * (var_a + var_b + c2)
    s = num / den
    # skimage crops the filter radius before averaging.
    r = (len(k) - 1) // 2
    return jnp.mean(s[..., r:-r, r:-r])
