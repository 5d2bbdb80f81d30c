"""Fourier-domain operators.

XLA-native replacements for the numpy pocketfft call sites in the reference:
2-D FFTs for CSMRI gradients (reference ``problems/CSMRI.py:76-89``) and the
1-D circular "fft_blur" convolution used by the Deblur problem (reference
``problems/DeblurSR.py:119-120``). ``jnp.fft`` follows numpy's unnormalized
forward / 1/N inverse convention, so formulas carry over unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp


def fft2(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.fft.fft2(x)


def ifft2(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.fft.ifft2(x)


def fft_blur_1d(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Circular convolution of two raveled signals, scaled by sqrt(N).

    The Deblur forward model treats the H*W image as a 1-D periodic signal
    (reference ``DeblurSR.py:119-120``): real(ifft(fft(a) * fft(b))) * sqrt(N).
    """
    a = a.ravel()
    b = b.ravel()
    n = a.shape[0]
    out = jnp.fft.ifft(jnp.fft.fft(a) * jnp.fft.fft(b))
    return jnp.real(out) * jnp.sqrt(jnp.asarray(float(n), a.dtype))


def fft_blur_1d_adjoint_kernel(b: jnp.ndarray) -> jnp.ndarray:
    """Kernel whose ``fft_blur_1d`` realizes the adjoint of blurring with b.

    The reference forms it as ``roll(flip(B), 1)`` (``DeblurSR.py:132``), which
    is exactly the circular time-reversal b[-n mod N].
    """
    return jnp.roll(jnp.flip(b.ravel()), 1)
