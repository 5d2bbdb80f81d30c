"""Discrete wavelet transforms in pure JAX (pywt-compatible conventions).

The reference obtains wavelet machinery from PyWavelets' C extension via
``skimage.restoration.denoise_wavelet`` (reference ``denoisers/TV.py:24``) and
``skimage.restoration.estimate_sigma`` (every algorithm, e.g. reference
``algorithms/pnp_gd.py:49``). Neither library exists on this platform, so the
transforms are implemented natively with XLA strided convolutions:

* decimated analysis:  ``out[k] = sum_j f[j] * ext[2k + L - j]`` on a
  half-point symmetric extension — this reproduces PyWavelets' ``mode=
  'symmetric'`` downsampling-convolution convention exactly (validated by
  perfect-reconstruction and Haar golden-value tests).
* synthesis: zero-upsampling + full convolution with the time-reversed
  filters, cropped by ``L - 2`` (PyWavelets ``idwt`` convention).

All transforms are shape-static and jit/vmap-friendly; 2-D transforms are
separable applications along the last two axes.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

# Daubechies decomposition low-pass filters (pywt coefficient values).
_DB_LO = {
    "db1": [0.7071067811865476, 0.7071067811865476],
    "db2": [
        -0.12940952255092145,
        0.22414386804185735,
        0.836516303737469,
        0.48296291314469025,
    ],
    "db4": [
        -0.010597401784997278,
        0.032883011666982945,
        0.030841381835986965,
        -0.18703481171888114,
        -0.02798376941698385,
        0.6308807679295904,
        0.7148465705525415,
        0.23037781330885523,
    ],
}

WAVELETS = tuple(_DB_LO)


def _filters(wavelet: str) -> tuple[np.ndarray, np.ndarray]:
    """Return (dec_lo, dec_hi) as float32 numpy arrays.

    The high-pass is the quadrature mirror: ``hi[i] = (-1)^(i+1) lo[L-1-i]``.
    """
    if wavelet not in _DB_LO:
        raise ValueError(f"unknown wavelet {wavelet!r}; have {WAVELETS}")
    lo = np.asarray(_DB_LO[wavelet], dtype=np.float64)
    L = lo.shape[0]
    hi = np.array([(-1.0) ** (i + 1) * lo[L - 1 - i] for i in range(L)])
    return lo.astype(np.float32), hi.astype(np.float32)


def filter_length(wavelet: str) -> int:
    return len(_DB_LO[wavelet])


def dwt_max_level(data_len: int, wavelet: str) -> int:
    """Maximum useful decomposition level (pywt ``dwt_max_level`` formula)."""
    flen = filter_length(wavelet)
    if data_len < flen - 1 or flen < 2:
        return 0
    return int(math.floor(math.log2(data_len / (flen - 1.0))))


def _dwt_along_last(x: jnp.ndarray, wavelet: str) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-level analysis along the last axis. x: (..., n)."""
    lo, hi = _filters(wavelet)
    L = lo.shape[0]
    n = x.shape[-1]
    out_len = (n + L - 1) // 2
    ext = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(L - 1, L - 1)], mode="symmetric")
    # out[k] = sum_j f[j] ext[2k + L - j] = correlation with reversed filter
    # evaluated at ext offset 2k+1.
    lead = ext.shape[:-1]
    flat = ext.reshape((-1, 1, ext.shape[-1]))
    # Slice so position 0 aligns with offset 1, and the strided window covers
    # exactly out_len outputs.
    needed = 2 * (out_len - 1) + 1 + L
    flat = flat[..., 1:needed]
    kern = jnp.stack([lo[::-1], hi[::-1]])[:, None, :]  # (2, 1, L)
    y = jax.lax.conv_general_dilated(
        flat,
        kern.astype(x.dtype),
        window_strides=(2,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    y = y.reshape(lead + (2, out_len))
    return y[..., 0, :], y[..., 1, :]


def _idwt_along_last(
    ca: jnp.ndarray, cd: jnp.ndarray, wavelet: str, out_len: int
) -> jnp.ndarray:
    """Single-level synthesis along the last axis."""
    lo, hi = _filters(wavelet)
    L = lo.shape[0]
    m = ca.shape[-1]
    lead = ca.shape[:-1]
    # Zero-upsample: u[2k] = c[k].
    u = jnp.zeros(lead + (2, 2 * m), dtype=ca.dtype)
    u = u.at[..., 0, ::2].set(ca).at[..., 1, ::2].set(cd)
    flat = u.reshape((-1, 2, 2 * m))
    # Full convolution with rec filters (= dec filters reversed): implement as
    # correlation with the *unreversed* dec filters on a zero-padded signal.
    flat = jnp.pad(flat, [(0, 0), (0, 0), (L - 1, L - 1)])
    kern = jnp.stack([lo, hi])[None, :, :].astype(ca.dtype)  # (1, 2, L)
    y = jax.lax.conv_general_dilated(
        flat,
        kern,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (B, 1, 2m + L - 1)
    y = y.reshape(lead + (y.shape[-1],))
    start = L - 2
    return jax.lax.slice_in_dim(y, start, start + out_len, axis=-1)


def dwt1(x: jnp.ndarray, wavelet: str = "db1") -> tuple[jnp.ndarray, jnp.ndarray]:
    """1-D single-level DWT along the last axis -> (cA, cD)."""
    return _dwt_along_last(x, wavelet)


def idwt1(
    ca: jnp.ndarray, cd: jnp.ndarray, wavelet: str, out_len: int
) -> jnp.ndarray:
    """Inverse of :func:`dwt1`."""
    return _idwt_along_last(ca, cd, wavelet, out_len)


def dwt2(
    x: jnp.ndarray, wavelet: str = "db1"
) -> tuple[jnp.ndarray, tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """2-D single-level DWT over the last two axes.

    Returns ``(cA, (cH, cV, cD))`` with the pywt ``dwt2`` band convention:
    cH = lowpass along rows (axis -2) of the columnwise highpass, i.e.
    horizontal-edge detail; cD is the diagonal (hi/hi) band.
    """
    lo_r, hi_r = _dwt_along_last(x, wavelet)  # along axis -1 (columns)
    swap = lambda a: jnp.swapaxes(a, -1, -2)
    ll, lh = _dwt_along_last(swap(lo_r), wavelet)  # along original axis -2
    hl, hh = _dwt_along_last(swap(hi_r), wavelet)
    # pywt band letters (axis -2, axis -1): cH='da', cV='ad', cD='dd'.
    return swap(ll), (swap(lh), swap(hl), swap(hh))


def idwt2(
    ca: jnp.ndarray,
    details: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    wavelet: str,
    out_shape: tuple[int, int],
) -> jnp.ndarray:
    """Inverse of :func:`dwt2` producing the last-two-axes shape ``out_shape``."""
    ch, cv, cd = details
    swap = lambda a: jnp.swapaxes(a, -1, -2)
    lo_r = _idwt_along_last(swap(ca), swap(ch), wavelet, out_shape[0])
    hi_r = _idwt_along_last(swap(cv), swap(cd), wavelet, out_shape[0])
    return _idwt_along_last(swap(lo_r), swap(hi_r), wavelet, out_shape[1])


def wavedec2(
    x: jnp.ndarray, wavelet: str = "db1", levels: int | None = None
) -> list:
    """Multi-level 2-D decomposition.

    Returns ``[cA_n, (cH_n, cV_n, cD_n), ..., (cH_1, cV_1, cD_1)]`` like
    pywt ``wavedec2`` (index 1 = coarsest detail level).
    """
    if levels is None:
        levels = dwt_max_level(min(x.shape[-2:]), wavelet)
    coeffs = []
    ca = x
    for _ in range(levels):
        ca, det = dwt2(ca, wavelet)
        coeffs.append(det)
    return [ca] + coeffs[::-1]


def waverec2(coeffs: Sequence, wavelet: str, out_shape: tuple[int, int]) -> jnp.ndarray:
    """Inverse of :func:`wavedec2`.

    ``out_shape`` is the last-two-axes shape of the original image; the
    intermediate shapes are re-derived from it (static Python ints).
    """
    levels = len(coeffs) - 1
    L = filter_length(wavelet)
    shapes = [tuple(out_shape)]
    for _ in range(levels - 1):
        h, w = shapes[-1]
        shapes.append(((h + L - 1) // 2, (w + L - 1) // 2))
    ca = coeffs[0]
    for i, det in enumerate(coeffs[1:]):
        ca = idwt2(ca, det, wavelet, shapes[levels - 1 - i])
    return ca


def soft_threshold(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Soft-threshold (shrinkage) operator, sign(x) * max(|x| - t, 0)."""
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - t, 0.0)


def _bayes_threshold(detail: jnp.ndarray, var: jnp.ndarray) -> jnp.ndarray:
    """BayesShrink per-band threshold: sigma^2 / sqrt(max(E[d^2]-sigma^2, eps)).

    Matches skimage ``_bayes_thresh`` (the formula the reference invokes via
    ``denoise_wavelet(method='BayesShrink')``, reference ``denoisers/TV.py:24``).
    The band mean is taken over the last two axes only, so batched inputs get
    one threshold per image per band.
    """
    dvar = jnp.mean(detail * detail, axis=(-2, -1), keepdims=True)
    eps = jnp.finfo(detail.dtype).eps
    return var / jnp.sqrt(jnp.maximum(dvar - var, eps))


@functools.partial(jax.jit, static_argnames=("wavelet", "levels"))
def denoise_wavelet_bayes(
    x: jnp.ndarray,
    sigma: jnp.ndarray,
    wavelet: str = "db1",
    levels: int | None = None,
) -> jnp.ndarray:
    """BayesShrink soft-threshold wavelet denoising of a 2-D image.

    Native replacement for ``skimage.restoration.denoise_wavelet(method=
    'BayesShrink', mode='soft')``: decompose ``max(dwt_max_level - 3, 1)``
    levels, soft-threshold every detail band with its own Bayes threshold,
    reconstruct.
    """
    if levels is None:
        levels = max(dwt_max_level(min(x.shape[-2:]), wavelet) - 3, 1)
    sigma = jnp.asarray(sigma, dtype=x.dtype)
    # Batched input: sigma may be (...,) matching x's leading axes.
    var = (sigma * sigma).reshape(sigma.shape + (1, 1)) if sigma.ndim else sigma * sigma
    coeffs = wavedec2(x, wavelet, levels)
    out = [coeffs[0]]
    for det in coeffs[1:]:
        out.append(tuple(soft_threshold(d, _bayes_threshold(d, var)) for d in det))
    return waverec2(out, wavelet, x.shape[-2:])
