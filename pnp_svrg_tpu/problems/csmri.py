"""Compressed-sensing MRI: subsampled-Fourier measurements.

TPU-native re-design of the reference CSMRI problem (``problems/CSMRI.py``):

* The reference builds an O(N^2) dense DFT matrix ``F`` at init and uses it in
  ``forward_model`` while the gradients use ``np.fft.fft2`` (reference
  ``CSMRI.py:47-59,76-89``). The two agree (unnormalized DFT); here everything
  is ``jnp.fft.fft2`` — XLA-native on TPU, no dense matrix.
* Measurement model: ``Y = mask * fft2(X) + mask * N(0, sigma)`` with *real*
  Gaussian noise added to the complex spectrum (reference ``CSMRI.py:32-33``).
* ``Xinit = minmax(|ifft2(Y)|)`` (reference ``CSMRI.py:35-36``).
* ``grad_full(z) = real(ifft2(mask * fft2(z) - Y)) / M0`` where ``M0`` is the
  number of sampled coefficients (reference ``CSMRI.py:76-81``).
* ``grad_stoch(z, mb)`` restricts the residual to ``mask * mb`` and returns
  the *unnormalized* sum (reference ``CSMRI.py:83-89``); algorithms divide by
  the minibatch size.
* Minibatches are drawn uniformly without replacement from the *sampled* mask
  locations (reference ``CSMRI.py:66-74``), implemented with the Gumbel
  top-k trick for fixed shapes under jit.

The problem is a pytree dataclass: batched instances stack along a leading
axis and all methods vmap.
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp

from pnp_svrg_tpu.core.problem import minmax_normalize, resolve_noise
from pnp_svrg_tpu.ops.metrics import psnr
from pnp_svrg_tpu.ops.sampling import sample_k_mask


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["y", "mask", "x", "x_init", "m0", "snr", "sigma"],
    meta_fields=["h", "w"],
)
@dataclasses.dataclass(frozen=True)
class CSMRI:
    """Subsampled-Fourier MRI problem instance (pytree)."""

    y: jnp.ndarray  # complex64 (H, W), masked noisy spectrum
    mask: jnp.ndarray  # float32 (H, W), 0/1 Bernoulli sampling mask
    x: jnp.ndarray  # float32 (H, W), ground-truth image in [0, 1]
    x_init: jnp.ndarray  # float32 (H, W), zero-filled |ifft2| init
    m0: jnp.ndarray  # float32 scalar, number of sampled coefficients
    snr: jnp.ndarray = 0.0
    sigma: jnp.ndarray = 0.0
    h: int = 0
    w: int = 0

    # -- protocol -----------------------------------------------------------
    @property
    def n(self) -> int:
        return self.h * self.w

    @property
    def m(self) -> int:
        # Measurement array dimensionality (mask-shaped), reference CSMRI.py:40
        return self.h * self.w

    def forward(self, z: jnp.ndarray) -> jnp.ndarray:
        """Y = mask * fft2(z); z is an (H, W) image (or raveled)."""
        z = z.reshape(self.h, self.w)
        return self.mask * jnp.fft.fft2(z)

    def f(self, z: jnp.ndarray) -> jnp.ndarray:
        """Data fidelity ||Y - mask*fft2(z)||_F^2 / (2 M) (reference CSMRI.py:61-64)."""
        r = self.y - self.forward(z)
        return jnp.sum(jnp.abs(r) ** 2) / (2.0 * self.m)

    def grad_full(self, z: jnp.ndarray) -> jnp.ndarray:
        z = z.reshape(self.h, self.w)
        res = self.mask * jnp.fft.fft2(z) - self.y
        return jnp.real(jnp.fft.ifft2(res)) / self.m0

    def grad_stoch(self, z: jnp.ndarray, mb: jnp.ndarray) -> jnp.ndarray:
        """Unnormalized minibatch gradient; ``mb`` is an (H, W) 0/1 mask."""
        z = z.reshape(self.h, self.w)
        mbb = self.mask * mb.reshape(self.h, self.w)
        res = mbb * (jnp.fft.fft2(z) - self.y)
        return jnp.real(jnp.fft.ifft2(res))

    def select_mb(self, key: jax.Array, k: int) -> jnp.ndarray:
        """(H, W) 0/1 mask with k ones drawn from sampled mask locations."""
        return sample_k_mask(key, (self.h, self.w), k, allowed=self.mask)

    def full_mb(self) -> jnp.ndarray:
        """The all-measurements minibatch (every sampled mask location)."""
        return self.mask

    def m_total(self) -> jnp.ndarray:
        """Normalizer turning ``grad_stoch(z, full_mb())`` into ``grad_full``."""
        return self.m0

    def grad_scale(self) -> jnp.ndarray:
        """Factor s with ``autodiff(f) == s * grad_full``: the DFT adjoint
        contributes N which cancels f's 1/M (M = N), leaving grad_full's
        1/M0 as the only mismatch (reference quirk, CSMRI.py:61-81)."""
        return self.m0

    def psnr(self, z: jnp.ndarray) -> jnp.ndarray:
        return psnr(self.x, z.reshape(self.h, self.w))


def make_csmri(
    key: jax.Array,
    image: jnp.ndarray,
    sample_prob: float = 0.5,
    snr: float | None = None,
    sigma: float | None = None,
    keep_low_freq: int = 0,
) -> CSMRI:
    """Construct a CSMRI instance from a [0,1] grayscale image array.

    Mirrors the reference constructor semantics (``CSMRI.py:12-41``): Bernoulli
    mask, noisy masked spectrum, zero-filled init, reference SNR formula.

    ``keep_low_freq``: optional variable-density extension — guarantee the
    lowest ``k`` x ``k`` frequency block (indices in (-k, k) per axis) is
    sampled. The reference's uniform Bernoulli mask (``CSMRI.py:43-45``)
    leaves the DC/low-frequency coefficients present only by coin flip, and a
    missing DC makes the image mean *unidentifiable* (the measurements carry
    no information about it), capping bright images at single-digit PSNR
    regardless of algorithm. Standard CS-MRI protocols always sample the
    low-frequency band; 0 (default) reproduces the reference exactly.
    """
    x = jnp.asarray(image, jnp.float32)
    h, w = x.shape
    k_mask, k_noise = jax.random.split(key)
    mask = jax.random.bernoulli(k_mask, sample_prob, (h, w)).astype(jnp.float32)
    if keep_low_freq:
        k = int(keep_low_freq)

        def low_idx(n):
            if k <= 1:
                return jnp.arange(1)
            return jnp.concatenate([jnp.arange(k), jnp.arange(n - k + 1, n)])

        mask = mask.at[jnp.ix_(low_idx(h), low_idx(w))].set(1.0)
    y0 = mask * jnp.fft.fft2(x)
    snr_out, sig = resolve_noise(y0, h, w, snr, sigma)
    noise = sig * jax.random.normal(k_noise, (h, w))
    y = y0 + mask * noise
    x_init = minmax_normalize(jnp.abs(jnp.fft.ifft2(y)))
    return CSMRI(
        y=y.astype(jnp.complex64),
        mask=mask,
        x=x,
        x_init=x_init.astype(jnp.float32),
        m0=jnp.sum(mask),
        snr=jnp.asarray(float(snr_out), jnp.float32),
        sigma=jnp.asarray(float(sig), jnp.float32),
        h=h,
        w=w,
    )
