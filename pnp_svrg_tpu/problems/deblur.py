"""Deblurring + super-resolution: circular blur then bilinear downsampling.

TPU-native re-design of the reference Deblur problem (``problems/DeblurSR.py``):

* Blur is the reference's 1-D circular FFT convolution of the *raveled* image
  with a kernel scaled by 1/N, times sqrt(N) (reference ``DeblurSR.py:93,
  119-120``). We reproduce that exact operator (it defines the problem), via
  ``jnp.fft`` — a single fused XLA kernel instead of three pocketfft calls.
* Downsampling is a bilinear-interpolation linear operator; the reference
  delegates to ``pylops.signalprocessing.Bilinear`` over a meshgrid
  (``DeblurSR.py:95-108``). Here it is a explicit 4-point gather with
  precomputed indices/weights, whose adjoint is the matching scatter-add —
  both fixed-shape, jit/vmap-friendly (see ``ops/resize.py``).
* ``grad_full = Blur^T S^T (S Blur z - Y) / M`` with the adjoint blur kernel
  ``roll(flip(B), 1)`` (reference ``DeblurSR.py:126-132``); ``grad_stoch``
  restricts the residual to minibatch measurement indices, unnormalized
  (reference ``DeblurSR.py:134-147``).
* ``Xinit`` is uniform random (reference ``DeblurSR.py:57``).
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp
import numpy as np

from pnp_svrg_tpu.core.problem import resolve_noise
from pnp_svrg_tpu.ops.fourier import fft_blur_1d, fft_blur_1d_adjoint_kernel
from pnp_svrg_tpu.ops.metrics import psnr
from pnp_svrg_tpu.ops.resize import (
    bilinear_gather_params,
    bilinear_apply,
    bilinear_adjoint,
)
from pnp_svrg_tpu.ops.sampling import sample_k_mask


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "y", "b", "b_adj", "x", "x_init", "ds_idx", "ds_w", "allowed",
        "snr", "sigma",
    ],
    meta_fields=["h", "w", "lr_h", "lr_w"],
)
@dataclasses.dataclass(frozen=True)
class Deblur:
    """Deblur/SR problem instance (pytree)."""

    y: jnp.ndarray  # float32 (M,), noisy blurred+downsampled measurements
    b: jnp.ndarray  # float32 (N,), raveled blur kernel (already / N)
    b_adj: jnp.ndarray  # float32 (N,), adjoint kernel roll(flip(b), 1)
    x: jnp.ndarray  # float32 (H, W), ground truth
    x_init: jnp.ndarray  # float32 (H, W), uniform-random init
    ds_idx: jnp.ndarray  # int32 (M, 4), bilinear gather indices into N
    ds_w: jnp.ndarray  # float32 (M, 4), bilinear gather weights
    allowed: jnp.ndarray = None  # float32 (M,) 0/1: measurements owned by this
    # instance. All-ones for a full problem; a measurement-parallel shard
    # (parallel/meas.py) owns a disjoint block of low-res pixels.
    snr: jnp.ndarray = 0.0
    sigma: jnp.ndarray = 0.0
    h: int = 0
    w: int = 0
    lr_h: int = 0
    lr_w: int = 0

    @property
    def n(self) -> int:
        return self.h * self.w

    @property
    def m(self) -> int:
        return self.lr_h * self.lr_w

    def _downsample(self, v: jnp.ndarray) -> jnp.ndarray:
        return bilinear_apply(v.ravel(), self.ds_idx, self.ds_w)

    def _upsample_adj(self, r: jnp.ndarray) -> jnp.ndarray:
        return bilinear_adjoint(r, self.ds_idx, self.ds_w, self.n)

    def forward(self, z: jnp.ndarray) -> jnp.ndarray:
        """Y = S * Blur(z), returned as an (M,) vector."""
        return self._downsample(fft_blur_1d(z, self.b))

    def f(self, z: jnp.ndarray) -> jnp.ndarray:
        r = self.allowed * (self.y - self.forward(z))
        return jnp.sum(r * r) / (2.0 * self.m)

    def grad_full(self, z: jnp.ndarray) -> jnp.ndarray:
        res = self.allowed * (self.forward(z) - self.y)
        up = self._upsample_adj(res)
        return fft_blur_1d(up, self.b_adj) / self.m

    def grad_stoch(self, z: jnp.ndarray, mb: jnp.ndarray) -> jnp.ndarray:
        """Unnormalized minibatch gradient; ``mb`` is an (M,) 0/1 mask."""
        res = mb.ravel() * (self.forward(z) - self.y)
        up = self._upsample_adj(res)
        return fft_blur_1d(up, self.b_adj)

    def select_mb(self, key: jax.Array, k: int) -> jnp.ndarray:
        return sample_k_mask(key, (self.m,), k, allowed=self.allowed)

    def full_mb(self) -> jnp.ndarray:
        """The all-owned-measurements minibatch (every owned low-res pixel)."""
        return self.allowed

    def m_total(self) -> jnp.ndarray:
        """Normalizer turning ``grad_stoch(z, full_mb())`` into ``grad_full``."""
        return jnp.sum(self.allowed)

    def psnr(self, z: jnp.ndarray) -> jnp.ndarray:
        return psnr(self.x, z.reshape(self.h, self.w))


def make_minimal_kernel(h: int, w: int) -> np.ndarray:
    """The reference's built-in "Minimal" 3-point blur (``DeblurSR.py:80-87``)."""
    b = np.zeros((h, w), np.float32)
    b[0, 0] = 1.0
    b[h // 2, h // 2] = 1.0
    b[h // 2, h // 3] = 1.0
    b[h // 2, h // 4] = 1.0
    return b / 4.0


def make_identity_kernel(h: int, w: int) -> np.ndarray:
    """No blurring (reference ``DeblurSR.py:77-79``)."""
    b = np.zeros(h * w, np.float32)
    b[0] = 1.0
    return b


def load_kernel_image(path, h: int, w: int) -> np.ndarray:
    """Blur kernel from an image file, resized to (H, W) — the reference's
    kernel_path branch (``DeblurSR.py:72-75``): raw PIL pixel values (uint8
    scale, NOT normalized to [0,1]); the 1/N scaling happens in
    :func:`make_deblur` like the reference's ``B.ravel() / N``. Use with the
    shipped ``data/kernel.png`` / ``data/kernel25.png`` assets."""
    from PIL import Image

    img = Image.open(path)
    if img.mode != "L":
        img = img.convert("L")
    return np.asarray(img.resize((w, h)), np.float32)


def make_deblur(
    key: jax.Array,
    image: jnp.ndarray,
    kernel: jnp.ndarray | str = "Minimal",
    scale_percent: int = 100,
    snr: float | None = None,
    sigma: float | None = None,
) -> Deblur:
    """Construct a Deblur/SR instance.

    ``kernel`` may be an (H, W) array, "Minimal"/"Identity" for the
    reference's built-ins, or a path to a kernel image (e.g.
    ``data/kernel25.png`` — reference ``DeblurSR.py:72-75``). The kernel is
    raveled and scaled by 1/N (reference ``DeblurSR.py:93``).
    """
    x = jnp.asarray(image, jnp.float32)
    h, w = x.shape
    n = h * w
    if isinstance(kernel, str):
        if kernel == "Minimal":
            kern = make_minimal_kernel(h, w)
        elif kernel == "Identity":
            kern = make_identity_kernel(h, w)
        elif kernel.endswith((".png", ".jpg", ".jpeg")):
            kern = load_kernel_image(kernel, h, w)
        else:
            raise ValueError(f"unknown built-in kernel {kernel!r}")
    else:
        kern = np.asarray(kernel, np.float32)
    b = jnp.asarray(kern, jnp.float32).ravel() / n

    lr_h = int(h * scale_percent / 100)
    lr_w = int(w * scale_percent / 100)
    ds_idx, ds_w = bilinear_gather_params(h, w, lr_h, lr_w)

    b_adj = fft_blur_1d_adjoint_kernel(b)
    blurred = fft_blur_1d(x, b)
    y0 = bilinear_apply(blurred, ds_idx, ds_w)
    snr_out, sig = resolve_noise(y0, h, w, snr, sigma)
    k_noise, k_init = jax.random.split(key)
    y = y0 + sig * jax.random.normal(k_noise, y0.shape)
    x_init = jax.random.uniform(k_init, (h, w))
    return Deblur(
        y=y.astype(jnp.float32),
        b=b,
        b_adj=b_adj,
        x=x,
        x_init=x_init.astype(jnp.float32),
        ds_idx=ds_idx,
        ds_w=ds_w,
        allowed=jnp.ones((lr_h * lr_w,), jnp.float32),
        snr=jnp.asarray(float(snr_out), jnp.float32),
        sigma=jnp.asarray(float(sig), jnp.float32),
        h=h,
        w=w,
        lr_h=lr_h,
        lr_w=lr_w,
    )
