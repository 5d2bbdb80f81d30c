"""Training-side utilities — parity with the reference's training helpers
(reference ``denoisers/DeepDenoisers/training/utilities/utils.py:17-266``):
batched PSNR/SSIM, the orthogonality regularizer used for Lipschitz-
constrained denoiser training, its epoch decay schedule, and the conv-kernel
unrolling helpers used to verify spectral norms against an explicit matrix.

JAX notes: the regularizer is a pure function of the parameter pytree
(differentiable, jit-safe — the power iteration runs with a fixed key and a
``stop_gradient``-free single step exactly like the reference's fresh-``u``
iteration); the unrollers are host-side numpy/scipy, used in tests and
offline verification only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pnp_svrg_tpu.ops.metrics import psnr as _psnr, ssim as _ssim


def batch_psnr(pred: jnp.ndarray, clean: jnp.ndarray, data_range: float = 1.0):
    """Mean PSNR over a (B, H, W) or (B, 1, H, W) batch (reference
    ``utils.py:28-35``)."""
    pred = pred.reshape((pred.shape[0], -1, pred.shape[-2], pred.shape[-1]))
    clean = clean.reshape(pred.shape)
    vals = jax.vmap(lambda p, c: _psnr(c, p, data_range=data_range))(pred, clean)
    return jnp.mean(vals)


def batch_ssim(pred: jnp.ndarray, clean: jnp.ndarray, data_range: float = 1.0):
    """Mean SSIM over a batch (reference ``utils.py:37-44``)."""
    pred = pred.reshape((pred.shape[0], pred.shape[-2], pred.shape[-1]))
    clean = clean.reshape(pred.shape)
    vals = jax.vmap(lambda p, c: _ssim(c, p, data_range=data_range))(pred, clean)
    return jnp.mean(vals)


def l2_reg_normal_ortho(params, key: jax.Array) -> jnp.ndarray:
    """Orthogonality regularizer sum_W sigma_max(W^T W - I)^2 over all conv
    kernels in the pytree (reference ``utils.py:110-136``).

    Each >=2-D leaf W is flattened to (rows=c_out, cols=rest); the largest
    singular value of ``W^T W - I`` is estimated with one power iteration
    from a fresh Gaussian start, matching the reference's single
    u -> v -> u -> sigma round trip.

    ``key`` is required and must differ per evaluation (fold in the training
    step), like the reference's per-call ``normal_(0, 1)`` probe — a fixed
    probe direction would let training hide spectral mass orthogonal to it.
    """
    total = jnp.zeros((), jnp.float32)
    leaves = [l for l in jax.tree_util.tree_leaves(params) if l.ndim >= 2]
    keys = jax.random.split(key, max(len(leaves), 1))
    for w, k in zip(leaves, keys):
        if w.ndim == 4:  # flax conv kernel (kh, kw, c_in, c_out) -> (c_out, rest)
            w1 = w.reshape(-1, w.shape[-1]).T
        else:
            w1 = w.reshape(w.shape[0], -1)
        cols = w1.shape[1]
        m = w1.T @ w1 - jnp.eye(cols, dtype=w1.dtype)
        u = jax.random.normal(k, (cols,), w1.dtype)
        u = u / (jnp.linalg.norm(u) + 1e-12)
        v = m.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = m @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
        sigma = u @ (m @ v)
        total = total + sigma**2
    return total


def adjust_ortho_decay_rate(epoch: int, lamb_decay: float) -> float:
    """Reference's staircase decay for the orthogonality weight
    (``utils.py:138-149``)."""
    if epoch > 40:
        return 0.0
    if epoch > 30:
        return 1e-6 * lamb_decay
    if epoch > 20:
        return 1e-4 * lamb_decay
    if epoch > 10:
        return 1e-3 * lamb_decay
    return lamb_decay


def unroll_kernel(kernel: np.ndarray, n: int) -> np.ndarray:
    """Dense matrix of the VALID 2-D correlation with ``kernel`` on an n x n
    input (reference ``utils.py:204-223``): rows are output pixels (c_out
    blocks of (n-m+1)^2), columns are flattened input pixels.

    ``kernel``: (c_out, 1, m, m) single-input-channel stack (the reference's
    shape) or (m, m). Host-side numpy; used to cross-check conv spectral
    norms against ``np.linalg.svd`` of the explicit operator.
    """
    kernel = np.asarray(kernel)
    if kernel.ndim == 2:
        kernel = kernel[None, None]
    c_out, _, m, _ = kernel.shape
    out_n = n - m + 1
    rows = c_out * out_n * out_n
    mat = np.zeros((rows, n * n), kernel.dtype)
    for c in range(c_out):
        k = kernel[c, 0]
        for oy in range(out_n):
            for ox in range(out_n):
                r = c * out_n * out_n + oy * out_n + ox
                for j in range(m):
                    mat[r, (oy + j) * n + ox : (oy + j) * n + ox + m] = k[j]
    return mat


def unroll_kernel_sparse(kernel: np.ndarray, n: int, sparse: bool = True):
    """Sparse (scipy ``lil_matrix``) variant of :func:`unroll_kernel`
    (reference ``utils.py:226-243``)."""
    if not sparse:
        return unroll_kernel(kernel, n)
    from scipy.sparse import lil_matrix

    kernel = np.asarray(kernel)
    if kernel.ndim == 2:
        kernel = kernel[None, None]
    c_out, _, m, _ = kernel.shape
    out_n = n - m + 1
    mat = lil_matrix((c_out * out_n * out_n, n * n))
    for c in range(c_out):
        k = kernel[c, 0]
        for oy in range(out_n):
            for ox in range(out_n):
                r = c * out_n * out_n + oy * out_n + ox
                for j in range(m):
                    base = (oy + j) * n + ox
                    mat[r, base : base + m] = k[j]
    return mat
