"""BM3D denoiser, designed from scratch for TPU (pure jnp/XLA).

The reference calls the closed-source compiled-C ``bm3d`` PyPI package
(reference ``denoisers/BM3D.py:20-25``); it is the hottest call in every
benchmark run (SURVEY.md §3.1). This is a ground-up TPU formulation of the
canonical two-stage BM3D algorithm (Dabov et al. 2007): collaborative
filtering of groups of similar patches in a 3-D transform domain, with a
hard-thresholding stage followed by a Wiener stage that uses the stage-1
output as a pilot estimate.

TPU-native design choices (vs. the CPU algorithm's irregular loops):

* **Block matching in shift space.** Instead of per-reference-block searches,
  distances are computed per *offset*: for each of the (2r+1)^2 search
  offsets d, the squared-difference image ``(I - shift_d(I))^2`` is
  box-filtered with the patch window via two cumulative sums — O(N) perfectly
  vectorized VPU work per offset, evaluated on the reference stride grid by a
  static strided gather. ``lax.scan`` over offsets keeps the compiled program
  small; no data-dependent control flow anywhere.
* **Fixed group size K via top_k** over the offset axis (the GPU-style
  variant of the paper's tau-thresholded variable-size groups; keeps every
  shape static for XLA).
* **3-D transform as matmuls**: orthonormal 2-D DCT on each patch and an
  orthonormal Walsh-Hadamard transform along the group axis — all MXU work.
* **Aggregation by scatter-add** with per-group weights ``1/(sigma^2 N_kept)``
  (hard) / ``1/(sigma^2 ||W||^2)`` (Wiener) times a 2-D Kaiser window,
  identical weighting to the reference algorithm.

Everything is shape-static given (H, W, params): jit once, vmap over image
batches, shard over the mesh batch axis.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from pnp_svrg_tpu.ops.transforms import dct_matrix, hadamard_matrix, kaiser2d


@dataclasses.dataclass(frozen=True)
class BM3DParams:
    """Static BM3D configuration (part of the jit cache key)."""

    block: int = 8  # patch edge
    step: int = 4  # reference-block stride
    search: int = 12  # search radius (window (2r+1)^2 offsets)
    group_ht: int = 16  # group size, hard-threshold stage
    group_wie: int = 16  # group size, Wiener stage
    lam: float = 2.7  # hard threshold = lam * sigma
    kaiser_beta: float = 2.0


def _ref_grid(size: int, block: int, step: int) -> np.ndarray:
    """Reference-block coordinates: stride grid, last block always included."""
    last = size - block
    pts = list(range(0, last + 1, step))
    if pts[-1] != last:
        pts.append(last)
    return np.asarray(pts, np.int32)


def _box_sum(v: jnp.ndarray, block: int) -> jnp.ndarray:
    """(H, W) -> (H-b+1, W-b+1) sums over every b x b window (integral image)."""
    c = jnp.cumsum(jnp.cumsum(v, axis=0), axis=1)
    c = jnp.pad(c, ((1, 0), (1, 0)))
    b = block
    hh = v.shape[0] - b + 1
    ww = v.shape[1] - b + 1
    return (
        c[b : b + hh, b : b + ww]
        - c[:hh, b : b + ww]
        - c[b : b + hh, :ww]
        + c[:hh, :ww]
    )


def _match_distances(img, rows, cols, offsets, block):
    """Patch SSD between each reference block and each offset candidate.

    Returns (S, nR, nC) distances with +inf where the candidate block falls
    outside the image.
    """
    h, w = img.shape
    last_r, last_c = h - block, w - block
    rr = rows[:, None]  # (nR, 1)
    cc = cols[None, :]  # (1, nC)

    def one_offset(_, off):
        dy, dx = off[0], off[1]
        shifted = jnp.roll(img, (-dy, -dx), axis=(0, 1))
        sq = (img - shifted) ** 2
        box = _box_sum(sq, block)  # (last_r+1, last_c+1)
        d = box[rows][:, cols]  # (nR, nC) strided gather
        valid = (
            (rr + dy >= 0) & (rr + dy <= last_r) & (cc + dx >= 0) & (cc + dx <= last_c)
        )
        return None, jnp.where(valid, d, jnp.inf)

    _, dists = jax.lax.scan(one_offset, None, offsets)
    return dists  # (S, nR, nC)


def _gather_groups(img, rows, cols, offsets, top_idx, block):
    """Gather (nR, nC, K, b, b) patch groups given top-K offset indices."""
    off = offsets[top_idx]  # (nR, nC, K, 2)
    py = rows[:, None, None] + off[..., 0]  # (nR, nC, K)
    px = cols[None, :, None] + off[..., 1]
    py = jnp.clip(py, 0, img.shape[0] - block)
    px = jnp.clip(px, 0, img.shape[1] - block)
    ky = jnp.arange(block)
    kx = jnp.arange(block)
    yy = py[..., None, None] + ky[None, None, None, :, None]
    xx = px[..., None, None] + kx[None, None, None, None, :]
    return img[yy, xx], py, px


def _transform_3d(groups, d2, hk):
    """Forward 3-D transform: 2-D DCT per patch + 1-D WHT along group axis."""
    g = jnp.einsum("ab,...kbc,dc->...kad", d2, groups, d2)
    return jnp.einsum("kl,...lab->...kab", hk, g)


def _itransform_3d(coeffs, d2, hk):
    g = jnp.einsum("lk,...lab->...kab", hk, coeffs)  # WHT is symmetric-orthonormal
    return jnp.einsum("ba,...kbc,cd->...kad", d2, g, d2)


def _aggregate(est_groups, weights, py, px, block, h, w, kaiser):
    """Scatter-add weighted patch estimates into the output accumulators."""
    # est_groups: (nR, nC, K, b, b); weights: (nR, nC); py/px: (nR, nC, K)
    wk = weights[..., None, None, None] * kaiser[None, None, None]
    num_vals = est_groups * wk
    den_vals = jnp.broadcast_to(wk, est_groups.shape)
    ky = jnp.arange(block)
    kx = jnp.arange(block)
    yy = py[..., None, None] + ky[None, None, None, :, None]
    xx = px[..., None, None] + kx[None, None, None, None, :]
    flat_idx = (yy * w + xx).ravel()
    num = jnp.zeros((h * w,), est_groups.dtype).at[flat_idx].add(num_vals.ravel())
    den = jnp.zeros((h * w,), est_groups.dtype).at[flat_idx].add(den_vals.ravel())
    return num.reshape(h, w), den.reshape(h, w)


@functools.partial(jax.jit, static_argnames=("params", "stages"))
def bm3d_denoise(
    image: jnp.ndarray,
    sigma: jnp.ndarray,
    params: BM3DParams = BM3DParams(),
    stages: int = 2,
) -> jnp.ndarray:
    """Two-stage BM3D denoising of a 2-D image with noise sd ``sigma``.

    ``stages=1`` runs hard-thresholding only; ``stages=2`` adds the Wiener
    refinement (default, like the reference's bm3d package).
    """
    p = params
    x = image.astype(jnp.float32)
    h, w = x.shape
    sigma = jnp.asarray(sigma, jnp.float32)

    rows = jnp.asarray(_ref_grid(h, p.block, p.step))
    cols = jnp.asarray(_ref_grid(w, p.block, p.step))
    r = p.search
    offsets = np.asarray(
        [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)], np.int32
    )
    offsets = jnp.asarray(offsets)
    d2 = jnp.asarray(dct_matrix(p.block))
    kaiser = jnp.asarray(kaiser2d(p.block, p.kaiser_beta))

    # ---- Stage 1: hard thresholding --------------------------------------
    hk1 = jnp.asarray(hadamard_matrix(p.group_ht))
    dists = _match_distances(x, rows, cols, offsets, p.block)
    _, top_idx = jax.lax.top_k(-jnp.moveaxis(dists, 0, -1), p.group_ht)
    groups, py, px = _gather_groups(x, rows, cols, offsets, top_idx, p.block)
    coeffs = _transform_3d(groups, d2, hk1)
    thr = p.lam * sigma
    keep = jnp.abs(coeffs) > thr
    coeffs_ht = jnp.where(keep, coeffs, 0.0)
    n_kept = jnp.maximum(jnp.sum(keep, axis=(-3, -2, -1)), 1).astype(jnp.float32)
    est = _itransform_3d(coeffs_ht, d2, hk1)
    wgt = 1.0 / (sigma * sigma * n_kept + 1e-12)
    num, den = _aggregate(est, wgt, py, px, p.block, h, w, kaiser)
    basic = num / jnp.maximum(den, 1e-12)

    if stages == 1:
        return basic

    # ---- Stage 2: Wiener filtering with the basic estimate as pilot ------
    hk2 = jnp.asarray(hadamard_matrix(p.group_wie))
    dists2 = _match_distances(basic, rows, cols, offsets, p.block)
    _, top_idx2 = jax.lax.top_k(-jnp.moveaxis(dists2, 0, -1), p.group_wie)
    g_basic, py2, px2 = _gather_groups(basic, rows, cols, offsets, top_idx2, p.block)
    g_noisy, _, _ = _gather_groups(x, rows, cols, offsets, top_idx2, p.block)
    c_basic = _transform_3d(g_basic, d2, hk2)
    c_noisy = _transform_3d(g_noisy, d2, hk2)
    wien = c_basic**2 / (c_basic**2 + sigma * sigma + 1e-12)
    est2 = _itransform_3d(wien * c_noisy, d2, hk2)
    wgt2 = 1.0 / (sigma * sigma * jnp.sum(wien**2, axis=(-3, -2, -1)) + 1e-12)
    num2, den2 = _aggregate(est2, wgt2, py2, px2, p.block, h, w, kaiser)
    return num2 / jnp.maximum(den2, 1e-12)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["denoise_strength", "sigma_modifier", "decay"],
    meta_fields=["params", "stages"],
)
@dataclasses.dataclass(frozen=True)
class BM3DDenoiser:
    """PnP denoiser wrapper with the reference sigma-selection contract
    (reference ``denoisers/BM3D.py:20-25``): ``sigma_modifier * sigma_est``
    when an estimate is supplied, else ``denoise_strength * decay**t``."""

    denoise_strength: jnp.ndarray = 0.0
    sigma_modifier: jnp.ndarray = 1.0
    decay: jnp.ndarray = 1.0
    params: BM3DParams = BM3DParams()
    stages: int = 2

    def denoise(
        self, x: jnp.ndarray, sigma_est: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        sigma_est = jnp.asarray(sigma_est, x.dtype)
        sigma = jnp.where(
            sigma_est > 0,
            sigma_est * self.sigma_modifier,
            self.denoise_strength * self.decay**t,
        )
        return bm3d_denoise(x, sigma, params=self.params, stages=self.stages)
